"""Throughput measurement: frames/sec/chip, streaming and batched modes.

The headline benchmark (/root/repo/BASELINE.json): ≥2000 frames/sec/chip
streaming LV segmentation on EchoNet-Dynamic-shaped input (112×112) on one
TPU v5e chip.

Methodology notes (hard-won on the dev tunnel):
- jit-compiled chunked streaming step; warmup excluded.
- **Execution must be forced by fetching data.**  On remote-dispatch PJRT
  platforms ``block_until_ready`` can return at dispatch-ack, long before
  the device finished — timings based on it overstated throughput by >20×
  here.  The step therefore returns a scalar checksum of the masks, and
  the timer ends on a host fetch of the LAST chunk's checksum: the carried
  state chains every chunk sequentially, so that 4-byte fetch transitively
  forces the whole run.
- A physical-plausibility cross-check (apparent FLOP/s vs chip peak) is
  reported so harness artifacts are visible in the output.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gdkvm_tpu.eval.metrics import mask_from_logits
from gdkvm_tpu.models.gdkvm import GDKVM

# bf16 peak of one TPU v5e chip — plausibility ceiling for apparent FLOP/s.
_V5E_PEAK_TFLOPS = 197.0


def measure_streaming_fps(model: GDKVM, params, *, image_size: int = 112,
                          chunk: int = 16, batch: int = 1,
                          warmup_chunks: int = 3, timed_chunks: int = 20,
                          seed: int = 0) -> Dict[str, float]:
    """Frames/sec of chunked streaming inference with carried state.

    batch > 1 measures multi-stream throughput (multiple videos in flight on
    one chip); frames/sec counts all streams.
    """
    rng = np.random.default_rng(seed)
    frames = jnp.asarray(rng.integers(
        0, 255, (batch, chunk, image_size, image_size, 1), np.uint8))

    def step_fn(params, frames_u8, state):
        x = frames_u8.astype(jnp.float32) / 255.0
        logits, new_state = model.apply(params, x, state)
        masks = mask_from_logits(logits)
        # 4-byte execution witness: fetching it forces this chunk (and via
        # the state chain, every previous chunk) to really run.
        checksum = jnp.sum(masks.astype(jnp.int32))
        return masks, checksum, new_state

    step = jax.jit(step_fn)

    # Model FLOPs per chunk from XLA's own cost analysis (for the
    # plausibility cross-check).
    flops_per_chunk = float("nan")
    try:
        comp = step.lower(params, frames, None).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        if ca:
            flops_per_chunk = float(ca.get("flops", float("nan")))
    except Exception:
        pass

    masks, checksum, state = step(params, frames, None)
    np.asarray(checksum)                      # force init-signature compile+run

    for _ in range(warmup_chunks):
        masks, checksum, state = step(params, frames, state)
    np.asarray(checksum)                      # warm, fully executed

    t0 = time.perf_counter()
    for _ in range(timed_chunks):
        masks, checksum, state = step(params, frames, state)
    np.asarray(checksum)                      # forces the whole chain
    dt = time.perf_counter() - t0

    total_frames = timed_chunks * chunk * batch
    fps = total_frames / dt
    tflops = (flops_per_chunk * timed_chunks / dt) / 1e12 \
        if np.isfinite(flops_per_chunk) else float("nan")
    return {
        "frames_per_sec": fps,
        "ms_per_frame": 1e3 * dt / total_frames,
        "chunk": chunk,
        "batch": batch,
        "image_size": image_size,
        "timed_frames": total_frames,
        "elapsed_sec": dt,
        "apparent_tflops": tflops,
        "plausible": bool(not np.isfinite(tflops)
                          or tflops <= _V5E_PEAK_TFLOPS),
    }


def measure_streaming_latency(model: GDKVM, params, *,
                              image_size: int = 112, chunk: int = 1,
                              batch: int = 1,
                              warmup: int = 5, timed: int = 50,
                              seed: int = 0) -> Dict[str, float]:
    """Per-call serving LATENCY (distinct from throughput): one chunk in,
    masks fetched out, synchronously — submit-to-result round trip
    including host↔device transport, which is what a live scanner feed
    experiences.  chunk=1 gives per-frame latency.  Note: on the tunneled
    dev setup the transport floor is ~0.6 ms/call; on a local TPU host it
    is tens of µs.  Reports percentiles over ``timed`` calls.
    """
    rng = np.random.default_rng(seed)
    host = rng.integers(0, 255, (batch, chunk, image_size, image_size, 1),
                        np.uint8)

    def step_fn(params, frames_u8, state):
        x = frames_u8.astype(jnp.float32) / 255.0
        logits, new_state = model.apply(params, x, state)
        masks = mask_from_logits(logits)
        return jnp.sum(masks.astype(jnp.int32)), new_state

    step = jax.jit(step_fn)
    checksum, state = step(params, jnp.asarray(host), None)
    np.asarray(checksum)                      # init-signature compile+run
    lats = []
    for i in range(warmup + timed):
        t0 = time.perf_counter()
        checksum, state = step(params, jax.device_put(host), state)
        np.asarray(checksum)                  # full round trip per call
        if i >= warmup:
            lats.append(time.perf_counter() - t0)
    lats_ms = np.asarray(lats) * 1e3
    return {
        "chunk": chunk,
        "batch": batch,
        "image_size": image_size,
        "calls": timed,
        "latency_ms_p50": float(np.percentile(lats_ms, 50)),
        "latency_ms_p95": float(np.percentile(lats_ms, 95)),
        "latency_ms_p99": float(np.percentile(lats_ms, 99)),
        "latency_ms_mean": float(lats_ms.mean()),
        "latency_ms_per_frame_p50": float(np.percentile(lats_ms, 50)
                                          / chunk),
    }


def measure_train_step_time(train_step, state, batch,
                            warmup: int = 2, timed: int = 10
                            ) -> Dict[str, float]:
    """Seconds/step for a jitted train step (donated state threaded).

    Execution is forced by fetching the scalar loss each step — see module
    docstring for why block_until_ready is not sufficient."""
    for _ in range(warmup):
        state, metrics = train_step(state, batch)
    np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(timed):
        state, metrics = train_step(state, batch)
    np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / timed
    return {"sec_per_step": dt, "steps_per_sec": 1.0 / dt}
