"""Throughput measurement: frames/sec/chip, streaming and batched modes.

The headline benchmark (/root/repo/BASELINE.json): ≥2000 frames/sec/chip
streaming LV segmentation on EchoNet-Dynamic-shaped input (112×112) on one
TPU v5e chip.  Methodology: jit-compiled chunked streaming step, warmup
(compile excluded), timed over enough frames to amortize dispatch, device
sync via block_until_ready.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gdkvm_tpu.models.gdkvm import GDKVM


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

    @jax.jit
    def step(params, frames_u8, state):
        x = frames_u8.astype(jnp.float32) / 255.0
        logits, new_state = model.apply(params, x, state)
        # Argmax on device: masks are the product; avoids shipping logits.
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8), new_state

    state = None
    # Initial state must come from a traced init to keep shapes static.
    logits0, state = jax.jit(model.apply)(
        params, frames.astype(jnp.float32) / 255.0)
    del logits0

    for _ in range(warmup_chunks):
        masks, state = step(params, frames, state)
    jax.block_until_ready((masks, state.mem))

    t0 = time.perf_counter()
    for _ in range(timed_chunks):
        masks, state = step(params, frames, state)
    jax.block_until_ready((masks, state.mem))
    dt = time.perf_counter() - t0

    total_frames = timed_chunks * chunk * batch
    fps = total_frames / dt
    return {
        "frames_per_sec": fps,
        "ms_per_frame": 1e3 * dt / total_frames,
        "chunk": chunk,
        "batch": batch,
        "image_size": image_size,
        "timed_frames": total_frames,
        "elapsed_sec": dt,
    }


def measure_train_step_time(train_step, state, batch,
                            warmup: int = 2, timed: int = 10
                            ) -> Dict[str, float]:
    """Seconds/step for a jitted train step (donated state threaded)."""
    for _ in range(warmup):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(timed):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / timed
    return {"sec_per_step": dt, "steps_per_sec": 1.0 / dt}
