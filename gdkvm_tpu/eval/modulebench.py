"""Per-module FLOP/time breakdown of the GDKVM forward (MFU accounting).

Answers "where do the FLOPs and the milliseconds go" per module — encoder,
LKVA/GDR memory, decoder, loss — so MFU work attacks the right line item
(VERDICT r1: 18% MFU at saturation with no per-module table).

Methodology (tunnel-proof):
  - FLOPs from XLA's own cost analysis of each module's jitted subgraph.
  - Time from REPS iterations of the module inside ONE jitted lax.scan,
    execution-forced by fetching a checksum that chains every iteration
    (block_until_ready returns at dispatch-ack on remote platforms).
    The input of iteration i+1 depends on iteration i's output (a ~1e-12
    scalar perturbation), so XLA cannot hoist the module out of the loop.
  - Per-call dispatch cost is amortized across REPS, so module times are
    separable even through the dev tunnel (r1 found single-call component
    timings were NOT separable — dispatch floor dominated).
  - **Floor subtraction**: one timed run = one dispatch+fetch round trip
    (~30 ms through the dev tunnel) + REPS × module-time, so every row
    carries a floor of RTT/REPS.  At the r2-early default reps=20 that
    inflated each row by ~1.5 ms — comparable to the modules themselves
    (the 2026-08-17 module table in BASELINE.md has this bias).  Now the
    harness times an identity scan with the SAME reps and subtracts that
    measured floor from every row; reps defaults to 100 so the residual
    floor error is <0.1 ms.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gdkvm_tpu.models.gdkvm import GDKVM


def _flops_of(fn, *args) -> float:
    try:
        comp = jax.jit(fn).lower(*args).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca.get("flops", float("nan"))) if ca else float("nan")
    except Exception:
        return float("nan")


def _timed(fn, args, reps: int) -> float:
    """ms/call via a chained scan (see module docstring)."""

    def body(c, _):
        out = fn(*jax.tree.map(
            lambda a: (a + c.astype(a.dtype)
                       if jnp.issubdtype(a.dtype, jnp.floating) else a),
            args))
        leaves = [x.astype(jnp.float32).sum()
                  for x in jax.tree.leaves(out)]
        return (jnp.asarray(sum(leaves)) * 1e-12), sum(leaves)

    @jax.jit
    def run():
        c, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c + jnp.sum(sums)

    np.asarray(run())                     # compile + first run
    t0 = time.perf_counter()
    np.asarray(run())                     # exec-forced
    return (time.perf_counter() - t0) / reps * 1e3


def _floor_ms(reps: int) -> float:
    """Per-rep harness floor: the dispatch+fetch round trip of ONE timed
    run, amortized over reps — measured with an identity-sized body so it
    can be subtracted from every module row (min of 3 to reject noise)."""
    tiny = jnp.ones((8, 8), jnp.float32)
    return min(_timed(lambda a: a * 2.0, (tiny,), reps) for _ in range(3))


def module_breakdown(model: GDKVM, params, *, image_size: int = 112,
                     chunk: int = 16, batch: int = 1, reps: int = 100,
                     include_loss: bool = True, seed: int = 0
                     ) -> Dict[str, Dict[str, float]]:
    """FLOPs + floor-corrected exec-forced ms per module."""
    c = model.cfg
    rng = np.random.default_rng(seed)
    frames_u8 = jnp.asarray(rng.integers(
        0, 255, (batch, chunk, image_size, image_size, c.in_channels),
        np.uint8))
    frames = frames_u8.astype(jnp.float32) / 255.0

    def encode(frames):
        return model.apply(params, frames, method=GDKVM._encode)

    f4, f8, f16 = jax.jit(encode)(frames)
    h16, w16 = f16.shape[1], f16.shape[2]
    f16_seq = f16.reshape(batch, chunk, h16, w16, f16.shape[-1])
    state0 = jnp.zeros((batch, c.num_heads, c.head_dim_k, c.head_dim_v),
                       jnp.float32)

    def lkva(f16_seq, state):
        return model.apply(params, f16_seq, state,
                           method=lambda m, f, s: m.lkva(f, s))

    readout, _ = jax.jit(lkva)(f16_seq, state0)
    ro = readout.reshape(batch * chunk, h16, w16, readout.shape[-1])

    def decode(f4, f8, f16, ro):
        return model.apply(
            params, f4, f8, f16, ro, (image_size, image_size),
            method=lambda m, a, b_, c_, d, hw: m.decoder(a, b_, c_, d, hw))

    logits = jax.jit(decode)(f4, f8, f16, ro)

    def full(frames):
        lg, st = model.apply(params, frames)
        return lg, st.mem

    mods = {
        "encoder": (encode, (frames,)),
        "lkva_gdr": (lkva, (f16_seq, state0)),
        "decoder": (decode, (f4, f8, f16, ro)),
        "full_model": (full, (frames,)),
    }
    if include_loss:
        from gdkvm_tpu.train import losses
        lg5 = logits.reshape(batch, chunk, image_size, image_size, -1)
        masks = jnp.asarray(rng.integers(
            0, c.num_classes, (batch, chunk, image_size, image_size),
            np.int32))
        valid = jnp.ones((batch, chunk), jnp.float32)

        def loss_fn(lg5, masks, valid):
            return losses.segmentation_loss(lg5, masks, valid)[0]

        mods["loss"] = (loss_fn, (lg5, masks, valid))

    floor = _floor_ms(reps)
    out: Dict[str, Dict[str, float]] = {}
    for name, (fn, args) in mods.items():
        flops = _flops_of(fn, *args)
        ms = max(_timed(fn, args, reps) - floor, 0.0)
        out[name] = {
            "flops_per_call": flops,
            "ms_per_call": round(ms, 4),
            # ms clamps to 0.0 when a tiny module times at/below the
            # measured floor (RTT noise) — report NaN, not a crash.
            "tflops_per_sec": round(flops / (ms * 1e-3) / 1e12, 2)
            if np.isfinite(flops) and ms > 0 else float("nan"),
        }
    full_ms = out["full_model"]["ms_per_call"]
    for name, row in out.items():
        row["pct_of_full_time"] = round(100 * row["ms_per_call"]
                                        / max(full_ms, 1e-9), 1)
    parts = [n for n in ("encoder", "lkva_gdr", "decoder") if n in out]
    out["_meta"] = {
        "image_size": image_size, "chunk": chunk, "batch": batch,
        "reps": reps, "floor_ms_per_rep": round(floor, 4),
        "sum_parts_ms": round(sum(out[n]["ms_per_call"] for n in parts), 4),
        "fusion_gain_ms": round(
            sum(out[n]["ms_per_call"] for n in parts) - full_ms, 4),
    }
    return out


def _tree_sum(t) -> jax.Array:
    return sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(t))


def grad_breakdown(model: GDKVM, params, *, image_size: int = 256,
                   chunk: int = 10, batch: int = 8, reps: int = 100,
                   tx=None, seed: int = 0) -> Dict[str, Dict[str, float]]:
    """Per-module forward+backward (train-step) breakdown.

    The r2 module table covered the forward only; the train step
    (fwd+bwd+optimizer) had no per-module attribution (VERDICT r2 item 4).
    Each row times ``jax.value_and_grad`` of the module's subgraph under
    the same floor-corrected chained-scan harness as ``module_breakdown``:

      - encoder: grad wrt its params (first layer — no input cotangent).
      - lkva_gdr: grad wrt (params, f16 sequence) — the input cotangent is
        the flow back into the encoder, a real cost in the step.
      - decoder: grad wrt (params, f4, f8, f16, readout).
      - loss: grad wrt logits.
      - full_fwd_bwd: value_and_grad of the complete training loss wrt
        params (prompting branch included at weight 0.5, as in the recipe).
      - optimizer: tx.update + apply_updates on a full grads tree.
      - train_step_total: full_fwd_bwd + optimizer chained (no donation —
        the harness re-feeds state, so treat it as an upper bound; the
        donated in-loop number is `bench --mode train`).

    Rows overlap the full step rather than summing to it exactly (XLA
    fuses across module boundaries in the real step); use them to rank
    line items, not as an exact decomposition.  FLOPs are XLA cost
    analysis of the same grad subgraph, so TFLOP/s is fwd+bwd MFU.
    """
    from gdkvm_tpu.train import losses

    c = model.cfg
    rng = np.random.default_rng(seed)
    frames = jnp.asarray(rng.integers(
        0, 255, (batch, chunk, image_size, image_size, c.in_channels),
        np.uint8)).astype(jnp.float32) / 255.0
    masks = jnp.asarray(rng.integers(
        0, c.num_classes, (batch, chunk, image_size, image_size), np.int32))
    valid = jnp.ones((batch, chunk), jnp.float32)
    prompt_mask = masks[:, 0]
    prompt_w = jnp.full((batch,), 0.5, jnp.float32)

    def encode(p, fr):
        return model.apply(p, fr, method=GDKVM._encode)

    f4, f8, f16 = jax.jit(encode)(params, frames)
    h16, w16 = f16.shape[1], f16.shape[2]
    f16_seq = f16.reshape(batch, chunk, h16, w16, f16.shape[-1])
    state0 = jnp.zeros((batch, c.num_heads, c.head_dim_k, c.head_dim_v),
                       jnp.float32)

    def lkva(p, fs):
        return model.apply(p, fs, state0,
                           method=lambda m, f, s: m.lkva(f, s))

    readout, _ = jax.jit(lkva)(params, f16_seq)
    ro = readout.reshape(batch * chunk, h16, w16, readout.shape[-1])

    def decode(p, a, b_, c_, d):
        return model.apply(
            p, a, b_, c_, d, (image_size, image_size),
            method=lambda m, x4, x8, x16, r, hw: m.decoder(x4, x8, x16,
                                                           r, hw))

    logits = jax.jit(decode)(params, f4, f8, f16, ro).reshape(
        batch, chunk, image_size, image_size, -1)

    def loss_of(lg):
        return losses.segmentation_loss(lg, masks, valid)[0]

    def full_loss(p, fr):
        lg, _ = model.apply(p, fr, None, prompt_mask, prompt_w)
        return losses.segmentation_loss(lg, masks, valid)[0]

    full_vg = jax.value_and_grad(full_loss)

    mods = {
        "encoder": (jax.value_and_grad(
            lambda p, fr: _tree_sum(encode(p, fr))), (params, frames)),
        "lkva_gdr": (jax.value_and_grad(
            lambda p, fs: _tree_sum(lkva(p, fs)), argnums=(0, 1)),
            (params, f16_seq)),
        "decoder": (jax.value_and_grad(
            lambda p, a, b_, c_, d: _tree_sum(decode(p, a, b_, c_, d)),
            argnums=(0, 1, 2, 3, 4)), (params, f4, f8, f16, ro)),
        "loss": (jax.value_and_grad(loss_of), (logits,)),
        "full_fwd_bwd": (full_vg, (params, frames)),
    }
    if tx is not None:
        opt_state = jax.jit(tx.init)(params)
        grads = jax.jit(lambda p, fr: full_vg(p, fr)[1])(params, frames)
        import optax

        def opt_step(g, o, p):
            upd, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, upd), o2

        mods["optimizer"] = (opt_step, (grads, opt_state, params))

        def train_total(p, o, fr):
            loss, g = full_vg(p, fr)
            p2, o2 = opt_step(g, o, p)
            return loss, p2, o2

        mods["train_step_total"] = (train_total, (params, opt_state, frames))

    floor = _floor_ms(reps)
    out: Dict[str, Dict[str, float]] = {}
    for name, (fn, args) in mods.items():
        flops = _flops_of(fn, *args)
        ms = max(_timed(fn, args, reps) - floor, 0.0)
        out[name] = {
            "flops_per_call": flops,
            "ms_per_call": round(ms, 4),
            "tflops_per_sec": round(flops / (ms * 1e-3) / 1e12, 2)
            if np.isfinite(flops) and ms > 0 else float("nan"),
        }
    ref = out.get("train_step_total", out["full_fwd_bwd"])["ms_per_call"]
    for row in out.values():
        row["pct_of_step_time"] = round(
            100 * row["ms_per_call"] / max(ref, 1e-9), 1)
    out["_meta"] = {
        "image_size": image_size, "chunk": chunk, "batch": batch,
        "reps": reps, "floor_ms_per_rep": round(floor, 4), "mode": "grad",
    }
    return out
