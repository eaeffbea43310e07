"""Post-training W8A8 quantization for the conv backbone (serving path).

The reference's serving story is real-time echocardiography segmentation
(reference: README.md:22 "real-time performance"); this module adds the
TPU-native quantized-inference option: v5e's MXU runs int8 matmuls at 2×
the bf16 rate (394 vs 197 peak), and the measured raw conv win at the
saturated serving shape is 1.99× (292 TOPS, BASELINE.md r3.8 probe).

Design — no model-code duplication, no param-tree change:

- Quantization is a *method interceptor* (`flax.linen.intercept_methods`)
  around the plain model's ``apply``: every ``nn.Conv`` whose module path
  has a calibrated activation scale runs as
  ``quantize(x) → int8 conv (int32 accum) → dequant·(s_w·s_x) [+bias]``
  with per-output-channel weight scales computed from the checkpoint
  weights at trace time.  Everything else (GroupNorm, SiLU, residual
  adds, the GDR memory, the decoder einsums) runs exactly as before.
- Activation scales are STATIC floats (trace-time constants) calibrated
  offline by observing abs-max or a high percentile of |x| over
  calibration batches — one number per conv path (per-tensor symmetric).
  Percentile mode (``method="percentile"``) is the outlier-robust option
  for UNSCREENED calibration data: a single hot speckle pixel collapses
  the abs-max int8 range (mask agreement 0.98 → 0.73 in
  tests/test_quant.py::test_percentile_calibration_robust) while the
  99.9th percentile of |x| ignores it.  On clean calibration clips
  abs-max is the better default — the trained model's activation
  extremes are real signal, and clipping them cost −0.0033 fg Dice vs
  abs-max's −0.0002 on the full-recipe flagship (BASELINE.md r4.5).
- ``QuantGDKVM`` is the user-facing handle: a ``GDKVM`` subclass carrying
  the scale table; its ``cfg.quant`` tag ensures the shared jitted-apply
  caches (eval/streaming.py, serve.py) key quantized and full-precision
  traces separately.  Trained checkpoints load unchanged.

Scope: convs with ``feature_group_count == 1`` and spatial kernels (the
encoder stem/stages and decoder refine convs — where the conv FLOPs
are).  Depthwise convs (KPFF local branch) are bandwidth-bound, not
MXU-bound, and stay bf16.  Training is NEVER quantized (int8 has no grad
story on v5e) — this is an inference-only transform.

Measured motivation (v5e, floor-corrected; BASELINE.md r3.8 + r5.1):
raw int8 3×3 conv 1.43-1.99× over bf16; full-forward encoder-scope wins
1.07-1.10× at BOTH the saturated 112² and the 256² recipe shape on both
model arms (the r3.8-era "loses at memory-bound 256²" reading was
superseded by the r5 interleaved re-measurement).  Still off by default
and gated by a measured quality check (`gdkvm quant --check`) — the gate
is per-checkpoint, not per-shape.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import replace
from typing import Callable, Dict, Iterable, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gdkvm_tpu.models.gdkvm import GDKVM


def _conv_dims(ndim: int) -> jax.lax.ConvDimensionNumbers:
    """NHWC/HWIO/NHWC dimension numbers for 2D convs (flax default)."""
    return jax.lax.conv_dimension_numbers(
        (1,) * ndim, (1,) * ndim, ("NHWC", "HWIO", "NHWC"))


def _eligible(mod: nn.Module) -> bool:
    """Convs the int8 MXU path pays for: non-depthwise 2D nn.Conv."""
    if not isinstance(mod, nn.Conv):
        return False
    ks = mod.kernel_size
    ks = (ks,) if isinstance(ks, int) else tuple(ks)
    return (mod.feature_group_count == 1 and len(ks) == 2
            and mod.input_dilation in (1, None, (1, 1))
            and mod.kernel_dilation in (1, None, (1, 1))
            and isinstance(mod.padding, str))


def _mod_path(mod: nn.Module) -> str:
    return "/".join(str(p) for p in mod.path)


def quantized_conv(x: jax.Array, kernel: jax.Array, act_scale: float,
                   *, strides: Tuple[int, int], padding: str,
                   bias: Optional[jax.Array], out_dtype) -> jax.Array:
    """W8A8 conv: per-tensor activation scale, per-out-channel weights.

    x: (..., H, W, Cin) float; kernel: (kh, kw, Cin, Cout) float (checkpoint
    weights — quantized here at trace time, so the int8 weights are
    compile-time constants under jit); act_scale: static float.
    Accumulates in int32 on the MXU's int8 path, dequantizes once.
    """
    # Per-out-channel symmetric weight quantization (fp32 math).
    kf = kernel.astype(jnp.float32)
    w_amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))            # (Cout,)
    w_scale = jnp.maximum(w_amax, 1e-12) / 127.0
    k8 = jnp.clip(jnp.round(kf / w_scale), -127, 127).astype(jnp.int8)

    inv = np.float32(127.0 / max(act_scale, 1e-12))
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127
                  ).astype(jnp.int8)

    y = jax.lax.conv_general_dilated(
        x8, k8, strides, padding,
        dimension_numbers=_conv_dims(x.ndim),
        preferred_element_type=jnp.int32)
    deq = (w_scale * np.float32(act_scale / 127.0))          # (Cout,)
    out = y.astype(jnp.float32) * deq
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def _w8a8_interceptor(scales: Mapping[str, float]) -> Callable:
    """Replace calibrated nn.Conv calls with the int8 path."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or not _eligible(mod):
            return next_fun(*args, **kwargs)
        s = scales.get(_mod_path(mod))
        if s is None:
            return next_fun(*args, **kwargs)
        (x,) = args
        params = mod.variables["params"]
        strides = mod.strides
        strides = ((strides, strides) if isinstance(strides, int)
                   else tuple(strides) if strides is not None else (1, 1))
        out_dtype = mod.dtype if mod.dtype is not None else x.dtype
        return quantized_conv(
            x, params["kernel"], float(s), strides=strides,
            padding=mod.padding,
            bias=params.get("bias") if mod.use_bias else None,
            out_dtype=out_dtype)

    return interceptor


def _observe_interceptor(sink: Dict[str, list],
                         stat_fn: Callable) -> Callable:
    """Record ``stat_fn(|x|)`` of each eligible conv's input into ``sink``
    (tracers — the wrapping jit must return them as outputs) — the
    calibration pass."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and _eligible(mod):
            sink.setdefault(_mod_path(mod), []).append(
                stat_fn(jnp.abs(args[0].astype(jnp.float32))))
        return next_fun(*args, **kwargs)

    return interceptor


def calibrate_act_scales(model: GDKVM, params,
                         batches: Iterable[np.ndarray],
                         scope: str = "encoder",
                         headroom: float = 1.0,
                         method: str = "absmax",
                         percentile: float = 99.9) -> Dict[str, float]:
    """Run calibration batches through the model, collect a per-conv input
    range statistic, return {module_path: act_scale}.

    Args:
      batches: iterable of (B, T, H, W, C) float frame clips (normalized
        exactly as inference will see them).
      scope: "encoder" (default — the measured-win region), "decoder", or
        "all"; path-prefix filter on which convs get calibrated.
      headroom: multiplier on the observed statistic (>=1 clips less).
      method: "absmax" (exact range; outlier-fragile) or "percentile"
        (``percentile``-th percentile of |x| per batch — robust to sparse
        speckle outliers in real ultrasound; values above the scale clip
        to ±127 in the int8 path).
      percentile: percentile of |x| used when method="percentile".
    """
    if method not in ("absmax", "percentile"):
        raise ValueError(f"unknown calibration method {method!r}")
    if method == "percentile":
        stat_fn = lambda a: jnp.percentile(a.reshape(-1), percentile)
    else:
        stat_fn = jnp.max

    @jax.jit
    def fwd(frames):
        # The interceptor records tracers into `sink` DURING tracing, so
        # the per-conv statistic scalars must be returned as jit outputs —
        # reading the closure after the call would leak tracers.
        sink: Dict[str, list] = {}
        with nn.intercept_methods(_observe_interceptor(sink, stat_fn)):
            model.apply(params, frames)
        # Across a conv's multiple call sites within one clip: max of the
        # per-site statistics (each already outlier-robust in pct mode).
        return {k: jnp.max(jnp.stack(v)) for k, v in sink.items()}

    amax: Dict[str, float] = {}
    for b in batches:
        # One host sync per batch: fetch every conv's abs-max scalar.
        fetched = jax.device_get(fwd(jnp.asarray(b)))
        for k, v in fetched.items():
            amax[k] = max(amax.get(k, 0.0), float(v))

    def in_scope(path: str) -> bool:
        if scope == "all":
            return True
        return path.startswith(scope)

    return {k: v * headroom for k, v in amax.items()
            if in_scope(k) and v > 0.0}


def save_scales(path: str, scales: Mapping[str, float]) -> None:
    with open(path, "w") as f:
        json.dump(dict(scales), f, indent=2, sort_keys=True)


def load_scales(path: str) -> Dict[str, float]:
    with open(path) as f:
        return {str(k): float(v) for k, v in json.load(f).items()}


class QuantGDKVM(GDKVM):
    """GDKVM with W8A8 convs at serving time.

    Construct via :func:`w8a8_model`; behaves exactly like ``GDKVM`` (same
    params, same API) except calibrated convs run int8.  ``cfg.quant``
    carries a digest of the scale table so the repr-keyed jitted-apply
    caches never mix quantized and full-precision traces.
    """
    quant_scales: Tuple[Tuple[str, float], ...] = ()

    @nn.nowrap
    def apply(self, *args, **kwargs):  # type: ignore[override]
        with nn.intercept_methods(_w8a8_interceptor(dict(self.quant_scales))):
            return super().apply(*args, **kwargs)


def w8a8_model(model: GDKVM, scales: Mapping[str, float]) -> QuantGDKVM:
    """Wrap a model with calibrated W8A8 conv execution."""
    digest = hashlib.sha1(json.dumps(
        dict(scales), sort_keys=True).encode()).hexdigest()[:8]
    cfg = replace(model.cfg, quant=f"w8a8-{digest}")
    return QuantGDKVM(cfg=cfg,
                      quant_scales=tuple(sorted(scales.items())))
