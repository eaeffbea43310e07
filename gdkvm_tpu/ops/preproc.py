"""Fused device-side preprocessing: resize + normalize inside the jit.

SURVEY §2.3/§7.1 ("fused resize/normalize", `kernels/fused_preproc`): for
serving arbitrary-resolution input at rate, the resize belongs on device —
host-side PIL/cv2 resize of a raw CAMUS half-sequence (~600×800) is serial
CPU work on this 1-core host, while the TPU sits idle.

TPU-first design: separable resize as TWO MATMULS rather than a gather.
For static shapes the interpolation weights are a trace-time constant
(dst×src matrix per axis, built with numpy), so

    out[t, o, p] = R_h[o, h] · x[t, h, w] · R_w[p, w]

runs entirely on the MXU and fuses with the normalize (and, under one jit,
with the model's first conv).  The filter is the standard triangle
(bilinear) kernel with antialias support max(scale, 1) — matching
jax.image.resize(antialias=True) semantics — with half-pixel centers.

uint8 in → compute-dtype in [0, 1] out; all shapes static.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _resize_matrix(src: int, dst: int, antialias: bool = True
                   ) -> np.ndarray:
    """(dst, src) triangle-filter interpolation matrix, rows sum to 1."""
    if src == dst:
        return np.eye(dst, dtype=np.float32)
    scale = src / dst
    support = max(scale, 1.0) if antialias else 1.0
    out_centers = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    src_idx = np.arange(src, dtype=np.float64)
    # (dst, src) distances → triangle weights with the given support.
    w = 1.0 - np.abs(out_centers[:, None] - src_idx[None, :]) / support
    w = np.maximum(w, 0.0)
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


def resize_normalize(frames_u8: jax.Array, out_hw: Tuple[int, int],
                     dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """uint8 (..., H, W, C) → ``dtype`` (..., h, w, C) in [0, 1].

    Jittable; the two interpolation matmuls hit the MXU and XLA fuses the
    1/255 normalize into them.  Identity-size input skips the matmuls.
    """
    *lead, src_h, src_w, c = frames_u8.shape
    dst_h, dst_w = out_hw
    x = frames_u8.astype(jnp.float32) * (1.0 / 255.0)
    if (src_h, src_w) == (dst_h, dst_w):
        return x.astype(dtype)
    r_h = jnp.asarray(_resize_matrix(src_h, dst_h))      # (h, H)
    r_w = jnp.asarray(_resize_matrix(src_w, dst_w))      # (w, W)
    x = x.reshape((-1, src_h, src_w * c))
    x = jnp.einsum("oh,bhw->bow", r_h, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = x.reshape((-1, dst_h, src_w, c))
    x = jnp.einsum("pw,bhwc->bhpc", r_w, x,
                   precision=jax.lax.Precision.HIGHEST)
    return x.reshape((*lead, dst_h, dst_w, c)).astype(dtype)


def resize_u8(frames_u8: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """uint8 (..., H, W, C) → uint8 (..., h, w, C) (device-side; for
    callers that must stay in uint8, e.g. staging into a serving batch)."""
    x = resize_normalize(frames_u8, out_hw)
    return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)
