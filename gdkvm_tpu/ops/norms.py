"""Lane-friendly GroupNorm for NHWC feature maps.

Why this exists (measured, v5e, 2026-08-19): `nn.GroupNorm` reshapes the
map to (..., groups, group_size) to reduce — with this repo's channel
counts the group size is 2-3, so every elementwise/broadcast op in the
normalization runs with a 2-3-wide minor dim on the 128-lane axis
(CLAUDE.md rule 11: 2/128 lane utilization).  Standalone cost at the
256²-recipe encoder shape ((80,64,64,64) bf16, 32 groups): **0.335 ms
forward** for 0.2 GFLOP — 3× the HBM bandwidth bound — and the flagship
encoder carries 5 of them per stage-4 pass (the decoder 6 more at group
size 3).

This implementation never reshapes the big map:

1. one fused pass computes the channel-wise fp32 spatial moments
   Σx, Σx² at the native (…, C) layout (full lanes),
2. the (B, C) moments fold to (B, G) group stats — a tiny array op,
3. the affine is refactored to a single fused elementwise pass
   y = x·a + b with a = rsqrt(var+ε)·scale, b = bias − mean·a
   (per (B, C), broadcast on the sublane axis only).

Same math as `nn.GroupNorm(use_fast_variance=True,
force_float32_reductions=True)` (the flax defaults used everywhere in
this repo): stats in fp32, E[x²]−E[x]² variance, ε inside the rsqrt.
The only numerical difference is the reassociation of
((x−mean)·inv)·scale+bias into x·a+b, performed in fp32 — parity-tested
at ≤2e-6 fp32 / bit-tolerance bf16 (tests/test_model.py).

Reference parity: the reference's conv blocks normalize per-frame
activations (reference: README.md:18 CNN lineage); GroupNorm keeps
batch-size independence for batch-1 streaming (models/encoder.py:9-10).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               num_groups: int, eps: float = 1e-6) -> jax.Array:
    """GroupNorm over the trailing channel dim of an N-D (≥2) map.

    x: (B, *spatial, C); scale/bias: (C,).  Statistics reduce over
    *spatial and the within-group channels, per batch element — identical
    reduction set to flax's default (all dims but the leading batch).
    Returns x's dtype; math in fp32.
    """
    c = x.shape[-1]
    gs = c // num_groups
    b = x.shape[0]
    red = tuple(range(1, x.ndim - 1))
    n_el = gs
    for i in red:
        n_el *= x.shape[i]

    xf = x.astype(jnp.float32)
    # One fused read: channel-wise spatial moments at full lane width.
    s1 = xf.sum(red)                     # (B, C)
    s2 = (xf * xf).sum(red)              # (B, C) — same pass (XLA fuses)
    # Tiny (B, G) combine — the only grouped-shape arrays in the graph.
    m = s1.reshape(b, num_groups, gs).sum(-1) / n_el
    m2 = s2.reshape(b, num_groups, gs).sum(-1) / n_el
    inv = jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0.0) + eps)
    # Fold the whole affine into one x·a + b pass (a, b per (B, C)).
    a = jnp.repeat(inv, gs, axis=-1) * scale.astype(jnp.float32)[None]
    off = bias.astype(jnp.float32)[None] - jnp.repeat(m, gs, axis=-1) * a
    bshape = (b,) + (1,) * len(red) + (c,)
    y = xf * a.reshape(bshape) + off.reshape(bshape)
    return y.astype(x.dtype)


class GroupNorm(nn.Module):
    """Drop-in for `nn.GroupNorm(num_groups=..., dtype=...)` as used in
    this repo (use_bias/use_scale on, default init/ε): same param tree
    ("scale", "bias" of shape (C,), fp32), so checkpoints swap freely."""
    num_groups: int
    dtype: jnp.dtype = jnp.bfloat16
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        if c % self.num_groups:
            raise ValueError(f"channels {c} not divisible by "
                             f"num_groups {self.num_groups}")
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x.astype(self.dtype), scale, bias,
                          self.num_groups, self.epsilon)
