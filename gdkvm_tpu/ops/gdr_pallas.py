"""Pallas TPU kernel for the chunked GDR scan.

The performance-critical recurrence (SURVEY.md §7.3 hard part #1): one frame
= one chunk of N spatial tokens; the associative state S (d_k × d_v fp32)
stays **resident in VMEM across the whole time grid** — it is a scratch
buffer carried over the sequential T grid dimension, never round-tripping
through HBM between frames.  Per grid step (one frame):

    S̃ = α_t S                                  (forget gate)
    O_t = Q_t S̃                                (LKVA read, N×d_k @ d_k×d_v)
    A  = strict_tril(diag(β) K Kᵀ)              (N×N token interactions)
    T' = (I + A)^{-1}                           (unit-lower forward-subst)
    U  = T' diag(β) V ;  W = T' diag(β) K
    S ← S̃ + Kᵀ (U − W S̃)                       (N delta-rule writes, fused)

All matmuls hit the MXU; T' is applied by blocked forward substitution
(exact series inverses on 16×16 diagonal blocks — numerically safe at any
N, unlike a whole-matrix nilpotent series — with matmul elimination below).
I/O may be bf16; internal math is fp32 at HIGHEST matmul precision.  Parity
vs the lax.scan ground truth (gdkvm_tpu/core/gdr.py) is tested at every
shape in tests/test_gdr_pallas.py, including interpret mode on CPU.

The backward pass is a custom VJP that recomputes through the pure-JAX
chunkwise form (differentiable, same math — parity-tested), so the Pallas
path is usable in training too; inference never touches it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gdkvm_tpu.core import gdr as gdr_core

_F32 = jnp.float32

# True-fp32 MXU passes: the delta rule's rank-1 cancellations lose ~1e-2
# relative accuracy under the default bf16 matmul truncation (measured on
# v5e); HIGHEST costs extra passes only on these tiny (≤128²) matrices.
_dot = functools.partial(jnp.dot, preferred_element_type=_F32,
                         precision=jax.lax.Precision.HIGHEST)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bdot(x: jax.Array, y: jax.Array) -> jax.Array:
    """Head-batched matmul: (H,M,K) @ (H,K,N) → (H,M,N), fp32 MXU."""
    return jax.lax.dot_general(
        x, y, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=_F32,
        precision=jax.lax.Precision.HIGHEST)


def _gdr_kernel(alpha_ref, q_ref, k_ref, v_ref, beta_ref, s0_ref,
                o_ref, sT_ref, s_scr):
    """One (b, t) grid step: advance all H heads' states one frame.

    alpha_ref is a scalar-prefetch arg: the full (B, T, H) gate table lives
    in SMEM for the whole kernel (PrefetchScalarGridSpec).  The state
    scratch (H, dk, dv) persists in VMEM across the sequential T grid dim.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    # New batch element starts: load its initial states.
    @pl.when(t == 0)
    def _():
        s_scr[:] = s0_ref[0].astype(_F32)

    h = q_ref.shape[2]
    q = q_ref[0, 0].astype(_F32)            # (H, N, dk)
    k = k_ref[0, 0].astype(_F32)            # (H, N, dk)
    v = v_ref[0, 0].astype(_F32)            # (H, N, dv)
    beta = beta_ref[0, 0].astype(_F32)      # (H, N, 1)

    # Decay each head's state in place (scalar × 2D slice — Mosaic-friendly;
    # a (H,) vector → (H,1,1) broadcast is an unsupported shape cast).
    for i in range(h):
        s_scr[i] = alpha_ref[b, t, i].astype(_F32) * s_scr[i]
    s = s_scr[:]                            # decayed states S̃

    # LKVA read against the decayed pre-write state.
    o_ref[0, 0] = _bdot(q, s).astype(o_ref.dtype)

    # WY transform per head: A = strict_tril(diag(β) K Kᵀ).
    kb = k * beta                           # diag(β) K
    n = k.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    a = _bdot(kb, k.transpose(0, 2, 1))
    a = jnp.where((row > col)[None], a, 0.0)   # strictly lower triangular

    # X = (I + A)^{-1} [diag(β)V | diag(β)K] by blocked forward
    # substitution: exact nilpotent-series inverses on ≤16×16 diagonal
    # blocks (growth-bounded, fp32-safe at any N — a whole-matrix series
    # overflows at N=256 with correlated keys), matmul elimination below.
    # Mirrors core.gdr._solve_unit_lower; all ops MXU, no dynamic slices.
    rhs = jnp.concatenate([v * beta, kb], axis=2)       # (H, N, dv+dk)
    bs = min(16, n)                         # n is padded to a multiple of bs
    eye_b = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1), 1.0, 0.0)[None]

    def inv_diag(a_ii):
        b_pow = -a_ii
        p = eye_b + b_pow
        for _ in range(max(int(bs - 1).bit_length() - 1, 0)):
            b_pow = _bdot(b_pow, b_pow)
            p = p + _bdot(b_pow, p)
        return p

    blocks = []
    for i in range(n // bs):
        r_i = rhs[:, i * bs:(i + 1) * bs]
        if i:
            x_prev = jnp.concatenate(blocks, axis=1)
            r_i = r_i - _bdot(a[:, i * bs:(i + 1) * bs, : i * bs], x_prev)
        a_ii = a[:, i * bs:(i + 1) * bs, i * bs:(i + 1) * bs]
        blocks.append(_bdot(inv_diag(a_ii), r_i))
    uw = jnp.concatenate(blocks, axis=1)
    u = uw[:, :, : v.shape[2]]
    w = uw[:, :, v.shape[2]:]

    # Fused N-token delta-rule write.
    s_new = s + _bdot(k.transpose(0, 2, 1), u - _bdot(w, s))
    s_scr[:] = s_new

    @pl.when(t == n_t - 1)
    def _():
        sT_ref[0] = s_new.astype(sT_ref.dtype)


def _gdr_pallas_flat(q: jax.Array, k: jax.Array, v: jax.Array,
                     beta: jax.Array, alpha: jax.Array, s0: jax.Array,
                     interpret: bool) -> Tuple[jax.Array, jax.Array]:
    """Flat (B, T, H, N, d) invocation.  N must be pre-padded (β=0 on pads).

    All H heads advance together per grid step (head-batched matmuls), so
    the sequential grid is only (B, T) — fewer, larger steps.
    """
    b, t, h, n, dk = q.shape
    dv = v.shape[-1]
    beta2 = beta[..., None]                 # (B,T,H,N,1)

    out_shape = (
        jax.ShapeDtypeStruct((b, t, h, n, dv), _F32),
        jax.ShapeDtypeStruct((b, h, dk, dv), _F32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # alpha table lives in SMEM
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, h, n, dk), lambda g, i, *_: (g, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, h, n, dk), lambda g, i, *_: (g, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, h, n, dv), lambda g, i, *_: (g, i, 0, 0, 0)),
            pl.BlockSpec((1, 1, h, n, 1), lambda g, i, *_: (g, i, 0, 0, 0)),
            pl.BlockSpec((1, h, dk, dv), lambda g, i, *_: (g, 0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, h, n, dv), lambda g, i, *_: (g, i, 0, 0, 0)),
            pl.BlockSpec((1, h, dk, dv), lambda g, i, *_: (g, 0, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((h, dk, dv), _F32)],
    )
    o, s_t = pl.pallas_call(
        _gdr_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * t * (3 * n * dk * dv + n * n * dk
                                   + n * n * (dk + dv)),
            bytes_accessed=b * h * t * n * (2 * dk + 2 * dv) * 4,
            transcendentals=0,
        ),
    )(alpha, q, k, v, beta2, s0)
    return o, s_t


def _pad_tokens(x: jax.Array, n_pad: int) -> jax.Array:
    if x.shape[-2] == n_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, n_pad - x.shape[-2])
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gdr_pallas_bh(q, k, v, beta, alpha, s0):
    """GDR scan via the Pallas TPU kernel.

    Shapes as gdr_chunked_bh: q,k (B,H,T,N,dk); v (B,H,T,N,dv);
    beta (B,H,T,N); alpha (B,H,T); s0 (B,H,dk,dv).
    Returns (o (B,H,T,N,dv) fp32, s_T (B,H,dk,dv) fp32).
    """
    return _gdr_pallas_fwd_impl(q, k, v, beta, alpha, s0)


def _gdr_pallas_fwd_impl(q, k, v, beta, alpha, s0):
    b, h, t, n, dk = q.shape
    dv = v.shape[-1]
    # Pad tokens to a multiple of the 16-wide substitution block.
    n_pad = max(_round_up(n, 16), 16)

    # (B,H,T,N,d) → (B,T,H,N,d); pad tokens with β=0 (exact no-op writes).
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    qf = tr(_pad_tokens(q, n_pad))
    kf = tr(_pad_tokens(k, n_pad))
    vf = tr(_pad_tokens(v, n_pad))
    bf = tr(_pad_tokens(beta[..., None], n_pad)[..., 0])
    af = jnp.transpose(alpha, (0, 2, 1)).astype(_F32)   # (B,T,H)

    interpret = jax.default_backend() == "cpu"
    o, s_t = _gdr_pallas_flat(qf, kf, vf, bf, af, s0, interpret)
    o = jnp.swapaxes(o, 1, 2)[:, :, :, :n, :]           # (B,H,T,N,dv)
    return o, s_t


def _fwd(q, k, v, beta, alpha, s0):
    out = _gdr_pallas_fwd_impl(q, k, v, beta, alpha, s0)
    return out, (q, k, v, beta, alpha, s0)


def _bwd(residuals, cotangents):
    # Backward through the mathematically-identical pure-JAX chunked form
    # (XLA-compiled; recompute-in-backward keeps the kernel forward-only).
    _, vjp = jax.vjp(gdr_core.gdr_chunked_bh, *residuals)
    return vjp(cotangents)


gdr_pallas_bh.defvjp(_fwd, _bwd)
