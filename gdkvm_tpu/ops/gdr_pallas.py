"""Pallas TPU kernels for the chunked GDR scan (forward + fused backward).

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

Backward: a second Pallas kernel scans the time grid in REVERSE with the
state cotangent dS resident in VMEM.  The forward (when taped) additionally
streams each frame's pre-decay state S_{t-1} to HBM; the backward kernel
recomputes that frame's WY solve from the checkpoint and applies the
HAND-DERIVED adjoint entirely in VMEM (flash-attention-style recompute; a
jax.vjp-generated kernel body was tried first and blew the 16 MB scoped
VMEM stack at N≥196 by keeping every unrolled solve intermediate live).
The adjoint needs one extra triangular machine: Y = (I+A)^{-T} dX, a
blocked BACKWARD substitution mirroring the forward one.  dα leaves the
kernel as a lane-broadcast (H,128) row per frame (Mosaic has no scalar
outputs).

**Measured outcome (v5e): of the two kernel backwards, the
recompute-through-XLA one is the better TPU design and is the DEFAULT**
(``GDKVM_GDR_BWD=fused`` opts into the fused reverse-scan kernel).  Why:
the backward's heavy per-frame work (solve recompute, dq/dk/dv matmuls) is
INDEPENDENT across frames once the dS carries are known; XLA's scan
transpose recomputes it batched across the whole sequence and only
serializes the tiny dS chain, while a single sequential kernel serializes
everything behind the carry.  The fused kernel is kept (parity-tested both
modes) for the record and for future megacore-style hardware where grid
steps overlap.

**For TRAINING, however, pure XLA beats even Pallas-fwd+XLA-bwd at every
shape** (r2 scan-chained measurement, BASELINE.md GDR gradient crossover):
under grad XLA stores the forward's solves and reuses them in the
backward, while this custom_vjp recompute path performs them twice.
``gdr_impl: auto`` therefore resolves to the XLA chunked form for training
traces (models.gdkvm.train_model_config) and to this kernel for inference
traces, where its transpose-free forward wins or ties everywhere
(0.99-1.97×, BASELINE.md).

Adjoint derivation (per head; g = dS_new, upper-case = matrices):

    forward: kb = β⊙K;  A = stril(kb Kᵀ);  X = [U|W] = (I+A)⁻¹ [β⊙V | kb]
             O = Q S̃;  M = U − W S̃;  S_new = S̃ + Kᵀ M
    adjoint: dQ  = dO S̃ᵀ
             dS̃  = g + Qᵀ dO − Wᵀ (K g)
             dU  = K g;   dW = −(K g) S̃ᵀ;   dX = [dU | dW]
             Y   = (I+A)⁻ᵀ dX;   dA = −stril(Y Xᵀ)
             dkb = dA K + Y_k;   dK = M gᵀ + dAᵀ kb + β⊙dkb
             dV  = β⊙Y_v;  dβ = Σ_dv(Y_v⊙V) + Σ_dk(dkb⊙K)
             dα_h = ⟨dS̃, S_prev⟩;   carry dS_prev = α⊙dS̃
"""

from __future__ import annotations

import functools
import os
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


def _tril_mask(a: jax.Array) -> jax.Array:
    """Zero everything on/above the diagonal of (H, N, N)."""
    n = a.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where((row > col)[None], a, 0.0)


def _inv_diag_fn(bs: int):
    """(I + a_ii)^{-1} for strictly-lower bs×bs blocks via series doubling
    (exact nilpotent inverse, growth-bounded at bs ≤ 16)."""
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

    return inv_diag


def _solve_lower(a: jax.Array, rhs: jax.Array) -> jax.Array:
    """X = (I + A)^{-1} RHS for strictly-lower A (H,N,N) by blocked forward
    substitution: exact nilpotent-series inverses on ≤16×16 diagonal blocks
    (fp32-safe at any N — a whole-matrix series overflows at N=256 with
    correlated keys), matmul elimination below.  Mirrors
    core.gdr._solve_unit_lower; all ops MXU, no dynamic slices."""
    n = a.shape[-1]
    bs = min(16, n)                         # n is padded to a multiple of bs
    inv_diag = _inv_diag_fn(bs)
    blocks = []
    for i in range(n // bs):
        r_i = rhs[:, i * bs:(i + 1) * bs]
        if i:
            x_prev = jnp.concatenate(blocks, axis=1)
            r_i = r_i - _bdot(a[:, i * bs:(i + 1) * bs, : i * bs], x_prev)
        a_ii = a[:, i * bs:(i + 1) * bs, i * bs:(i + 1) * bs]
        blocks.append(_bdot(inv_diag(a_ii), r_i))
    return jnp.concatenate(blocks, axis=1)


def _solve_lower_t(a: jax.Array, rhs: jax.Array) -> jax.Array:
    """Y = (I + A)^{-T} RHS — the transposed system (unit UPPER triangular),
    by blocked BACKWARD substitution from the last block row.  This is the
    adjoint of :func:`_solve_lower` used by the backward kernel."""
    n = a.shape[-1]
    bs = min(16, n)
    inv_diag = _inv_diag_fn(bs)
    nb = n // bs
    blocks = []                             # stored last-block-first
    for j in range(nb - 1, -1, -1):
        r_j = rhs[:, j * bs:(j + 1) * bs]
        if blocks:
            y_below = jnp.concatenate(blocks[::-1], axis=1)  # rows > block j
            a_below = a[:, (j + 1) * bs:, j * bs:(j + 1) * bs]
            r_j = r_j - _bdot(a_below.transpose(0, 2, 1), y_below)
        a_jj = a[:, j * bs:(j + 1) * bs, j * bs:(j + 1) * bs]
        blocks.append(_bdot(inv_diag(a_jj).transpose(0, 2, 1), r_j))
    return jnp.concatenate(blocks[::-1], axis=1)


def _frame_math(s_dec: jax.Array, q: jax.Array, k: jax.Array, v: jax.Array,
                beta2: jax.Array, eta2: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    """One frame's read+write on VALUES (not refs): shared by the forward
    kernel and the backward kernel's recompute.

    Decoupled gates (GDN-2 lineage, core/gdr.py derivation): β is the
    WRITE strength, η the ERASE strength; η ≡ β recovers the classic
    coupled rule (the public coupled API passes beta for both, and AD
    sums the two cotangents).

    Args (all fp32): s_dec (H,dk,dv) decayed state S̃; q,k (H,N,dk);
    v (H,N,dv); beta2, eta2 (H,N,1).  Returns (s_new (H,dk,dv),
    o (H,N,dv)).
    """
    # LKVA read against the decayed pre-write state.
    o = _bdot(q, s_dec)

    # WY transform per head: A = strict_tril(diag(η) K Kᵀ).
    ke = k * eta2                           # diag(η) K
    a = _tril_mask(_bdot(ke, k.transpose(0, 2, 1)))
    rhs = jnp.concatenate([v * beta2, ke], axis=2)       # (H, N, dv+dk)
    uw = _solve_lower(a, rhs)
    u = uw[:, :, : v.shape[2]]
    w = uw[:, :, v.shape[2]:]

    # Fused N-token delta-rule write.
    s_new = s_dec + _bdot(k.transpose(0, 2, 1), u - _bdot(w, s_dec))
    return s_new, o


def _frame_adjoint(s_dec, q, k, v, beta2, eta2, g, do):
    """Hand-derived adjoint of one frame (see module docstring derivation,
    generalized to decoupled gates: kb → diag(η)K everywhere the erase
    factor appears, diag(β) only on the V part of the RHS).

    Args (fp32): s_dec (H,dk,dv) decayed state S̃;
    q,k (H,N,dk); v (H,N,dv); beta2, eta2 (H,N,1); g = dS_new (H,dk,dv);
    do (H,N,dv).
    Returns (ds_dec, dq, dk, dv, dbeta2, deta2) — gate grads summed over
    the feature dim, shape (H,N,1).
    """
    dv_dim = v.shape[2]
    # Recompute the WY solve (cheaper than storing it: flash-attn style).
    ke = k * eta2
    a = _tril_mask(_bdot(ke, k.transpose(0, 2, 1)))
    rhs = jnp.concatenate([v * beta2, ke], axis=2)
    x = _solve_lower(a, rhs)                # [U | W]  (H, N, dv+dk)
    u = x[:, :, :dv_dim]
    w = x[:, :, dv_dim:]
    m = u - _bdot(w, s_dec)                 # (H, N, dv)

    kg = _bdot(k, g)                        # (H, N, dv)
    dq = _bdot(do, s_dec.transpose(0, 2, 1))
    ds_dec = g + _bdot(q.transpose(0, 2, 1), do) \
        - _bdot(w.transpose(0, 2, 1), kg)
    # dX = [dU | dW];  Y = (I+A)^{-T} dX;  dA = −stril(Y Xᵀ).
    dx = jnp.concatenate([kg, -_bdot(kg, s_dec.transpose(0, 2, 1))], axis=2)
    y = _solve_lower_t(a, dx)
    da = -_tril_mask(_bdot(y, x.transpose(0, 2, 1)))
    y_v = y[:, :, :dv_dim]
    y_k = y[:, :, dv_dim:]
    dke = _bdot(da, k) + y_k
    dk_out = _bdot(m, g.transpose(0, 2, 1)) \
        + _bdot(da.transpose(0, 2, 1), ke) + eta2 * dke
    dv_out = beta2 * y_v
    dbeta2 = jnp.sum(y_v * v, axis=2, keepdims=True)
    deta2 = jnp.sum(dke * k, axis=2, keepdims=True)
    return ds_dec, dq, dk_out, dv_out, dbeta2, deta2


def _gdr_kernel(save_states: bool, alpha_ref, q_ref, k_ref, v_ref, beta_ref,
                eta_ref, s0_ref, *rest):
    """One (b, t) grid step: advance all H heads' states one frame.

    Operands arrive in the model's native (B, H, T, N, d) layout — the
    BlockSpecs slice (1, H, 1, N, d) blocks straight out of it, so NO
    transpose is materialized at the pallas_call boundary (the r1 kernel
    swapped to (B,T,H,...) first, and those copies were exactly why it
    lost to XLA at EchoNet scale — BASELINE.md GDR crossover rows).

    alpha_ref is a scalar-prefetch arg: the full (B, H, T) gate table lives
    in SMEM for the whole kernel (PrefetchScalarGridSpec).  The state
    scratch (H, dk, dv) persists in VMEM across the sequential T grid dim.
    With ``save_states`` the pre-decay state S_{t-1} is also streamed out
    per frame (the backward kernel's checkpoints).
    """
    if save_states:
        o_ref, sT_ref, states_ref, s_scr = rest
    else:
        o_ref, sT_ref, s_scr = rest
        states_ref = None
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    # New batch element starts: load its initial states.
    @pl.when(t == 0)
    def _():
        s_scr[:] = s0_ref[0].astype(_F32)

    if states_ref is not None:
        states_ref[0, :, 0] = s_scr[:]       # S_{t-1}, pre-decay

    h = q_ref.shape[1]
    q = q_ref[0, :, 0].astype(_F32)         # (H, N, dk)
    k = k_ref[0, :, 0].astype(_F32)         # (H, N, dk)
    v = v_ref[0, :, 0].astype(_F32)         # (H, N, dv)
    beta = beta_ref[0, :, 0].astype(_F32)   # (H, N, 1)
    eta = eta_ref[0, :, 0].astype(_F32)     # (H, N, 1)

    # Decay each head's state in place (scalar × 2D slice — Mosaic-friendly;
    # a (H,) vector → (H,1,1) broadcast is an unsupported shape cast).
    for i in range(h):
        s_scr[i] = alpha_ref[b, i, t].astype(_F32) * s_scr[i]

    s_new, o = _frame_math(s_scr[:], q, k, v, beta, eta)
    o_ref[0, :, 0] = o.astype(o_ref.dtype)
    s_scr[:] = s_new

    @pl.when(t == n_t - 1)
    def _():
        sT_ref[0] = s_new.astype(sT_ref.dtype)


def _gdr_bwd_kernel(alpha_ref, q_ref, k_ref, v_ref, beta_ref, eta_ref,
                    states_ref, do_ref, dsT_ref,
                    dq_ref, dk_ref, dv_ref, dbeta_ref, deta_ref,
                    dalpha_ref, ds0_ref, ds_scr, sdec_scr):
    """One reversed (b, i) grid step of the fused backward: frame t = T-1-i.

    Re-derives the frame from its checkpoint S_{t-1} and applies the
    hand-written adjoint (:func:`_frame_adjoint`) with the carried state
    cotangent dS (VMEM scratch).  dα_t,h = ⟨dS̃, S_{t-1}⟩ per head, emitted
    lane-broadcast.
    """
    b = pl.program_id(0)
    i_rev = pl.program_id(1)
    n_t = pl.num_programs(1)
    t = n_t - 1 - i_rev

    @pl.when(i_rev == 0)
    def _():
        ds_scr[:] = dsT_ref[0].astype(_F32)

    h = q_ref.shape[1]
    s_prev = states_ref[0, :, 0]            # (H, dk, dv) fp32 checkpoint
    # Recompute the decayed state S̃ (scalar × 2D per head).
    for j in range(h):
        sdec_scr[j] = alpha_ref[b, j, t].astype(_F32) * s_prev[j]

    q = q_ref[0, :, 0].astype(_F32)
    k = k_ref[0, :, 0].astype(_F32)
    v = v_ref[0, :, 0].astype(_F32)
    beta = beta_ref[0, :, 0].astype(_F32)
    eta = eta_ref[0, :, 0].astype(_F32)

    do = do_ref[0, :, 0].astype(_F32)
    ds_dec, dq, dk, dv, dbeta, deta = _frame_adjoint(
        sdec_scr[:], q, k, v, beta, eta, ds_scr[:], do)

    dq_ref[0, :, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, :, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, :, 0] = dv.astype(dv_ref.dtype)
    dbeta_ref[0, :, 0] = dbeta.astype(dbeta_ref.dtype)
    deta_ref[0, :, 0] = deta.astype(deta_ref.dtype)

    # dα per head as a lane-broadcast (1,128) row (no scalar outputs in
    # Mosaic); the wrapper reads lane 0.
    dalpha_ref[0, :, 0] = jnp.concatenate(
        [jnp.full((1, 128), jnp.sum(ds_dec[j] * s_prev[j]), _F32)
         for j in range(h)], axis=0)

    # Carry: dS_{t-1} = α_t ⊙ dS̃_t  (+ the checkpoint read has no cotangent
    # — S_{t-1} enters only via S̃ and dα, both handled above).
    for j in range(h):
        ds_scr[j] = alpha_ref[b, j, t].astype(_F32) * ds_dec[j]

    @pl.when(i_rev == n_t - 1)
    def _():
        ds0_ref[0] = ds_scr[:]


def _gdr_pallas_flat(q: jax.Array, k: jax.Array, v: jax.Array,
                     beta: jax.Array, eta: jax.Array, alpha: jax.Array,
                     s0: jax.Array, interpret: bool, save_states: bool):
    """Flat (B, H, T, N, d) invocation — the API layout, consumed directly.
    N must be pre-padded (β=0 on pads).

    All H heads advance together per grid step (head-batched matmuls), so
    the sequential grid is only (B, T) — fewer, larger steps.  Each grid
    step DMAs H strided (N, d) slabs per operand; no transposed copies are
    ever materialized.
    """
    b, h, t, n, dk = q.shape
    dv = v.shape[-1]
    beta2 = beta[..., None]                 # (B,H,T,N,1)
    eta2 = eta[..., None]

    blk = lambda d: pl.BlockSpec((1, h, 1, n, d),
                                 lambda g, i, *_: (g, 0, i, 0, 0))
    out_shape = [
        jax.ShapeDtypeStruct((b, h, t, n, dv), _F32),
        jax.ShapeDtypeStruct((b, h, dk, dv), _F32),
    ]
    out_specs = [
        blk(dv),
        pl.BlockSpec((1, h, dk, dv), lambda g, i, *_: (g, 0, 0, 0)),
    ]
    if save_states:
        out_shape.append(jax.ShapeDtypeStruct((b, h, t, dk, dv), _F32))
        out_specs.append(
            pl.BlockSpec((1, h, 1, dk, dv), lambda g, i, *_: (g, 0, i, 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # alpha table lives in SMEM
        grid=(b, t),
        in_specs=[
            blk(dk),                    # q
            blk(dk),                    # k
            blk(dv),                    # v
            blk(1),                     # beta
            blk(1),                     # eta
            pl.BlockSpec((1, h, dk, dv), lambda g, i, *_: (g, 0, 0, 0)),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((h, dk, dv), _F32)],
    )
    return pl.pallas_call(
        functools.partial(_gdr_kernel, save_states),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * t * (3 * n * dk * dv + n * n * dk
                                   + n * n * (dk + dv)),
            bytes_accessed=b * h * t * n * (2 * dk + 2 * dv) * 4,
            transcendentals=0,
        ),
    )(alpha, q, k, v, beta2, eta2, s0)


def _gdr_pallas_bwd_flat(q, k, v, beta, eta, alpha, states, do, dsT,
                         interpret: bool):
    """Flat reversed-scan backward in the (B,H,T,...) API layout, plus
    states (B,H,T,dk,dv) fp32 checkpoints, do (B,H,T,N,dv), dsT (B,H,dk,dv).

    Returns (dq, dk, dv, dbeta2, deta2, dalpha128 (B,H,T,128), ds0) —
    all fp32.
    """
    b, h, t, n, dk = q.shape
    dv = v.shape[-1]
    beta2 = beta[..., None]
    eta2 = eta[..., None]
    n_t = t

    rev5 = lambda g, i, *_: (g, 0, n_t - 1 - i, 0, 0)
    rev4 = lambda g, i, *_: (g, 0, n_t - 1 - i, 0)
    fix4 = lambda g, i, *_: (g, 0, 0, 0)

    out_shape = (
        jax.ShapeDtypeStruct((b, h, t, n, dk), _F32),   # dq
        jax.ShapeDtypeStruct((b, h, t, n, dk), _F32),   # dk
        jax.ShapeDtypeStruct((b, h, t, n, dv), _F32),   # dv
        jax.ShapeDtypeStruct((b, h, t, n, 1), _F32),    # dbeta
        jax.ShapeDtypeStruct((b, h, t, n, 1), _F32),    # deta
        jax.ShapeDtypeStruct((b, h, t, 128), _F32),     # dalpha (lane bcast)
        jax.ShapeDtypeStruct((b, h, dk, dv), _F32),     # ds0
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, h, 1, n, dk), rev5),       # q
            pl.BlockSpec((1, h, 1, n, dk), rev5),       # k
            pl.BlockSpec((1, h, 1, n, dv), rev5),       # v
            pl.BlockSpec((1, h, 1, n, 1), rev5),        # beta
            pl.BlockSpec((1, h, 1, n, 1), rev5),        # eta
            pl.BlockSpec((1, h, 1, dk, dv), rev5),      # states S_{t-1}
            pl.BlockSpec((1, h, 1, n, dv), rev5),       # do
            pl.BlockSpec((1, h, dk, dv), fix4),         # dsT
        ],
        out_specs=(
            pl.BlockSpec((1, h, 1, n, dk), rev5),
            pl.BlockSpec((1, h, 1, n, dk), rev5),
            pl.BlockSpec((1, h, 1, n, dv), rev5),
            pl.BlockSpec((1, h, 1, n, 1), rev5),
            pl.BlockSpec((1, h, 1, n, 1), rev5),
            pl.BlockSpec((1, h, 1, 128), rev4),
            pl.BlockSpec((1, h, dk, dv), fix4),
        ),
        scratch_shapes=[pltpu.VMEM((h, dk, dv), _F32),
                        pltpu.VMEM((h, dk, dv), _F32)],
    )
    return pl.pallas_call(
        _gdr_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # ~3× the forward's matmul work (recompute + two transposes).
            flops=6 * b * h * t * (3 * n * dk * dv + n * n * dk
                                   + n * n * (dk + dv)),
            bytes_accessed=b * h * t * (n * (4 * dk + 4 * dv) + 2 * dk * dv)
            * 4,
            transcendentals=0,
        ),
    )(alpha, q, k, v, beta2, eta2, states, do, dsT)


def _pad_tokens(x: jax.Array, n_pad: int) -> jax.Array:
    if x.shape[-2] == n_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, n_pad - x.shape[-2])
    return jnp.pad(x, pad)


def _flat_inputs(q, k, v, beta, eta, alpha):
    """Token-pad the (B,H,T,N,d) API operands to the kernel's N multiple.

    NO transposes — the kernel's BlockSpecs consume the API layout
    directly.  Token pads carry β=η=0 — exact no-op writes."""
    n = q.shape[-2]
    n_pad = max(_round_up(n, 16), 16)
    qf = _pad_tokens(q, n_pad)
    kf = _pad_tokens(k, n_pad)
    vf = _pad_tokens(v, n_pad)
    bf = _pad_tokens(beta[..., None], n_pad)[..., 0]
    ef = _pad_tokens(eta[..., None], n_pad)[..., 0]
    return qf, kf, vf, bf, ef, alpha.astype(_F32)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gdr_pallas_ew_bh(q, k, v, beta, alpha, s0, eta):
    """Decoupled erase/write GDR scan via the Pallas TPU kernel.

    Shapes as gdr_chunked_ew_bh: q,k (B,H,T,N,dk); v (B,H,T,N,dv);
    beta, eta (B,H,T,N); alpha (B,H,T); s0 (B,H,dk,dv).
    Returns (o (B,H,T,N,dv) fp32, s_T (B,H,dk,dv) fp32).
    """
    o, s_t, _ = _gdr_pallas_fwd_impl(q, k, v, beta, eta, alpha, s0,
                                     save_states=False)
    return o, s_t


def gdr_pallas_bh(q, k, v, beta, alpha, s0):
    """Classic coupled GDR scan (η = β) via the Pallas TPU kernel.

    beta feeds both gate slots of the decoupled kernel; under AD the two
    cotangents sum automatically, reproducing the coupled rule's dβ.
    """
    return gdr_pallas_ew_bh(q, k, v, beta, alpha, s0, beta)


def _gdr_pallas_fwd_impl(q, k, v, beta, eta, alpha, s0, save_states: bool):
    n = q.shape[-2]
    qf, kf, vf, bf, ef, af = _flat_inputs(q, k, v, beta, eta, alpha)
    outs = _gdr_pallas_flat(qf, kf, vf, bf, ef, af, s0, _interpret(),
                            save_states)
    o, s_t = outs[0], outs[1]
    o = o[:, :, :, :n, :]                               # (B,H,T,N,dv)
    return o, s_t, (outs[2] if save_states else None)


def _fwd(q, k, v, beta, alpha, s0, eta):
    if _bwd_mode() == "recompute":
        o, s_t, _ = _gdr_pallas_fwd_impl(q, k, v, beta, eta, alpha, s0,
                                         save_states=False)
        return (o, s_t), (q, k, v, beta, alpha, s0, eta, None)
    o, s_t, states = _gdr_pallas_fwd_impl(q, k, v, beta, eta, alpha, s0,
                                          save_states=True)
    return (o, s_t), (q, k, v, beta, alpha, s0, eta, states)


# "recompute" (XLA chunked form — measured fastest, see module docstring)
# | "fused" (reverse-scan Pallas kernel).  Read ONCE at import: the mode is
# baked into each jitted trace (residual structure differs), so a later env
# change could never affect already-compiled shapes anyway — set it before
# importing gdkvm_tpu.
_BWD_MODE = os.environ.get("GDKVM_GDR_BWD", "recompute")


def _bwd_mode() -> str:
    return _BWD_MODE


def _bwd(residuals, cotangents):
    q, k, v, beta, alpha, s0, eta, states = residuals
    if states is None:
        # Backward through the mathematically-identical pure-JAX chunked
        # form (XLA-compiled; recompute-in-backward, kernel forward-only).
        _, vjp = jax.vjp(gdr_core.gdr_chunked_ew_bh,
                         q, k, v, beta, alpha, s0, eta)
        return vjp(cotangents)

    do, dsT = cotangents
    n = q.shape[-2]
    n_pad = max(_round_up(n, 16), 16)
    qf, kf, vf, bf, ef, af = _flat_inputs(q, k, v, beta, eta, alpha)
    dof = _pad_tokens(do.astype(_F32), n_pad)
    dqf, dkf, dvf, dbf, def_, daf, ds0 = _gdr_pallas_bwd_flat(
        qf, kf, vf, bf, ef, af, states, dof, dsT.astype(_F32),
        _interpret())

    unpad = lambda x: x[:, :, :, :n]
    dq = unpad(dqf).astype(q.dtype)
    dk = unpad(dkf).astype(k.dtype)
    dv = unpad(dvf)[..., : v.shape[-1]].astype(v.dtype)
    dbeta = unpad(dbf)[..., 0].astype(beta.dtype)
    deta = unpad(def_)[..., 0].astype(eta.dtype)
    dalpha = daf[..., 0].astype(alpha.dtype)            # (B,H,T)
    return dq, dk, dv, dbeta, dalpha, ds0.astype(s0.dtype), deta


gdr_pallas_ew_bh.defvjp(_fwd, _bwd)
