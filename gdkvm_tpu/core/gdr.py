"""Gated Delta Rule (GDR) memory recurrence — the numerical core of GDKVM.

GDKVM's spatiotemporal memory is a fixed-size associative state matrix
``S ∈ R^{d_k × d_v}`` (per head) updated frame-to-frame by a gated delta rule
and read by linear attention (LKVA).  The reference describes this as
"defin[ing] frame-to-frame causal relations as the state transition matrix"
and "dynamically managing memory" (reference: README.md:20,
website/src/content/homepage/en.json:20); the recurrence math follows the
Gated DeltaNet lineage (arXiv 2412.06464) re-derived here from scratch.

Semantics (one frame = one chunk of N spatial tokens):

    S̃_t   = α_t · S_{t-1}                       (per-frame forget gate)
    o_t,i = S̃_tᵀ q_t,i                          (LKVA read, all N tokens)
    S_t   = Π_{i=N..1}(I − β_i k_i k_iᵀ) S̃_t    (delta-rule writes, in
            + Σ_i [Π_{j>i}(I − β_j k_j k_jᵀ)] β_i k_i v_iᵀ   raster order)

Reads use the *decayed pre-write* state, so a frame never attends to its own
writes through the memory; intra-frame interactions are KPFF's job
(see ``KPFFBlock`` in gdkvm_tpu/models/decoder.py).

Three interchangeable implementations, parity-tested in
tests/test_gdr.py:

- :func:`gdr_ref` — token-level ``lax.scan``; the executable definition.
- :func:`gdr_chunked` — chunkwise WY/UT-transform closed form (matmul-only,
  MXU-friendly, differentiable); sequential ``lax.scan`` over frames.
- :func:`gdr_assoc` — same WY form, but the frame recurrence runs as a
  log-depth ``jax.lax.associative_scan`` over affine state transitions
  (differentiable; removes the T-step serialization entirely).
- ``gdkvm_tpu.ops.gdr_pallas`` — Pallas TPU kernel with S resident in VMEM
  across the whole scan; used by streaming inference.

All math is fp32 internally regardless of input dtype; the state is always
fp32.

Shape conventions (single head; public wrappers vmap over batch & heads):

    q, k : (T, N, d_k)   v : (T, N, d_v)   beta : (T, N)   alpha : (T,)
    s0   : (d_k, d_v)    →  o : (T, N, d_v), s_T : (d_k, d_v)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# The GDR state math is precision-sensitive (rank-1 cancellations in the
# delta rule): force true-fp32 MXU passes instead of TPU's default bf16
# matmul truncation.  These matrices are small (≤128×128 per head), so the
# 3-6 MXU passes of HIGHEST are cheap next to the encoder convs.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def delta_write_ref(s: jax.Array, k: jax.Array, v: jax.Array,
                    beta: jax.Array,
                    eta: jax.Array | None = None) -> jax.Array:
    """One delta-rule write: ``S ← (I − η k kᵀ) S + β k vᵀ``.

    η is the ERASE strength and β the WRITE strength.  The classic gated
    delta rule couples them (η = β, the default); the decoupled "GDN-2"
    variant (lineage: Gated DeltaNet-2, arXiv 2605.22791 — erase/write
    decoupling in linear attention, re-derived here) learns them
    separately so the memory can overwrite without erasing or erase
    without writing.

    Args:
      s: (d_k, d_v) state.  k: (d_k,).  v: (d_v,).  beta, eta: scalars in
      (0,1); eta=None couples η=β.
    """
    s = s.astype(jnp.float32)
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    eta = beta if eta is None else eta.astype(jnp.float32)
    # (I − η k kᵀ) S + β k vᵀ  ==  S + k (β v − η Sᵀk)ᵀ  (rank-1, fused)
    return s + jnp.outer(k, beta * v - eta * _mm(s.T, k))


def gdr_frame_ref(s: jax.Array, q: jax.Array, k: jax.Array, v: jax.Array,
                  beta: jax.Array, alpha: jax.Array,
                  eta: jax.Array | None = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """One frame of the GDR recurrence, token-level sequential (reference).

    Args:
      s: (d_k, d_v).  q,k: (N, d_k).  v: (N, d_v).  beta: (N,).  alpha:
      scalar.  eta: (N,) erase gates; None couples η=β (classic rule).
    Returns:
      (s_new, o) with o: (N, d_v).
    """
    s = alpha.astype(jnp.float32) * s.astype(jnp.float32)
    o = _mm(q.astype(jnp.float32), s)
    eta = beta if eta is None else eta

    def write(s, tok):
        k_i, v_i, b_i, e_i = tok
        return delta_write_ref(s, k_i, v_i, b_i, e_i), None

    s, _ = jax.lax.scan(write, s, (k, v, beta, eta))
    return s, o


def gdr_ref(q: jax.Array, k: jax.Array, v: jax.Array, beta: jax.Array,
            alpha: jax.Array, s0: jax.Array,
            eta: jax.Array | None = None
            ) -> Tuple[jax.Array, jax.Array]:
    """Token-level scan reference for the full sequence. Ground truth.

    Shapes: see module docstring.  Returns (o (T,N,d_v) fp32, s_T fp32).
    """
    eta = beta if eta is None else eta

    def frame(s, xs):
        q_t, k_t, v_t, b_t, a_t, e_t = xs
        s, o_t = gdr_frame_ref(s, q_t, k_t, v_t, b_t, a_t, e_t)
        return s, o_t

    s_t, o = jax.lax.scan(frame, s0.astype(jnp.float32),
                          (q, k, v, beta, alpha, eta))
    return o, s_t


def _wy_transform(k: jax.Array, v: jax.Array, beta: jax.Array,
                  eta: jax.Array | None = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """Chunk WY form: U, W such that applying N delta-rule writes equals
    ``S ← S + Kᵀ (U − W S)``.

    Derivation (verified against gdr_ref in tests/test_gdr.py): per token
    the update row is ``r_i = β_i v_i − η_i S_{i-1}ᵀ k_i`` and
    ``S_N = S_0 + Kᵀ R``; expanding the recurrence gives
    ``(I + A) R = diag(β) V − diag(η) K S_0`` with
    ``A = strict_tril(diag(η) K Kᵀ)``, so with ``T = (I + A)^{-1}``:
    ``U = T diag(β) V`` and ``W = T diag(η) K``.  η = β (default)
    recovers the classic coupled gated delta rule; separate η is the
    decoupled erase/write variant (arXiv 2605.22791 lineage).

    Args:
      k: (N, d_k).  v: (N, d_v).  beta, eta: (N,).
    Returns:
      U: (N, d_v), W: (N, d_k)  (both fp32).
    """
    n = k.shape[0]
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    eta = beta if eta is None else eta.astype(jnp.float32)

    ke = k * eta[:, None]                        # diag(η) K
    a = jnp.tril(_mm(ke, k.T), k=-1)                 # strict lower
    rhs = jnp.concatenate([v * beta[:, None], ke], axis=1)
    uw = _solve_unit_lower(a, rhs)
    return uw[:, : v.shape[1]], uw[:, v.shape[1]:]


# Diagonal-block size for the blocked substitution.  Within a block the
# inverse is an exact nilpotent series; its intermediate growth is bounded
# by C(15,7)·max|A|^k ≈ 6e3 — safe in fp32.  A full-size series is NOT: at
# N=256 with correlated keys it overflows (measured err 3e17/NaN), which is
# why the solve is blocked.
_BLOCK = 16


def _pad_to_block(a: jax.Array, rhs: jax.Array):
    """Pad (N,N)/(N,M) to the _BLOCK multiple (zero rows/cols are exact
    no-ops for both the forward and transposed substitutions)."""
    n = a.shape[0]
    bs = min(_BLOCK, n)
    if n % bs:
        pad = bs - n % bs
        a = jnp.pad(a, ((0, pad), (0, pad)))
        rhs = jnp.pad(rhs, ((0, pad), (0, 0)))
    return a, rhs, bs


def _inv_diag_block(a_ii: jax.Array, bs: int) -> jax.Array:
    """(I + a_ii)^{-1} for a strictly-lower bs×bs block: exact nilpotent
    series by doubling (growth-bounded at bs ≤ 16 — see _BLOCK note).
    Shared by the forward and transposed blocked substitutions so a
    numerics change can never make them diverge.  Batched over leading
    dims (``_mm`` = jnp.matmul broadcasts) — inverting ALL diagonal
    blocks in one series issues nb-wide batched 16×16 matmuls instead of
    nb separate tiny ones."""
    b_pow = -a_ii
    p = jnp.eye(bs, dtype=jnp.float32) + b_pow
    for _ in range(max(int(bs - 1).bit_length() - 1, 0)):
        b_pow = _mm(b_pow, b_pow)
        p = p + _mm(b_pow, p)
    return p


def _diag_block_invs(a: jax.Array, bs: int) -> jax.Array:
    """All nb strictly-lower diagonal blocks of a (padded N,N), inverted
    in ONE batched nilpotent series → (nb, bs, bs)."""
    nb = a.shape[0] // bs
    # Static slices + stack (an iota-gather form of this crashed the
    # XLA algebraic simplifier under vmap on the remote TPU compiler).
    diags = jnp.stack([a[i * bs:(i + 1) * bs, i * bs:(i + 1) * bs]
                       for i in range(nb)])                # (nb, bs, bs)
    tril = jnp.tril(jnp.ones((bs, bs), jnp.float32), k=-1)
    return _inv_diag_block(diags * tril, bs)


def _solve_unit_lower(a: jax.Array, rhs: jax.Array,
                      inv: jax.Array | None = None) -> jax.Array:
    """X = (I + A)^{-1} RHS for strictly-lower-triangular A (fp32).

    Blocked forward substitution, DIVIDE & CONQUER: all ≤16×16 diagonal
    blocks inverted in ONE batched nilpotent series (numerically safe —
    a whole-matrix series overflows at N≥256, see _BLOCK), then the
    system splits recursively: solve the top half, eliminate its
    contribution with one big rectangular matmul, solve the bottom half.
    Each RHS element is touched log₂(N/16) times and the elimination
    matmuls are up to (N/2 × N/2) — full-MXU work — versus the r2
    left-looking loop whose per-step concatenation of all solved blocks
    re-copied ~N²/2·M floats per call (measured: the batched transposed
    solve was 2.46 ms of the 256²-recipe stored backward, ~75% of it
    this traffic; the D&C form is ~4× faster — BASELINE.md r3.4).
    No triangular_solve HLO (it compiles poorly on TPU).
    Shapes: a (N,N), rhs (N,M).
    """
    n = a.shape[0]
    a, rhs, bs = _pad_to_block(a, rhs)
    nb = a.shape[0] // bs
    if inv is None:
        inv = _diag_block_invs(a, bs)

    def rec(lo: int, hi: int, r: jax.Array) -> jax.Array:
        if hi - lo == 1:
            return _mm(inv[lo], r)
        mid = (lo + hi) // 2
        x_top = rec(lo, mid, r[: (mid - lo) * bs])
        a_bt = a[mid * bs:hi * bs, lo * bs:mid * bs]
        x_bot = rec(mid, hi, r[(mid - lo) * bs:] - _mm(a_bt, x_top))
        return jnp.concatenate([x_top, x_bot], axis=0)

    return rec(0, nb, rhs)[:n]


def _solve_unit_lower_t(a: jax.Array, rhs: jax.Array,
                        inv: jax.Array | None = None) -> jax.Array:
    """Y = (I + A)^{-T} RHS for strictly-lower-triangular A (fp32).

    The TRANSPOSED system (unit upper triangular), solved bottom-up —
    the adjoint of :func:`_solve_unit_lower`, used by the stored-solve
    backward of the Pallas GDR path (ops/gdr_pallas.py::_bwd_stored).
    Same divide & conquer structure (solve the bottom half first, one
    rectangular transposed elimination, then the top half).
    Shapes: a (N,N), rhs (N,M).
    """
    n = a.shape[0]
    a, rhs, bs = _pad_to_block(a, rhs)
    nb = a.shape[0] // bs
    if inv is None:
        inv = _diag_block_invs(a, bs)

    def rec(lo: int, hi: int, r: jax.Array) -> jax.Array:
        if hi - lo == 1:
            return _mm(inv[lo].T, r)
        mid = (lo + hi) // 2
        y_bot = rec(mid, hi, r[(mid - lo) * bs:])
        a_bt = a[mid * bs:hi * bs, lo * bs:mid * bs]      # A[bot, top]
        y_top = rec(lo, mid, r[: (mid - lo) * bs] - _mm(a_bt.T, y_bot))
        return jnp.concatenate([y_top, y_bot], axis=0)

    return rec(0, nb, rhs)[:n]


def gdr_frame_chunked(s: jax.Array, q: jax.Array, k: jax.Array, v: jax.Array,
                      beta: jax.Array, alpha: jax.Array,
                      eta: jax.Array | None = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """One frame via the chunk closed form (matmuls only).

    Same contract as :func:`gdr_frame_ref`.
    """
    s = alpha.astype(jnp.float32) * s.astype(jnp.float32)
    q = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    o = _mm(q, s)
    u, w = _wy_transform(k, v, beta, eta)
    s = s + _mm(k32.T, u - _mm(w, s))
    return s, o


def gdr_chunked(q: jax.Array, k: jax.Array, v: jax.Array, beta: jax.Array,
                alpha: jax.Array, s0: jax.Array,
                eta: jax.Array | None = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Chunkwise-parallel GDR over a sequence.  Differentiable; the
    training path.

    The WY transform of a frame does NOT depend on the carried state, so
    all T frames' triangular solves run in PARALLEL (one batched vmap —
    large MXU-efficient matmuls), and the sequential scan body shrinks to
    three matmuls per frame (decay, read, rank-N write).  Measured on the
    256² recipe: with the solve inside the scan the two GDR while-loops
    cost 11.7 ms of a 33 ms train step (device trace); hoisting it out
    removes that serialization (the scan transpose also only spans the
    tiny body — the solve's backward is batched too).

    Shapes: see module docstring.  Returns (o (T,N,d_v) fp32, s_T fp32).
    """
    # All frames' WY solves at once: (T,N,dv), (T,N,dk).
    u, w = jax.vmap(_wy_transform)(k, v, beta,
                                   beta if eta is None else eta)

    def frame(s, xs):
        q_t, k_t, u_t, w_t, a_t = xs
        s = a_t.astype(jnp.float32) * s
        o_t = _mm(q_t.astype(jnp.float32), s)
        s = s + _mm(k_t.astype(jnp.float32).T, u_t - _mm(w_t, s))
        return s, o_t

    s_t, o = jax.lax.scan(frame, s0.astype(jnp.float32),
                          (q, k, u, w, alpha))
    return o, s_t


def gdr_assoc(q: jax.Array, k: jax.Array, v: jax.Array, beta: jax.Array,
              alpha: jax.Array, s0: jax.Array,
              eta: jax.Array | None = None
              ) -> Tuple[jax.Array, jax.Array]:
    """Parallel-scan GDR: the frame recurrence as an associative scan.

    The chunked form's remaining serialization is its ``lax.scan`` over T
    frames — T sequential steps of tiny matmuls that leave the MXU idle
    (measured: the memory path burned 60-70% of forward time for ~5% of
    the FLOPs, BASELINE.md per-module table).  But with the WY outputs
    (U_t, W_t) in hand, each frame's state transition is AFFINE:

        S_t = α_t S_{t-1} + K_tᵀ(U_t − W_t α_t S_{t-1}) = M_t S_{t-1} + b_t
        M_t = α_t (I − K_tᵀ W_t)   (d_k×d_k)      b_t = K_tᵀ U_t

    Affine maps compose associatively ((M₂M₁, M₂b₁ + b₂)), so ALL prefix
    states come out of one ``jax.lax.associative_scan`` — log₂(T) levels
    of batched d_k×d_k matmuls instead of T sequential steps, fully
    MXU-batched across (B, H, T).  Differentiable (the scan is built from
    lax primitives; its transpose is also log-depth).  Costs ~2× the scan
    body's FLOPs in exchange for ~T/log T less serialization.

    Numerics: every M_t is a contraction (α_t ≤ 1; I − K_tᵀW_t is the
    product of delta-rule erasures with β ≤ 1, all singular values ≤ 1),
    so prefix products stay bounded at any T.  fp32 HIGHEST throughout,
    like the other forms.  Parity vs gdr_ref tested in tests/test_gdr.py.

    Shapes: see module docstring.  Returns (o (T,N,d_v) fp32, s_T fp32).
    """
    u, w = jax.vmap(_wy_transform)(k, v, beta,
                                   beta if eta is None else eta)
    dk = k.shape[-1]
    k32 = k.astype(jnp.float32)
    a32 = alpha.astype(jnp.float32)
    eye = jnp.eye(dk, dtype=jnp.float32)
    kt_w = jnp.einsum("tni,tnj->tij", k32, w,
                      precision=jax.lax.Precision.HIGHEST)
    m = a32[:, None, None] * (eye - kt_w)              # (T, dk, dk)
    bv = jnp.einsum("tni,tnj->tij", k32, u,
                    precision=jax.lax.Precision.HIGHEST)  # (T, dk, dv)

    def combine(f, g):
        """Compose affine maps: g AFTER f (f is the earlier prefix)."""
        mf, bf = f
        mg, bg = g
        return _mm(mg, mf), _mm(mg, bf) + bg

    pm, pb = jax.lax.associative_scan(combine, (m, bv))
    s_all = _mm(pm, s0.astype(jnp.float32)) + pb       # S_t for all t
    s_prev = jnp.concatenate([s0.astype(jnp.float32)[None], s_all[:-1]],
                             axis=0)
    o = _mm(q.astype(jnp.float32), a32[:, None, None] * s_prev)
    return o, s_all[-1]


def gdr_write_chunk(s: jax.Array, k: jax.Array, v: jax.Array,
                    beta: jax.Array) -> jax.Array:
    """Write-only chunk update (no decay, no read): N delta-rule writes.

    ``S ← S + Kᵀ (U − W S)``.  Used for mask-prompt writes into the initial
    memory state (see gdkvm_tpu/models/lkva.py) and as the write half of
    :func:`gdr_frame_chunked`.

    Args:
      s: (d_k, d_v).  k: (N, d_k).  v: (N, d_v).  beta: (N,).
    """
    s = s.astype(jnp.float32)
    u, w = _wy_transform(k, v, beta)
    return s + _mm(k.astype(jnp.float32).T, u - _mm(w, s))


# ---------------------------------------------------------------------------
# Batched / multi-head wrappers.
# ---------------------------------------------------------------------------

def _bh_wrap(fn):
    """Lift a single-head gdr fn to (B, H, T, N, d) / (B,H,T,N) / (B,H,T) /
    (B, H, d_k, d_v) shapes via nested vmap."""
    head = jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0))     # heads
    batch = jax.vmap(head, in_axes=(0, 0, 0, 0, 0, 0))  # batch
    @functools.wraps(fn)
    def wrapped(q, k, v, beta, alpha, s0):
        return batch(q, k, v, beta, alpha, s0)
    return wrapped


gdr_ref_bh = _bh_wrap(gdr_ref)
gdr_chunked_bh = _bh_wrap(gdr_chunked)
gdr_assoc_bh = _bh_wrap(gdr_assoc)


def _bh_wrap_ew(fn):
    """7-arg (…, eta) variant of _bh_wrap for the decoupled erase gate."""
    head = jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, 0))
    batch = jax.vmap(head, in_axes=(0, 0, 0, 0, 0, 0, 0))
    @functools.wraps(fn)
    def wrapped(q, k, v, beta, alpha, s0, eta):
        return batch(q, k, v, beta, alpha, s0, eta)
    return wrapped


# Decoupled erase/write (GDN-2 lineage): eta (B,H,T,N) as an explicit arg.
gdr_ref_ew_bh = _bh_wrap_ew(gdr_ref)
gdr_chunked_ew_bh = _bh_wrap_ew(gdr_chunked)
gdr_assoc_ew_bh = _bh_wrap_ew(gdr_assoc)

# (B,H,·) wrapper for write-only prompt updates.
gdr_write_chunk_bh = jax.vmap(jax.vmap(gdr_write_chunk))


def init_state(batch: int, heads: int, d_k: int, d_v: int) -> jax.Array:
    """Zero-initialized memory state (B, H, d_k, d_v) fp32."""
    return jnp.zeros((batch, heads, d_k, d_v), dtype=jnp.float32)
