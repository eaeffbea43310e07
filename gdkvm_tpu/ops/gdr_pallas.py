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

**Measured outcome (v5e): there are THREE backward modes and the
``stored`` one is the DEFAULT** (see ``_bwd_mode`` below for the full
comparison).  The key structural fact all three respect: the backward's
heavy per-frame work (solve or its adjoint, dq/dk/dv matmuls) is
INDEPENDENT across frames once the dS carries are known, so it belongs
batched in XLA — a single sequential kernel ("fused" mode) serializes
everything behind the carry and loses; the fused kernel is kept
parity-tested for the record and for future megacore-style hardware
where grid steps overlap.

**For TRAINING the story is shape-dependent (r2.5, floor-corrected).**
XLA's chunked AD stores the forward's solves, which beats the
recompute-vjp — but the ``stored`` backward mode (default) has the
kernel stream its solves and state checkpoints to HBM and applies the
hand-derived adjoint in XLA, batched over all frames: at the CAMUS 256²
shape it is **1.78× faster than pure-XLA chunked AD and 170× closer to
the scan-reference gradient** (XLA's AD *through* the blocked
substitution loses ~3 digits at N=256 with correlated keys; the
explicit (I+A)^{-T} solve does not).  At EchoNet scale (N=49) the two
tie, so training traces resolve 'auto' by token count
(models.gdkvm.train_model_config).  Inference traces keep this kernel
everywhere (1.7-3.7×, BASELINE.md).

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

# MXU pass count vs accuracy: the delta rule's rank-1 cancellations lose
# ~1e-2 relative accuracy under the DEFAULT bf16 matmul truncation
# (measured on v5e), so single-pass bf16 is never used.  "highest" is true
# fp32 (6 MXU passes).  "high" is a hand-rolled bf16x3 decomposition —
# split each fp32 operand into hi/lo bf16 halves and issue the 3
# significant cross products as single-pass bf16 dots (Mosaic rejects
# jax.lax.Precision.HIGH inside kernels, so the split is explicit).  That
# halves the MXU passes (measured 1.10-1.25× kernel speedup, same-window
# v5e A/B); end-to-end drift vs the fp32 scan ground truth is 2.3e-5 to
# 4.3e-5 at T=10-128 (BASELINE.md; "highest" is bit-exact vs the XLA
# chunked form on-chip) — far below anything an argmax'd mask can see, so
# "high" is the default for this inference-path kernel.  GDKVM_GDR_PRECISION=highest restores exact-parity mode (read
# once at import; baked into each trace like GDKVM_GDR_BWD).  CPU
# interpret mode always uses native fp32 dots, so CPU parity tests are
# mode-independent.
_PRECISION_MODE = os.environ.get("GDKVM_GDR_PRECISION", "high")
if _PRECISION_MODE not in ("high", "highest"):
    raise ValueError(f"GDKVM_GDR_PRECISION must be high|highest, "
                     f"got {_PRECISION_MODE!r}")

# ── Scoped-VMEM budget for the batch-grouping heuristics ─────────────
# _batch_group/_chain_batch_group budget a NAIVE operand estimate; Mosaic's
# scoped stack measures ~4× it (double-buffered blocks + live solve
# temporaries), so budget E ⇒ ≈4E real footprint.  Mosaic's default scoped
# limit is 16 MB, which pins the safe default budget at 3.5 MB — but a v5e
# core has 128 MB physical VMEM, so larger groups are reachable by raising
# ``vmem_limit_bytes`` (pltpu.CompilerParams).
#
# Same-window v5e A/B (3.5 vs 14 MB, H=4 d=64, chained-scan floor-corrected):
#   forward  N=256: B8 1.081→0.940 ms (1.15×), B4 0.821→0.759 (1.08×)
#   forward  N=49:  B8 G4→G8 0.704→0.740 (-5%), B16 G4→G16 1.742→1.569 (+11%)
#   forward  B=1 (G stuck at 1): 1.562→1.751 ms — raising the Mosaic limit
#            WITHOUT a bigger group costs 12% by itself
#   training (save_uw, stored-solve fwd): neutral-to-worse (N=256 B8
#            5.118→5.477 ms; N=49 within ±3%)
# ⇒ the raise pays exactly when the 3.5 MB budget starves the group below
# 4 streams AND the batch has room to grow — i.e. inference at large N
# (256²-res serving).  _group_plan encodes that gate; GDKVM_GDR_VMEM_MB
# (a float, read once at import and baked per trace) force-overrides the
# budget for experiments.
_DEF_BUDGET = 3.5e6
_HI_BUDGET = 14e6
# "autotune": replace the shape-gated heuristic with a FIRST-TRACE
# micro-autotune — time the real kernel at every feasible group size once
# per shape and cache the winner (see _autotune_group below).  Applies
# only where the heuristic would consider raising (inference traces);
# save_uw (training) traces always keep the default budget, so the
# documented byte-identical-training claim is autotune-independent.
_VMEM_ENV = os.environ.get("GDKVM_GDR_VMEM_MB", "auto")
_AUTOTUNE = _VMEM_ENV == "autotune"
if _VMEM_ENV in ("auto", "autotune"):
    _VMEM_OVERRIDE = None
else:
    try:
        _VMEM_OVERRIDE = float(_VMEM_ENV) * 1e6
    except ValueError:
        raise ValueError(f"GDKVM_GDR_VMEM_MB must be a float, 'auto' or "
                         f"'autotune', got {_VMEM_ENV!r}") from None


def _fit_group(b: int, per_stream: float, budget: float) -> int:
    """Largest divisor of b whose per-stream estimate fits the budget."""
    g = max(1, min(b, int(budget // per_stream)))
    while b % g:
        g -= 1
    return g


def _raised_params(budget: float):
    """Mosaic params for a raised budget; None keeps defaults (and keeps
    CPU interpret mode free of TPU-only parameters)."""
    if budget <= _DEF_BUDGET or jax.default_backend() == "cpu":
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(min(budget * 4.8, 127e6)))


def _group_plan(b: int, per_stream: float, allow_raise: bool):
    """(G, compiler_params) under the shape-gated VMEM policy above."""
    if _VMEM_OVERRIDE is not None:
        return (_fit_group(b, per_stream, _VMEM_OVERRIDE),
                _raised_params(_VMEM_OVERRIDE))
    g_lo = _fit_group(b, per_stream, _DEF_BUDGET)
    if not allow_raise or g_lo >= 4:
        return g_lo, None
    g_hi = _fit_group(b, per_stream, _HI_BUDGET)
    # Cap the raised group at 4 (largest divisor of b ≤ 4): G=4 is the
    # A/B'd sweet spot at N=256, and the one forced-G=8 measurement lost
    # 8-14% — never let an intermediate shape self-select past it.
    while g_hi > 4 or b % g_hi:
        g_hi -= 1
    if g_hi > g_lo:
        return g_hi, _raised_params(_HI_BUDGET)
    return g_lo, None


# ── First-trace micro-autotune (GDKVM_GDR_VMEM_MB=autotune) ──────────
# The 4×-fudge calibration above is v5e-measured at H=4 d=64 shapes; an
# unseen config (H=8, d=128) could pick a G that compiles but thrashes
# (VERDICT r2 item 9).  With autotune on, the first inference trace of a
# new (kernel, B, H, N, dk, dv) shape times the REAL kernel at every
# feasible group size (chained-scan, candidates share the same dispatch
# floor so ranking is floor-free; compile failures = infeasible) and
# caches the measured winner — in-process and in a JSON sidecar next to
# the persistent jit cache, so the probe cost (~1 compile per candidate)
# is paid once per machine, not per process.
_AUTOTUNE_PATH = os.path.join(os.path.expanduser("~"), ".cache",
                              "gdkvm_tpu", "gdr_autotune.json")
_autotune_mem: dict = {}


def _autotune_load() -> dict:
    try:
        import json
        with open(_AUTOTUNE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _autotune_save(cache: dict) -> None:
    try:
        import json
        os.makedirs(os.path.dirname(_AUTOTUNE_PATH), exist_ok=True)
        tmp = _AUTOTUNE_PATH + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        os.replace(tmp, _AUTOTUNE_PATH)
    except Exception:
        pass  # persistence is an optimization, never a failure mode


def _time_chained(fn, args, reps: int = 30) -> float:
    """ms/call via a chained scan (input of rep i+1 depends on rep i's
    output so nothing hoists; one dispatch+fetch round trip total).
    Raises on compile failure — the caller treats that as infeasible."""
    import time as _time

    def body(c, _):
        out = fn(*jax.tree.map(
            lambda a: (a + c.astype(a.dtype)
                       if jnp.issubdtype(a.dtype, jnp.floating) else a),
            args))
        s = sum(x.astype(_F32).sum() for x in jax.tree.leaves(out))
        return jnp.asarray(s) * 1e-20, s

    run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                       length=reps)[0])
    import numpy as _np
    _np.asarray(run())                 # compile + first run
    t0 = _time.perf_counter()
    _np.asarray(run())
    return (_time.perf_counter() - t0) / reps * 1e3


def _autotune_probe(kind: str, b: int, h: int, n: int, dk: int, dv: int,
                    g: int, params) -> float:
    """Time the real kernel entry at group size g (T=8 probe frames)."""
    t = 8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    shp = lambda d: (b, h, t, n, d)
    q = jax.random.normal(ks[0], shp(dk), jnp.bfloat16) / (dk ** 0.5)
    k = jax.random.normal(ks[1], shp(dk), jnp.bfloat16) / (dk ** 0.5)
    beta = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h, t, n), _F32))
    eta = jax.nn.sigmoid(jax.random.normal(ks[4], (b, h, t, n), _F32))
    alpha = 0.9 + 0.1 * jax.nn.sigmoid(
        jax.random.normal(ks[5], (b, h, t), _F32))
    s0 = jnp.zeros((b, h, dk, dv), _F32)

    if kind == "chain":
        u = jax.random.normal(ks[6], shp(dv), _F32)
        w = jax.random.normal(ks[7], shp(dk), _F32)

        def call(q, k, u, w, alpha, s0):
            outs = _gdr_chain_flat(
                _group(q, g), _group(k, g), _group(u, g), _group(w, g),
                _group(alpha, g), _group(s0, g), False, False, params)
            return outs[0]

        return _time_chained(call, (q, k, u, w, alpha, s0))

    v = jax.random.normal(ks[2], shp(dv), jnp.bfloat16)

    def call(q, k, v, beta, eta, alpha, s0):
        qf, kf, vbf, kef, af = _flat_inputs_premul(q, k, v, beta, eta,
                                                   alpha)
        outs = _gdr_pallas_flat(
            _group(qf, g), _group(kf, g), _group(vbf, g), _group(kef, g),
            _group(af, g), _group(s0, g), False, False, False, params)
        return outs[0]

    return _time_chained(call, (q, k, v, beta, eta, alpha, s0))


def _autotune_group(kind: str, b: int, h: int, n: int, dk: int, dv: int,
                    per_stream: float):
    """Measured-optimal (G, compiler_params) for an inference trace."""
    key = f"{kind}:b{b}:h{h}:n{n}:dk{dk}:dv{dv}:{jax.default_backend()}"
    hit = _autotune_mem.get(key)
    if hit is None:
        disk = _autotune_load()
        hit = disk.get(key)
    if hit is not None:
        _autotune_mem[key] = hit
        g = int(hit["g"])
        return g, _raised_params(per_stream * g)

    candidates = [g for g in range(1, b + 1)
                  if b % g == 0 and 4.0 * per_stream * g <= 110e6]
    timings: dict = {}
    for g in candidates:
        params = _raised_params(per_stream * g)
        try:
            timings[str(g)] = round(
                _autotune_probe(kind, b, h, n, dk, dv, g, params), 4)
        except Exception:
            timings[str(g)] = None      # did not compile ⇒ infeasible
    feasible = {int(g): ms for g, ms in timings.items() if ms is not None}
    if not feasible:  # every candidate failed — fall back to the heuristic
        return _group_plan(b, per_stream, allow_raise=True)
    g_best = min(feasible, key=feasible.get)
    entry = {"g": g_best, "ms_per_call": timings}
    _autotune_mem[key] = entry
    disk = _autotune_load()
    disk[key] = entry
    _autotune_save(disk)
    return g_best, _raised_params(per_stream * g_best)


def _fast_dots() -> bool:
    """bf16x3 mode — trace-time decision; CPU always exact fp32."""
    return _PRECISION_MODE == "high" and jax.default_backend() != "cpu"


def _split_bf16(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(_F32)).astype(jnp.bfloat16)
    return hi, lo


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bdot(x: jax.Array, y: jax.Array) -> jax.Array:
    """Head-batched matmul: (H,M,K) @ (H,K,N) → (H,M,N), fp32 accumulate.

    In bf16x3 mode: x ≈ x_hi + x_lo (bf16 halves, 16 mantissa bits), and
    x·y ≈ x_hi·y_hi + x_hi·y_lo + x_lo·y_hi — three single-pass bf16 MXU
    products with fp32 accumulation; the dropped x_lo·y_lo term is
    ≤2⁻¹⁶-relative.  Otherwise: one true-fp32 HIGHEST dot (6 passes)."""
    dn = (((2,), (1,)), ((0,), (0,)))
    if not _fast_dots():
        return jax.lax.dot_general(x, y, dimension_numbers=dn,
                                   preferred_element_type=_F32,
                                   precision=jax.lax.Precision.HIGHEST)
    xh, xl = _split_bf16(x)
    yh, yl = _split_bf16(y)
    bdot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                             preferred_element_type=_F32,
                             precision=jax.lax.Precision.DEFAULT)
    return bdot(xh, yh) + (bdot(xh, yl) + bdot(xl, yh))


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


def _inv_diags(a: jax.Array, bs: int) -> jax.Array:
    """(I + A_ii)^{-1} for ALL nb diagonal blocks of strictly-lower A
    (H,N,N) in ONE batched series chain: the blocks are independent, so
    stacking them turns nb × ~7 tiny (H,bs,bs) matmuls into ~7 matmuls of
    batch nb·H — far fewer MXU issue slots per grid step (the kernel is
    instruction-issue-bound at small N).  Returns (nb, H, bs, bs)."""
    h, n = a.shape[0], a.shape[-1]
    nb = n // bs
    diags = jnp.stack([a[:, i * bs:(i + 1) * bs, i * bs:(i + 1) * bs]
                       for i in range(nb)])          # (nb, H, bs, bs)
    inv = _inv_diag_fn(bs)(diags.reshape(nb * h, bs, bs))
    return inv.reshape(nb, h, bs, bs)


def _solve_lower(a: jax.Array, rhs: jax.Array,
                 invs: jax.Array | None = None) -> jax.Array:
    """X = (I + A)^{-1} RHS for strictly-lower A (H,N,N) by blocked forward
    substitution: exact nilpotent-series inverses on ≤16×16 diagonal blocks
    (fp32-safe at any N — a whole-matrix series overflows at N=256 with
    correlated keys), matmul elimination below.  Mirrors
    core.gdr._solve_unit_lower; all ops MXU, no dynamic slices.
    ``invs``: precomputed diagonal-block inverses (callers that also
    stream them out as residuals pass them in)."""
    n = a.shape[-1]
    bs = min(16, n)                         # n is padded to a multiple of bs
    if invs is None:
        invs = _inv_diags(a, bs)
    blocks = []
    for i in range(n // bs):
        r_i = rhs[:, i * bs:(i + 1) * bs]
        if i:
            x_prev = jnp.concatenate(blocks, axis=1)
            r_i = r_i - _bdot(a[:, i * bs:(i + 1) * bs, : i * bs], x_prev)
        blocks.append(_bdot(invs[i], r_i))
    return jnp.concatenate(blocks, axis=1)


def _solve_lower_t(a: jax.Array, rhs: jax.Array) -> jax.Array:
    """Y = (I + A)^{-T} RHS — the transposed system (unit UPPER triangular),
    by blocked BACKWARD substitution from the last block row.  This is the
    adjoint of :func:`_solve_lower` used by the backward kernel."""
    n = a.shape[-1]
    bs = min(16, n)
    invs = _inv_diags(a, bs)
    nb = n // bs
    blocks = []                             # stored last-block-first
    for j in range(nb - 1, -1, -1):
        r_j = rhs[:, j * bs:(j + 1) * bs]
        if blocks:
            y_below = jnp.concatenate(blocks[::-1], axis=1)  # rows > block j
            a_below = a[:, (j + 1) * bs:, j * bs:(j + 1) * bs]
            r_j = r_j - _bdot(a_below.transpose(0, 2, 1), y_below)
        blocks.append(_bdot(invs[j].transpose(0, 2, 1), r_j))
    return jnp.concatenate(blocks[::-1], axis=1)


def _frame_math(s_dec: jax.Array, q: jax.Array, k: jax.Array, vb: jax.Array,
                ke: jax.Array) -> Tuple[jax.Array, jax.Array,
                                        jax.Array, jax.Array]:
    """One frame's read+write on VALUES (not refs) — forward kernel body.

    Decoupled gates (GDN-2 lineage, core/gdr.py derivation): β is the
    WRITE strength, η the ERASE strength; η ≡ β recovers the classic
    coupled rule (the public coupled API passes beta for both, and AD
    sums the two cotangents).

    The gates arrive PREMULTIPLIED: vb = β⊙V, ke = η⊙K (diag(η) K),
    computed outside the kernel where XLA fuses them for free.  This
    keeps every kernel operand a well-tiled (..., N, d) tensor — the
    earlier (..., N, 1) β/η operands tiled to 128 lanes (128× padded
    DMA per block) and forced XLA relayout copies at the call boundary.

    Args (all fp32): s_dec (H,dk,dv) decayed state S̃; q,k,ke (H,N,dk);
    vb (H,N,dv).  Returns (s_new (H,dk,dv), o (H,N,dv), u (H,N,dv),
    w (H,N,dk), invs (nb,H,bs,bs)) — u/w are the frame's WY solve and
    invs its diagonal-block inverses, optionally streamed out as the
    stored-solve backward's residuals (recomputing the inverses in XLA
    cost ~1.06 ms of the 256²-recipe backward — BASELINE.md r3.4).
    """
    # LKVA read against the decayed pre-write state.
    o = _bdot(q, s_dec)

    # WY transform per head: A = strict_tril(diag(η) K Kᵀ).
    a = _tril_mask(_bdot(ke, k.transpose(0, 2, 1)))
    bs = min(16, a.shape[-1])
    invs = _inv_diags(a, bs)
    rhs = jnp.concatenate([vb, ke], axis=2)              # (H, N, dv+dk)
    uw = _solve_lower(a, rhs, invs)
    u = uw[:, :, : vb.shape[2]]
    w = uw[:, :, vb.shape[2]:]

    # Fused N-token delta-rule write.
    s_new = s_dec + _bdot(k.transpose(0, 2, 1), u - _bdot(w, s_dec))
    return s_new, o, u, w, invs


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


def _gdr_kernel(save_states: bool, save_uw: bool, alpha_ref, q_ref, k_ref,
                vb_ref, ke_ref, s0_ref, *rest):
    """One (b, t) grid step: advance all H heads' states one frame.

    Operands arrive in the model's native (B, H, T, N, d) layout — the
    BlockSpecs slice (1, H, 1, N, d) blocks straight out of it, so NO
    transpose is materialized at the pallas_call boundary (the r1 kernel
    swapped to (B,T,H,...) first, and those copies were exactly why it
    lost to XLA at EchoNet scale — BASELINE.md GDR crossover rows).
    H here may be G·num_heads: independent streams are folded into the
    head-batched block (``_batch_group``) so the sequential grid is only
    (B/G, T) — per-step work ×G, per-step fixed cost amortized.

    alpha_ref is a scalar-prefetch arg: the full (B, H, T) gate table lives
    in SMEM for the whole kernel (PrefetchScalarGridSpec).  The state
    scratch (H, dk, dv) persists in VMEM across the sequential T grid dim.
    With ``save_states`` the pre-decay state S_{t-1} is also streamed out
    per frame (the backward kernel's checkpoints).
    """
    rest = list(rest)
    o_ref, sT_ref = rest[0], rest[1]
    idx = 2
    states_ref = u_ref = w_ref = inv_ref = None
    if save_states:
        states_ref = rest[idx]; idx += 1
    if save_uw:
        u_ref, w_ref, inv_ref = rest[idx:idx + 3]; idx += 3
    s_scr = rest[idx]
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    # New batch element starts: load its initial states.
    @pl.when(t == 0)
    def _():
        s_scr[:] = s0_ref[0].astype(_F32)

    if states_ref is not None:
        states_ref[0, :, 0] = s_scr[:].astype(states_ref.dtype)

    h = q_ref.shape[1]
    q = q_ref[0, :, 0].astype(_F32)         # (H, N, dk)
    k = k_ref[0, :, 0].astype(_F32)         # (H, N, dk)
    vb = vb_ref[0, :, 0].astype(_F32)       # (H, N, dv)  β⊙V
    ke = ke_ref[0, :, 0].astype(_F32)       # (H, N, dk)  η⊙K

    # Decay each head's state in place (scalar × 2D slice — Mosaic-friendly;
    # a (H,) vector → (H,1,1) broadcast is an unsupported shape cast).
    for i in range(h):
        s_scr[i] = alpha_ref[b, i, t].astype(_F32) * s_scr[i]

    s_new, o, u, w, invs = _frame_math(s_scr[:], q, k, vb, ke)
    o_ref[0, :, 0] = o.astype(o_ref.dtype)
    if u_ref is not None:
        u_ref[0, :, 0] = u.astype(u_ref.dtype)   # WY solve, per frame
        w_ref[0, :, 0] = w.astype(w_ref.dtype)
        # Diagonal-block inverses, lane-packed (H, bs, N): column
        # n = i·bs + c holds inv_block_i[:, :, c] — minor dim N keeps
        # the DMA full-lane (a (..., 16)-minor output would tile to 128
        # lanes = 8× padded writes).  Built by lane-axis concatenation:
        # Mosaic rejects the equivalent reshape (merging a major dim
        # into lanes is an unsupported shape cast).
        nb = invs.shape[0]
        inv_ref[0, :, 0] = jnp.concatenate([invs[i] for i in range(nb)],
                                           axis=-1).astype(inv_ref.dtype)
    s_scr[:] = s_new

    @pl.when(t == n_t - 1)
    def _():
        sT_ref[0] = s_new.astype(sT_ref.dtype)


def _gdr_chain_kernel(save_states: bool, alpha_ref, q_ref, k_ref, u_ref,
                      w_ref, s0_ref, *rest):
    """One (b, t) grid step of the CHAIN kernel: state recurrence only.

    The r2.2 hybrid split (measured rationale): a (B, T) sequential grid
    serializes every grid step on the single v5e TensorCore, so work done
    per step should be the *irreducibly sequential* part and nothing else.
    The per-frame WY solve (A = stril(ηK Kᵀ); U,W = (I+A)⁻¹[βV|ηK]) does
    NOT depend on the carried state — it is embarrassingly parallel across
    all B·H·T frames, and XLA computes it as a handful of huge batched
    matmuls at ~50 TFLOP/s.  The monolithic kernel (``_gdr_kernel``)
    re-did that solve inside every sequential step: ~60 tiny MXU issues
    per frame, ~2.5 TFLOP/s.  This kernel consumes the precomputed (U, W)
    and runs only the 3-matmul affine chain per frame:

        S̃ = α_t S ;   O_t = Q_t S̃ ;   S ← S̃ + K_tᵀ (U_t − W_t S̃)

    ~9 MXU issues per step (bf16x3), and the per-stream VMEM footprint
    drops ~4× (no (N,N) A block, no unrolled solve temporaries), so
    ``_chain_batch_group`` folds far more streams per step than the
    monolithic kernel could.  S stays fp32 in VMEM across the whole T
    grid, exactly like the monolithic kernel.
    """
    if save_states:
        o_ref, sT_ref, states_ref, s_scr = rest
    else:
        o_ref, sT_ref, s_scr = rest
        states_ref = None
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        s_scr[:] = s0_ref[0].astype(_F32)

    if states_ref is not None:
        states_ref[0, :, 0] = s_scr[:].astype(states_ref.dtype)

    h = q_ref.shape[1]
    q = q_ref[0, :, 0].astype(_F32)          # (H, N, dk)
    k = k_ref[0, :, 0].astype(_F32)          # (H, N, dk)
    u = u_ref[0, :, 0].astype(_F32)          # (H, N, dv)
    w = w_ref[0, :, 0].astype(_F32)          # (H, N, dk)

    for i in range(h):
        s_scr[i] = alpha_ref[b, i, t].astype(_F32) * s_scr[i]

    s_dec = s_scr[:]
    o = _bdot(q, s_dec)
    s_new = s_dec + _bdot(k.transpose(0, 2, 1), u - _bdot(w, s_dec))
    o_ref[0, :, 0] = o.astype(o_ref.dtype)
    s_scr[:] = s_new

    @pl.when(t == n_t - 1)
    def _():
        sT_ref[0] = s_new.astype(sT_ref.dtype)


def _gdr_chain_flat(q: jax.Array, k: jax.Array, u: jax.Array, w: jax.Array,
                    alpha: jax.Array, s0: jax.Array, interpret: bool,
                    save_states: bool, params=None):
    """Flat (B, H, T, N, d) invocation of the chain kernel (see
    :func:`_gdr_chain_kernel`).  q, k may be bf16; u, w arrive fp32 from
    the XLA-side WY solve (kept fp32 through the DMA — a plain bf16 cast
    would throw away the solve's precision; the kernel's bf16x3 dots keep
    16 mantissa bits instead)."""
    b, h, t, n, dk = q.shape
    dv = u.shape[-1]

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
            blk(dv),                    # u
            blk(dk),                    # w
            pl.BlockSpec((1, h, dk, dv), lambda g, i, *_: (g, 0, 0, 0)),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((h, dk, dv), _F32)],
    )
    return pl.pallas_call(
        functools.partial(_gdr_chain_kernel, save_states),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * t * 3 * n * dk * dv,
            bytes_accessed=b * h * t * n * (2 * dk + 4 * dk + 8 * dv) * 2,
            transcendentals=0,
        ),
    )(alpha, q, k, u, w, s0)


def _chain_batch_group(b: int, h: int, n: int, dk: int, dv: int,
                       save_uw: bool = False):
    """(G, compiler_params) folded per chain-kernel grid step.

    Much lighter than the monolithic kernel's footprint: per stream the
    blocks are q,k,w (N,dk), u,o (N,dv) plus 3 fp32 state temporaries —
    no (N,N) A matrix and no unrolled solve intermediates.  The same
    conservative ~4× Mosaic scoped-stack fudge is absorbed by budgeting
    the raw estimate (see ``_batch_group`` / ``_group_plan``)."""
    per_stream = 4.0 * h * (3 * n * dk + 2 * n * dv + 3 * dk * dv)
    # Training traces (save_uw: the stored backward calls the fwd) stay at
    # the default budget like the monolith path — the raised budget is
    # only A/B-justified for inference, and this keeps every save_uw trace
    # byte-identical across fwd modes (BASELINE.md r2.5 claim).
    if _AUTOTUNE and not save_uw and not _interpret():
        return _autotune_group("chain", b, h, n, dk, dv, per_stream)
    return _group_plan(b, per_stream, allow_raise=not save_uw)


def _wy_uw_bh(k: jax.Array, v: jax.Array, beta: jax.Array, eta: jax.Array
              ) -> Tuple[jax.Array, jax.Array]:
    """All frames' WY solves batched over (B, H, T) in XLA — identical
    math to the chunked training form (core/gdr.py::gdr_chunked hoists
    the same solves out of its scan), fp32 HIGHEST throughout."""
    f = jax.vmap(jax.vmap(jax.vmap(gdr_core._wy_transform)))
    return f(k, v, beta, eta)


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


def _save_dtype():
    """Storage dtype for the stored backward's streamed residuals
    (S_{t-1} checkpoints, WY solves [U|W], packed inverses).

    GDKVM_GDR_SAVE_DTYPE=bf16 halves their HBM traffic in BOTH directions
    (forward write + backward read) — the r4 experiment on the r3.4
    finding that the stored backward sits within 2× of its DMA floor.
    Read at trace time (like GDKVM_GDR_BWD).  Default fp32: the stored
    path's headline accuracy win over chunked AD (r2.5: 170× at N=256)
    rides exact residuals; bf16 residuals trade ~half the 2e-5 margin for
    bandwidth — see BASELINE.md r4 for the measured time/accuracy A/B.
    """
    val = os.environ.get("GDKVM_GDR_SAVE_DTYPE", "f32")
    if val not in ("f32", "bf16"):
        raise ValueError(
            f"GDKVM_GDR_SAVE_DTYPE must be f32|bf16, got {val!r}")
    return jnp.bfloat16 if val == "bf16" else _F32


def _gdr_pallas_flat(q: jax.Array, k: jax.Array, vb: jax.Array,
                     ke: jax.Array, alpha: jax.Array,
                     s0: jax.Array, interpret: bool, save_states: bool,
                     save_uw: bool = False, params=None):
    """Flat (B, H, T, N, d) invocation — the API layout, consumed directly.
    N must be pre-padded (vb=ke=0 on pads ⇒ exact no-op writes); gate
    premultiplies (vb = β⊙V, ke = η⊙K) happen in XLA before the call.

    All H heads advance together per grid step (head-batched matmuls), so
    the sequential grid is only (B, T) — fewer, larger steps.  Each grid
    step DMAs H strided (N, d) slabs per operand; no transposed copies are
    ever materialized.
    """
    b, h, t, n, dk = q.shape
    dv = vb.shape[-1]
    sdt = _save_dtype() if save_uw else _F32

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
        out_shape.append(jax.ShapeDtypeStruct((b, h, t, dk, dv), sdt))
        out_specs.append(
            pl.BlockSpec((1, h, 1, dk, dv), lambda g, i, *_: (g, 0, i, 0, 0)))
    if save_uw:
        bs = min(16, n)
        out_shape += [jax.ShapeDtypeStruct((b, h, t, n, dv), sdt),
                      jax.ShapeDtypeStruct((b, h, t, n, dk), sdt),
                      jax.ShapeDtypeStruct((b, h, t, bs, n), sdt)]
        out_specs += [blk(dv), blk(dk),
                      pl.BlockSpec((1, h, 1, bs, n),
                                   lambda g, i, *_: (g, 0, i, 0, 0))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # alpha table lives in SMEM
        grid=(b, t),
        in_specs=[
            blk(dk),                    # q
            blk(dk),                    # k
            blk(dv),                    # vb = β⊙V
            blk(dk),                    # ke = η⊙K
            pl.BlockSpec((1, h, dk, dv), lambda g, i, *_: (g, 0, 0, 0)),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((h, dk, dv), _F32)],
    )
    return pl.pallas_call(
        functools.partial(_gdr_kernel, save_states, save_uw),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * t * (3 * n * dk * dv + n * n * dk
                                   + n * n * (dk + dv)),
            bytes_accessed=b * h * t * n * (2 * dk + 2 * dv) * 4,
            transcendentals=0,
        ),
    )(alpha, q, k, vb, ke, s0)


def _gdr_pallas_bwd_flat(q, k, v, beta, eta, alpha, states, do, dsT,
                         interpret: bool, params=None):
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
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            # ~3× the forward's matmul work (recompute + two transposes).
            flops=6 * b * h * t * (3 * n * dk * dv + n * n * dk
                                   + n * n * (dk + dv)),
            bytes_accessed=b * h * t * (n * (4 * dk + 4 * dv) + 2 * dk * dv)
            * 4,
            transcendentals=0,
        ),
    )(alpha, q, k, v, beta2, eta2, states, do, dsT)


def _batch_group(b: int, h: int, n: int, dk: int, dv: int,
                 save_uw: bool = False, allow_raise: bool | None = None):
    """(G, compiler_params): streams folded into one grid step.

    The time grid is sequential by nature, but batch elements are
    independent — and on a single-TensorCore chip every grid step
    serializes, so a (B, T) grid pays the per-step fixed cost B·T times
    for tiny per-step matmuls (measured: ~12 µs/step at B=8 H=4 N=49
    d=64 → 3.0 ms for 7.4 GFLOP ≈ 2.5 TFLOP/s, 60% of the whole model's
    forward time).  Folding G streams into the head-batched block makes
    the sequential grid (B/G, T): per-step work ×G, per-step overhead
    amortized.  G is the largest divisor of B whose per-step VMEM
    footprint (operand blocks + the (N,N) WY solve intermediates,
    double-buffered blocks included) fits a conservative budget."""
    per_stream = 4.0 * h * (2 * n * dk + 2 * n * dv + 2 * n   # q,k,v,o,β,η
                            + n * n                            # A = KKᵀ tril
                            + 2 * n * (dk + dv)                # rhs + solve
                            + 3 * dk * dv)                     # S, S̃, S'
    if save_uw:
        # Extra double-buffered fp32 output blocks per step: U, W and the
        # lane-packed (bs=16, N) diagonal-block inverses.
        per_stream += 4.0 * h * (2 * n * (dk + dv) + 2 * 16 * n)
    # Mosaic's scoped-VMEM stack measures ~4× this estimate (double-buffered
    # operand/output blocks + live unrolled solve temporaries): 24.56 MB at
    # g=8, H=4, N=64, d=64 ⇒ ~3.07 MB/stream vs 0.79 estimated.  The default
    # 3.5 MB ESTIMATE budget keeps the real footprint under Mosaic's default
    # 16 MB limit with headroom (g=4 at that shape ⇒ ~12.3 MB measured-scale).
    # The training path (save_uw) never takes the raised budget — the
    # stored-solve grad A/B showed it neutral-to-worse (see _group_plan).
    if allow_raise is None:
        allow_raise = not save_uw
    if _AUTOTUNE and allow_raise and not _interpret():
        return _autotune_group("mono", b, h, n, dk, dv, per_stream)
    return _group_plan(b, per_stream, allow_raise)


def _group(x: jax.Array, g: int) -> jax.Array:
    """(B, H, ...) → (B/G, G·H, ...) — adjacent-dim reshape, no copy."""
    b, h = x.shape[0], x.shape[1]
    return x.reshape(b // g, g * h, *x.shape[2:])


def _ungroup(x: jax.Array, g: int) -> jax.Array:
    b_g, gh = x.shape[0], x.shape[1]
    return x.reshape(b_g * g, gh // g, *x.shape[2:])


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


def _flat_inputs_premul(q, k, v, beta, eta, alpha):
    """Forward-kernel operands: token-padded q, k and PREMULTIPLIED
    vb = β⊙V, ke = η⊙K (fused by XLA outside the kernel).  Pads carry
    vb = ke = 0 — exact no-op writes, and the kernel never sees a
    (..., N, 1) operand (those tile to 128 lanes: 128× padded DMA)."""
    n = q.shape[-2]
    n_pad = max(_round_up(n, 16), 16)
    vb = v.astype(_F32) * beta[..., None].astype(_F32)
    ke = k.astype(_F32) * eta[..., None].astype(_F32)
    return (_pad_tokens(q, n_pad), _pad_tokens(k, n_pad),
            _pad_tokens(vb, n_pad), _pad_tokens(ke, n_pad),
            alpha.astype(_F32))


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gdr_pallas_ew_bh(q, k, v, beta, alpha, s0, eta):
    """Decoupled erase/write GDR scan via the Pallas TPU kernel.

    Shapes as gdr_chunked_ew_bh: q,k (B,H,T,N,dk); v (B,H,T,N,dv);
    beta, eta (B,H,T,N); alpha (B,H,T); s0 (B,H,dk,dv).
    Returns (o (B,H,T,N,dv) fp32, s_T (B,H,dk,dv) fp32).
    """
    o, s_t, _, _ = _gdr_pallas_fwd_impl(q, k, v, beta, eta, alpha, s0,
                                        save_states=False)
    return o, s_t


def gdr_pallas_bh(q, k, v, beta, alpha, s0):
    """Classic coupled GDR scan (η = β) via the Pallas TPU kernel.

    beta feeds both gate slots of the decoupled kernel; under AD the two
    cotangents sum automatically, reproducing the coupled rule's dβ.
    """
    return gdr_pallas_ew_bh(q, k, v, beta, alpha, s0, beta)


# Forward kernel layout: "monolith" (DEFAULT, r2.1 — the WY solve runs
# inside every sequential grid step) | "chain" (r2.2 experiment — XLA
# computes the batched per-frame WY solves, the kernel runs only the
# sequential 3-matmul state chain; see _gdr_chain_kernel).  Measured
# same-window on v5e (floor-corrected chained-scan timing, 2026-08-18):
# the monolith wins every shipped shape — e.g. saturated 112² (B=8 T=32
# N=49) 0.68 ms vs chain 1.22 ms vs XLA chunked 1.27 ms.  The chain's
# sequential part IS fast; what sinks it is the XLA-side solve: the
# 16×16 diagonal-block inverses run at 16/128 lane utilization batched
# over (B·H·T), costing ~1 ms alone — inside the monolith kernel the
# same math rides the already-loaded VMEM blocks.  Kept as a tested
# opt-in (the right split on hardware where XLA batches small solves
# well).  Read ONCE at import like GDKVM_GDR_BWD.
_FWD_MODE = os.environ.get("GDKVM_GDR_FWD", "monolith")
if _FWD_MODE not in ("chain", "monolith"):
    raise ValueError(f"GDKVM_GDR_FWD must be chain|monolith, "
                     f"got {_FWD_MODE!r}")


def _gdr_pallas_fwd_impl(q, k, v, beta, eta, alpha, s0, save_states: bool,
                         mode: str | None = None, save_uw: bool = False):
    """Returns (o, s_T, states, uw): states is None unless save_states;
    uw is None unless save_uw, else the PADDED fp32 (U, W, inv) per
    frame — the stored-solve backward's residuals (inv = lane-packed
    diagonal-block inverses from the monolith kernel, None from chain
    mode where XLA did the solves)."""
    b, h, _, n, dk = q.shape
    dv = v.shape[-1]
    if (mode or _FWD_MODE) == "chain":
        n_pad = max(_round_up(n, 16), 16)
        qf = _pad_tokens(q, n_pad)
        kf = _pad_tokens(k, n_pad)
        # Pad tokens carry β = η = 0 ⇒ their U, W rows are exactly zero
        # (zero RHS rows propagate through the forward substitution), so
        # the chain's rank-N writes ignore them — exact no-op pads.
        bf = _pad_tokens(beta[..., None], n_pad)[..., 0]
        ef = _pad_tokens(eta[..., None], n_pad)[..., 0]
        u, w = _wy_uw_bh(kf, _pad_tokens(v, n_pad), bf, ef)
        g, params = _chain_batch_group(b, h, n_pad, dk, dv, save_uw)
        outs = _gdr_chain_flat(
            _group(qf, g), _group(kf, g), _group(u, g), _group(w, g),
            _group(alpha.astype(_F32), g), _group(s0, g), _interpret(),
            save_states, params)
        # Chain mode has no streamed inverses (XLA computed the solves);
        # the stored backward recomputes them from A in that case.
        uw = (u, w, None) if save_uw else None
    else:
        qf, kf, vbf, kef, af = _flat_inputs_premul(q, k, v, beta, eta, alpha)
        g, params = _batch_group(b, h, qf.shape[-2], dk, dv, save_uw)
        outs = _gdr_pallas_flat(
            _group(qf, g), _group(kf, g), _group(vbf, g), _group(kef, g),
            _group(af, g), _group(s0, g), _interpret(), save_states,
            save_uw, params)
        uw = (tuple(_ungroup(x, g) for x in outs[-3:])
              if save_uw else None)
    o = _ungroup(outs[0], g)[:, :, :, :n, :]            # (B,H,T,N,dv)
    s_t = _ungroup(outs[1], g)
    states = _ungroup(outs[2], g) if save_states else None
    return o, s_t, states, uw


def _fwd(q, k, v, beta, alpha, s0, eta):
    mode = _bwd_mode()
    if mode == "recompute":
        o, s_t, _, _ = _gdr_pallas_fwd_impl(q, k, v, beta, eta, alpha, s0,
                                            save_states=False)
        return (o, s_t), (q, k, v, beta, alpha, s0, eta, None, None)
    if mode == "stored":
        o, s_t, states, uw = _gdr_pallas_fwd_impl(
            q, k, v, beta, eta, alpha, s0, save_states=True, save_uw=True)
        return (o, s_t), (q, k, v, beta, alpha, s0, eta, states, uw)
    o, s_t, states, _ = _gdr_pallas_fwd_impl(q, k, v, beta, eta, alpha, s0,
                                             save_states=True)
    return (o, s_t), (q, k, v, beta, alpha, s0, eta, states, None)


# Backward mode for the Pallas GDR custom_vjp:
#   "stored"    (DEFAULT) — the forward kernel additionally streams each
#               frame's WY solve [U|W] and pre-decay state to HBM; the
#               backward applies the hand-derived adjoint in XLA, batched
#               over all frames, with only the tiny dS chain sequential
#               (_bwd_stored).  This is what made the kernel the TRAINING
#               default: it beats pure-XLA chunked AD at every measured
#               training shape (BASELINE.md r2.5).
#   "recompute" — forward-only kernel; backward = jax.vjp through the
#               mathematically-identical XLA chunked form (re-does the
#               forward solves).
#   "fused"     — reverse-scan Pallas kernel (kept for the record; a
#               single sequential kernel serializes the per-frame adjoint
#               work that XLA batches).
# Read at TRACE time: toggling the env var affects newly traced shapes
# only — already-jitted callables keep the mode they were traced with
# (the residual structure is baked per trace).
def _bwd_mode() -> str:
    mode = os.environ.get("GDKVM_GDR_BWD", "stored")
    if mode not in ("stored", "recompute", "fused"):
        raise ValueError(f"GDKVM_GDR_BWD must be stored|recompute|fused, "
                         f"got {mode!r}")
    return mode


def _tril_mask5(a: jax.Array) -> jax.Array:
    """Zero on/above the diagonal of (..., N, N)."""
    n = a.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(row > col, a, 0.0)


def _bwd_stored(residuals, cotangents):
    """Stored-solve backward: the hand-derived per-frame adjoint (module
    docstring), evaluated in XLA batched over ALL (B,H,T) frames using the
    forward kernel's streamed residuals — S_{t-1} checkpoints and the WY
    solves X=[U|W] — so no solve is ever recomputed; only one NEW
    triangular machine runs, Y=(I+A)^{-T}dX (batched
    core.gdr._solve_unit_lower_t).  The only sequential piece is the dS
    carry chain: a lax.scan whose body is two small matmuls.

    Rationale (measured, BASELINE.md r2.5): pure-XLA chunked AD wins over
    recompute-vjp because it stores the forward solves; this path stores
    them too but gets the forward at kernel speed — beating both.
    """
    q, k, v, beta, alpha, s0, eta, states, (u, w, inv_packed) = residuals
    do, dsT = cotangents
    b, h, t, n, dk = q.shape
    dv = v.shape[-1]
    n_pad = u.shape[-2]
    # bf16-streamed residuals (GDKVM_GDR_SAVE_DTYPE) upcast once here; the
    # adjoint math itself always runs fp32.
    states = states.astype(_F32)
    u, w = u.astype(_F32), w.astype(_F32)
    if inv_packed is not None:
        inv_packed = inv_packed.astype(_F32)
    qf, kf, vf, bf, ef, af = _flat_inputs(q, k, v, beta, eta, alpha)
    dof = _pad_tokens(do.astype(_F32), n_pad)
    q32, k32, v32 = (x.astype(_F32) for x in (qf, kf, vf))
    b2 = bf.astype(_F32)[..., None]
    e2 = ef.astype(_F32)[..., None]
    ke = k32 * e2
    hp = functools.partial(jnp.einsum,
                           precision=jax.lax.Precision.HIGHEST)

    # NULL RESULT (r3.4, v5e): swapping these HIGHEST einsums for bf16x3
    # (3 separate single-pass dots) made the backward 1.5× SLOWER (3.85 →
    # 5.64 ms at the 256² recipe) — they are bandwidth-bound on their
    # (B,H,T,N,·) operands, so tripling the reads costs more than the
    # saved MXU passes.  HIGHEST stays.

    sdec = af[..., None, None] * states              # S̃_t (B,H,T,dk,dv)
    qdo = hp("bhtnk,bhtnv->bhtkv", q32, dof)         # Qᵀdo, batched

    # Reverse dS chain (the only sequential piece): carry g = dS_t.
    tm = lambda x: jnp.moveaxis(x, 2, 0)             # (T, B, H, ...)

    def chain(g, xs):
        k_t, w_t, qdo_t, a_t = xs
        kg = hp("bhnk,bhkv->bhnv", k_t, g)
        ds_dec = g + qdo_t - hp("bhnk,bhnv->bhkv", w_t, kg)
        return a_t[..., None, None] * ds_dec, (ds_dec, g)

    xs = (tm(k32)[::-1], tm(w)[::-1], tm(qdo)[::-1],
          jnp.moveaxis(af, 2, 0)[::-1])
    ds0, (dsdec_r, g_r) = jax.lax.scan(chain, dsT.astype(_F32), xs)
    um = lambda x: jnp.moveaxis(x[::-1], 0, 2)       # back to (B,H,T,...)
    ds_dec = um(dsdec_r)
    g = um(g_r)                                      # dS_t per frame
    # K g is needed again below; recompute it BATCHED over all frames
    # (one big MXU op, +0.7 GF) instead of stacking the 8× larger
    # (B,H,T,N,dv) kg through the scan outputs.  Measured neutral on v5e
    # (XLA was already fusing the stacked path) — kept for the smaller
    # scan carry footprint.
    kg = hp("bhtnk,bhtkv->bhtnv", k32, g)

    # Batched adjoint over all frames.  A = diag(η)·stril(K Kᵀ): hoist the
    # fp32 η row-scale OUT of the matmul so the K Kᵀ dot can run as ONE
    # bf16 MXU pass with fp32 accumulation — bit-identical to the HIGHEST
    # 6-pass dot when K arrives in bf16 (the model's boundary since r2.3;
    # bf16 operands carry no extra bits for the extra passes to preserve).
    # Measured 0.205 → ~0.02 ms at the 256² recipe shape (BASELINE r3.4).
    if k.dtype == jnp.bfloat16:
        kkt = jnp.einsum("bhtnk,bhtmk->bhtnm", kf, kf,
                         preferred_element_type=_F32)
    else:
        kkt = hp("bhtnk,bhtmk->bhtnm", k32, k32)
    a_mat = _tril_mask5(e2 * kkt)
    x = jnp.concatenate([u, w], axis=-1)             # (B,H,T,np,dv+dk)
    dx = jnp.concatenate(
        [kg, -hp("bhtnv,bhtkv->bhtnk", kg, sdec)], axis=-1)
    solve_t = jax.vmap(jax.vmap(jax.vmap(gdr_core._solve_unit_lower_t)))
    if inv_packed is not None:
        # The forward kernel streamed the solve's diagonal-block inverses
        # (lane-packed (B,H,T,bs,N)); unpack to (B,H,T,nb,bs,bs) and skip
        # the XLA nilpotent series entirely — recomputing it batched cost
        # 1.06 ms of the 2.46 ms solve at the 256² recipe (BASELINE r3.4).
        bs = inv_packed.shape[-2]
        inv = jnp.moveaxis(
            inv_packed.reshape(b, h, t, bs, n_pad // bs, bs), -2, -3)
        y = solve_t(a_mat, dx, inv)
    else:
        y = solve_t(a_mat, dx)
    da = -_tril_mask5(hp("bhtnf,bhtmf->bhtnm", y, x))
    y_v = y[..., :dv]
    y_k = y[..., dv:]
    m = u - hp("bhtnk,bhtkv->bhtnv", w, sdec)
    dke = hp("bhtnm,bhtmk->bhtnk", da, k32) + y_k
    dk_out = (hp("bhtnv,bhtkv->bhtnk", m, g)
              + hp("bhtmn,bhtmk->bhtnk", da, ke) + e2 * dke)
    dq_out = hp("bhtnv,bhtkv->bhtnk", dof, sdec)
    dv_out = b2 * y_v
    dbeta = jnp.sum(y_v * v32, axis=-1)
    deta = jnp.sum(dke * k32, axis=-1)
    dalpha = jnp.sum(ds_dec * states, axis=(-2, -1))

    unpad = lambda z: z[:, :, :, :n]
    return (unpad(dq_out).astype(q.dtype), unpad(dk_out).astype(k.dtype),
            unpad(dv_out).astype(v.dtype), unpad(dbeta).astype(beta.dtype),
            dalpha.astype(alpha.dtype), ds0.astype(s0.dtype),
            unpad(deta).astype(eta.dtype))


def _bwd(residuals, cotangents):
    q, k, v, beta, alpha, s0, eta, states, uw = residuals
    if uw is not None:
        return _bwd_stored(residuals, cotangents)
    if states is None:
        # Backward through the mathematically-identical pure-JAX chunked
        # form (XLA-compiled; recompute-in-backward, kernel forward-only).
        _, vjp = jax.vjp(gdr_core.gdr_chunked_ew_bh,
                         q, k, v, beta, alpha, s0, eta)
        return vjp(cotangents)

    do, dsT = cotangents
    b, h, _, n, dk = q.shape
    n_pad = max(_round_up(n, 16), 16)
    qf, kf, vf, bf, ef, af = _flat_inputs(q, k, v, beta, eta, alpha)
    dof = _pad_tokens(do.astype(_F32), n_pad)
    # Fused reverse-scan kernel: never A/B'd at a raised budget; keep it at
    # the measured default group and Mosaic limit.  Under a
    # GDKVM_GDR_VMEM_MB override the budget is forced here too, so the
    # raised CompilerParams MUST ride along — a G sized for the override
    # with the default 16 MB Mosaic limit fails to compile at N≥256.
    g, params = _batch_group(b, h, n_pad, dk, v.shape[-1], allow_raise=False)
    outs = _gdr_pallas_bwd_flat(
        _group(qf, g), _group(kf, g), _group(vf, g), _group(bf, g),
        _group(ef, g), _group(af, g), _group(states, g), _group(dof, g),
        _group(dsT.astype(_F32), g), _interpret(), params)
    dqf, dkf, dvf, dbf, def_, daf, ds0 = (_ungroup(x, g) for x in outs)

    unpad = lambda x: x[:, :, :, :n]
    dq = unpad(dqf).astype(q.dtype)
    dk = unpad(dkf).astype(k.dtype)
    dv = unpad(dvf)[..., : v.shape[-1]].astype(v.dtype)
    dbeta = unpad(dbf)[..., 0].astype(beta.dtype)
    deta = unpad(def_)[..., 0].astype(eta.dtype)
    dalpha = daf[..., 0].astype(alpha.dtype)            # (B,H,T)
    return dq, dk, dv, dbeta, dalpha, ds0.astype(s0.dtype), deta


gdr_pallas_ew_bh.defvjp(_fwd, _bwd)
