"""Pallas GDR kernel parity tests (interpret mode on CPU — SURVEY §4.2a)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdkvm_tpu.core import gdr
from gdkvm_tpu.ops import gdr_pallas


def _rand_bh(key, B=2, H=2, T=4, N=7, dk=16, dv=16, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, H, T, N, dk), dtype)
    k = jax.random.normal(ks[1], (B, H, T, N, dk), dtype)
    k = k / (jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                             keepdims=True) + 1e-6).astype(dtype)
    v = jax.random.normal(ks[2], (B, H, T, N, dv), dtype)
    beta = jax.nn.sigmoid(jax.random.normal(ks[3], (B, H, T, N))).astype(dtype)
    alpha = jax.nn.sigmoid(jax.random.normal(ks[4], (B, H, T)) + 2.0)
    s0 = 0.1 * jax.random.normal(ks[5], (B, H, dk, dv))
    return q, k, v, beta, alpha, s0


@pytest.mark.parametrize("T,N,dk,dv", [
    (1, 8, 8, 8),        # aligned minimal
    (4, 7, 16, 16),      # unaligned N → padding path
    (3, 49, 32, 32),     # EchoNet-like token count (7×7)
    (2, 16, 16, 32),     # dk != dv
])
def test_pallas_matches_ref(T, N, dk, dv):
    args = _rand_bh(jax.random.PRNGKey(0), B=1, H=2, T=T, N=N, dk=dk, dv=dv)
    o_ref, s_ref = gdr.gdr_ref_bh(*args)
    o_pl, s_pl = gdr_pallas.gdr_pallas_bh(*args)
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_bf16_inputs():
    """bf16 q/k/v/β with fp32 state: kernel must stay fp32-accurate inside
    (loose output tolerance from bf16 input rounding only)."""
    q, k, v, beta, alpha, s0 = _rand_bh(jax.random.PRNGKey(1), T=3, N=8)
    o_ref, s_ref = gdr.gdr_ref_bh(q, k, v, beta, alpha, s0)
    to16 = lambda x: x.astype(jnp.bfloat16)
    o_pl, s_pl = gdr_pallas.gdr_pallas_bh(to16(q), to16(k), to16(v),
                                          to16(beta), alpha, s0)
    assert o_pl.dtype == jnp.float32 and s_pl.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref),
                               rtol=3e-2, atol=3e-2)


def test_pallas_streaming_state_carry():
    """Two pallas calls with carried state ≡ one call (VMEM-resident state
    reloads correctly at each (bh, t=0))."""
    q, k, v, beta, alpha, s0 = _rand_bh(jax.random.PRNGKey(2), T=6)
    o_full, s_full = gdr_pallas.gdr_pallas_bh(q, k, v, beta, alpha, s0)
    sl = lambda x, lo, hi: x[:, :, lo:hi]
    o_a, s_a = gdr_pallas.gdr_pallas_bh(sl(q, 0, 2), sl(k, 0, 2),
                                        sl(v, 0, 2), sl(beta, 0, 2),
                                        sl(alpha, 0, 2), s0)
    o_b, s_b = gdr_pallas.gdr_pallas_bh(sl(q, 2, 6), sl(k, 2, 6),
                                        sl(v, 2, 6), sl(beta, 2, 6),
                                        sl(alpha, 2, 6), s_a)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([o_a, o_b], 2)),
                               np.asarray(o_full), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_b), np.asarray(s_full),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["fused", "recompute", "stored"])
def test_pallas_grad_matches_ref(mode, monkeypatch):
    """Custom VJP (fused reverse-scan kernel / recompute fallback) ≈ grads
    of the scan reference."""
    monkeypatch.setenv("GDKVM_GDR_BWD", mode)
    args = _rand_bh(jax.random.PRNGKey(3), B=1, H=1, T=3, N=5, dk=8, dv=8)

    def loss_pl(*a):
        o, s = gdr_pallas.gdr_pallas_bh(*a)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    def loss_ref(*a):
        o, s = gdr.gdr_ref_bh(*a)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    g_pl = jax.grad(loss_pl, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("T,N,dk,dv", [
    (4, 7, 16, 16),      # unaligned N → padding path
    (2, 16, 16, 32),     # dk != dv, exact 16-token block
    (3, 49, 32, 32),     # EchoNet-like token count (7×7)
])
def test_pallas_fused_bwd_all_grads(T, N, dk, dv, monkeypatch):
    """Fused backward kernel: per-argument cotangents ≡ scan-reference
    grads under a mixed o/sT loss with non-uniform weights (catches
    token-padding and reversed-time indexing bugs)."""
    monkeypatch.setenv("GDKVM_GDR_BWD", "fused")
    args = _rand_bh(jax.random.PRNGKey(7), B=2, H=2, T=T, N=N, dk=dk, dv=dv)
    w_o = jnp.cos(jnp.arange(T * N * dv, dtype=jnp.float32)).reshape(
        1, 1, T, N, dv)
    w_s = jnp.sin(jnp.arange(dk * dv, dtype=jnp.float32)).reshape(
        1, 1, dk, dv)

    def loss(fn):
        def f(*a):
            o, s = fn(*a)
            return jnp.sum(o * w_o) + jnp.sum(s * w_s)
        return f

    g_pl = jax.grad(loss(gdr_pallas.gdr_pallas_bh),
                    argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss(gdr.gdr_ref_bh), argnums=tuple(range(6)))(*args)
    names = ["dq", "dk", "dv", "dbeta", "dalpha", "ds0"]
    for name, a, b in zip(names, g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_pallas_fused_bwd_state_carry_chain(monkeypatch):
    """Gradient flows through a chained two-call state carry (ds0 of the
    second call feeds sT cotangent of the first)."""
    monkeypatch.setenv("GDKVM_GDR_BWD", "fused")
    q, k, v, beta, alpha, s0 = _rand_bh(jax.random.PRNGKey(9), T=6)
    sl = lambda x, lo, hi: x[:, :, lo:hi]

    def loss_chain(*a):
        q, k, v, beta, alpha, s0 = a
        _, s_a = gdr_pallas.gdr_pallas_bh(
            sl(q, 0, 3), sl(k, 0, 3), sl(v, 0, 3), sl(beta, 0, 3),
            sl(alpha, 0, 3), s0)
        o_b, s_b = gdr_pallas.gdr_pallas_bh(
            sl(q, 3, 6), sl(k, 3, 6), sl(v, 3, 6), sl(beta, 3, 6),
            sl(alpha, 3, 6), s_a)
        return jnp.sum(o_b ** 2) + jnp.sum(s_b ** 2)

    def loss_ref(*a):
        o, s = gdr.gdr_ref_bh(*a)
        return jnp.sum(o[:, :, 3:] ** 2) + jnp.sum(s ** 2)

    g_pl = jax.grad(loss_chain, argnums=tuple(range(6)))(
        q, k, v, beta, alpha, s0)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(
        q, k, v, beta, alpha, s0)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_model_with_pallas_impl_matches_chunked():
    """Full GDKVM forward with gdr_impl=pallas ≡ gdr_impl=chunked."""
    from gdkvm_tpu.config.schema import ModelConfig
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params
    kw = dict(in_channels=1, num_classes=2,
              enc_channels=(8, 16, 24, 32), enc_blocks=(1, 1, 1, 1),
              num_heads=2, head_dim_k=16, head_dim_v=16,
              kpff_channels=(24, 16, 8), compute_dtype="float32")
    m_ch = GDKVM(cfg=ModelConfig(gdr_impl="chunked", **kw))
    m_pl = GDKVM(cfg=ModelConfig(gdr_impl="pallas", **kw))
    params = init_params(m_ch, jax.random.PRNGKey(0), image_size=32)
    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 32, 32, 1))
    lo_ch, st_ch = m_ch.apply(params, frames)
    lo_pl, st_pl = m_pl.apply(params, frames)
    np.testing.assert_allclose(np.asarray(lo_pl), np.asarray(lo_ch),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_pl.mem), np.asarray(st_ch.mem),
                               rtol=1e-4, atol=1e-4)


def test_pallas_fuzz_shapes(monkeypatch):
    """Randomized shape sweep: forward + fused backward parity vs the scan
    reference across odd token counts, head dims, and dtypes."""
    monkeypatch.setenv("GDKVM_GDR_BWD", "fused")
    rng = np.random.default_rng(11)
    for trial in range(5):
        B = int(rng.integers(1, 3))
        H = int(rng.integers(1, 4))
        T = int(rng.integers(1, 5))
        N = int(rng.integers(1, 21))
        dk = int(rng.choice([8, 16, 24]))
        dv = int(rng.choice([8, 16, 24]))
        args = _rand_bh(jax.random.PRNGKey(100 + trial),
                        B=B, H=H, T=T, N=N, dk=dk, dv=dv)
        o_ref, s_ref = gdr.gdr_ref_bh(*args)
        o_pl, s_pl = gdr_pallas.gdr_pallas_bh(*args)
        np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"fwd trial {trial} "
                                           f"B{B}H{H}T{T}N{N}k{dk}v{dv}")
        np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref),
                                   rtol=1e-4, atol=1e-5)

        def loss(fn):
            return lambda *a: jnp.sum(fn(*a)[0] ** 2) + \
                jnp.sum(fn(*a)[1] ** 2)
        g_pl = jax.grad(loss(gdr_pallas.gdr_pallas_bh),
                        argnums=(0, 3, 5))(*args)
        g_ref = jax.grad(loss(gdr.gdr_ref_bh), argnums=(0, 3, 5))(*args)
        for a, b in zip(g_pl, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=3e-4,
                                       err_msg=f"bwd trial {trial}")


@pytest.mark.parametrize("mode", ["fused", "recompute", "stored"])
def test_pallas_decoupled_gates(mode, monkeypatch):
    """Decoupled erase/write kernel (gdr_pallas_ew_bh): forward + all
    gradients ≡ the scan reference with independent η, and the coupled
    wrapper still reproduces the classic rule exactly."""
    monkeypatch.setenv("GDKVM_GDR_BWD", mode)
    q, k, v, beta, alpha, s0 = _rand_bh(jax.random.PRNGKey(21),
                                        B=1, H=2, T=3, N=7, dk=16, dv=16)
    eta = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(22),
                                           beta.shape))

    o_ref, s_ref = gdr.gdr_ref_ew_bh(q, k, v, beta, alpha, s0, eta)
    o_pl, s_pl = gdr_pallas.gdr_pallas_ew_bh(q, k, v, beta, alpha, s0, eta)
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a)[0] ** 2) + jnp.sum(fn(*a)[1] ** 2)

    g_pl = jax.grad(loss(gdr_pallas.gdr_pallas_ew_bh),
                    argnums=tuple(range(7)))(q, k, v, beta, alpha, s0, eta)
    g_ref = jax.grad(loss(gdr.gdr_ref_ew_bh),
                     argnums=tuple(range(7)))(q, k, v, beta, alpha, s0, eta)
    names = ["dq", "dk", "dv", "dbeta", "dalpha", "ds0", "deta"]
    for name, a, b in zip(names, g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4, err_msg=name)

    # Coupled wrapper (β in both slots): dβ = dβ_write + dη_erase ≡ the
    # classic coupled gradient.
    g_c = jax.grad(loss(gdr_pallas.gdr_pallas_bh),
                   argnums=(3,))(q, k, v, beta, alpha, s0)[0]
    g_cr = jax.grad(loss(gdr.gdr_ref_bh),
                    argnums=(3,))(q, k, v, beta, alpha, s0)[0]
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_cr),
                               rtol=3e-3, atol=3e-4)


def test_gdr_impl_auto_resolution():
    """auto → chunked on CPU (interpret-mode Pallas would be pathological);
    the TPU side resolves to the kernel (asserted by construction: any
    non-cpu backend picks pallas)."""
    from gdkvm_tpu.models.lkva import LKVAMemory
    assert LKVAMemory(gdr_impl="auto")._impl() == "chunked"
    assert LKVAMemory(gdr_impl="pallas")._impl() == "pallas"
    assert LKVAMemory(gdr_impl="chunked")._impl() == "chunked"


@pytest.mark.parametrize("T,N,dk,dv", [
    (4, 7, 16, 16),      # unaligned N → padding path
    (3, 49, 32, 32),     # EchoNet-like token count (7×7)
    (2, 16, 16, 32),     # dk != dv
])
def test_pallas_chain_mode_matches_ref(T, N, dk, dv):
    """GDKVM_GDR_FWD=chain (XLA WY solves + sequential chain kernel) ≡ the
    scan reference.  The mode env var is baked at import, so the chain
    path is exercised through the impl's explicit mode override."""
    args = _rand_bh(jax.random.PRNGKey(11), B=2, H=2, T=T, N=N,
                    dk=dk, dv=dv)
    q, k, v, beta, alpha, s0 = args
    o_ref, s_ref = gdr.gdr_ref_bh(*args)
    o_pl, s_pl, states, uw = gdr_pallas._gdr_pallas_fwd_impl(
        q, k, v, beta, beta, alpha, s0, save_states=False, mode="chain")
    assert states is None and uw is None
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_chain_mode_save_states():
    """Chain mode with save_states emits the same pre-decay checkpoints
    the fused backward consumes (parity vs the monolith kernel's)."""
    q, k, v, beta, alpha, s0 = _rand_bh(jax.random.PRNGKey(12), B=1, H=2,
                                        T=3, N=8)
    _, _, st_chain, _ = gdr_pallas._gdr_pallas_fwd_impl(
        q, k, v, beta, beta, alpha, s0, save_states=True, mode="chain")
    _, _, st_mono, _ = gdr_pallas._gdr_pallas_fwd_impl(
        q, k, v, beta, beta, alpha, s0, save_states=True, mode="monolith")
    np.testing.assert_allclose(np.asarray(st_chain), np.asarray(st_mono),
                               rtol=1e-5, atol=1e-6)


def test_group_plan_vmem_gate():
    """Shape-gated VMEM policy (same-window v5e A/B, r2.6): raise the
    budget only when the default starves G below 4 AND the batch has room;
    never on the training (save_uw) path; B=1 never pays the raised limit."""
    H, DK, DV = 4, 64, 64
    # N=49→pad 64: default budget already gives G=4 → no raise.
    g, params = gdr_pallas._batch_group(8, H, 64, DK, DV)
    assert g == 4 and params is None
    # N=256 inference: starved (G=1 at default) → raised to G=4 + params.
    g, params = gdr_pallas._batch_group(8, H, 256, DK, DV)
    assert g == 4
    if jax.default_backend() != "cpu":
        assert params is not None
    # Same shape on the training path: stays at the default budget.
    g, params = gdr_pallas._batch_group(8, H, 256, DK, DV, save_uw=True)
    assert g == 1 and params is None
    # B=1: the group cannot grow, so the raised limit is never applied.
    g, params = gdr_pallas._batch_group(1, H, 208, DK, DV)
    assert g == 1 and params is None
    # Chain kernel is light enough that the default budget suffices here.
    g, params = gdr_pallas._chain_batch_group(8, H, 64, DK, DV)
    assert g >= 4 and params is None
    # Raised-budget groups are capped at 4 even when the budget fits more:
    # N=128-pad B=8 per-stream ~1.5 MB would self-select G=8 under 14 MB,
    # a regime the only forced-G=8 A/B showed losing 8-14% (ADVICE r2).
    g, params = gdr_pallas._batch_group(8, H, 128, DK, DV)
    assert g <= 4
    # ...and the cap respects batch divisibility (B=6 → 3, not 4).
    g, _ = gdr_pallas._batch_group(6, H, 128, DK, DV)
    assert g in (1, 2, 3) and 6 % g == 0
    # Chain training traces (save_uw) never take the raised budget either.
    g_tr, params_tr = gdr_pallas._chain_batch_group(8, H, 256, DK, DV,
                                                    save_uw=True)
    g_inf, _ = gdr_pallas._chain_batch_group(8, H, 256, DK, DV)
    assert params_tr is None and g_tr <= g_inf


def test_vmem_override_env_validation():
    """Malformed GDKVM_GDR_VMEM_MB must raise a descriptive ValueError at
    import (consistency with GDKVM_GDR_PRECISION/GDKVM_GDR_FWD), and the
    fused reverse-scan backward must carry the override's CompilerParams
    (ADVICE r2 medium: a group sized for the raised budget with the
    default Mosaic limit fails to compile)."""
    import subprocess
    import sys
    proc = subprocess.run(
        [sys.executable, "-c", "import gdkvm_tpu.ops.gdr_pallas"],
        env={**os.environ, "GDKVM_GDR_VMEM_MB": "bogus",
             "GDKVM_PLATFORM": "cpu"},
        capture_output=True, text=True)
    assert proc.returncode != 0
    assert "GDKVM_GDR_VMEM_MB must be a float, 'auto' or 'autotune'" \
        in proc.stderr
    # _gdr_pallas_bwd_flat accepts compiler params (plumbing exists).
    import inspect
    assert "params" in inspect.signature(
        gdr_pallas._gdr_pallas_bwd_flat).parameters


def test_autotune_group_cache_and_fallback(tmp_path, monkeypatch):
    """GDKVM_GDR_VMEM_MB=autotune policy logic (probe mocked, CPU-safe):
    picks the measured-fastest feasible G, caches in-process AND in the
    JSON sidecar (probe runs once per shape per machine), and falls back
    to the heuristic plan when every candidate fails to compile."""
    monkeypatch.setattr(gdr_pallas, "_AUTOTUNE_PATH",
                        str(tmp_path / "gdr_autotune.json"))
    monkeypatch.setattr(gdr_pallas, "_autotune_mem", {})

    calls = []

    def fake_probe(kind, b, h, n, dk, dv, g, params):
        calls.append(g)
        return {1: 3.0, 2: 1.5, 4: 2.0}[g]

    monkeypatch.setattr(gdr_pallas, "_autotune_probe", fake_probe)
    # per_stream 3.5 MB → candidates are the divisors of 8 that fit the
    # 110 MB raised-estimate ceiling: 1, 2, 4 (8 → 112 MB, excluded).
    ps = 3.5e6
    g, _ = gdr_pallas._autotune_group("mono", 8, 4, 256, 64, 64, ps)
    assert g == 2 and sorted(calls) == [1, 2, 4]

    # In-process cache: no further probes for the same shape.
    calls.clear()
    g, _ = gdr_pallas._autotune_group("mono", 8, 4, 256, 64, 64, ps)
    assert g == 2 and calls == []

    # Disk sidecar: a fresh process (cleared memory cache) reads the
    # persisted winner without probing.
    monkeypatch.setattr(gdr_pallas, "_autotune_mem", {})
    g, _ = gdr_pallas._autotune_group("mono", 8, 4, 256, 64, 64, ps)
    assert g == 2 and calls == []

    # Every candidate failing to compile → heuristic _group_plan result.
    def broken_probe(*a):
        raise RuntimeError("mosaic says no")

    monkeypatch.setattr(gdr_pallas, "_autotune_probe", broken_probe)
    monkeypatch.setattr(gdr_pallas, "_autotune_mem", {})
    monkeypatch.setattr(gdr_pallas, "_AUTOTUNE_PATH",
                        str(tmp_path / "empty.json"))
    want = gdr_pallas._group_plan(8, ps, allow_raise=True)
    got = gdr_pallas._autotune_group("mono", 8, 4, 256, 64, 64, ps)
    assert got[0] == want[0]


def test_stored_bwd_bf16_residuals(monkeypatch):
    """GDKVM_GDR_SAVE_DTYPE=bf16 streams the stored backward's residuals
    (S checkpoints, [U|W], packed inverses) in bf16 — half the DMA.  The
    adjoint math stays fp32, so grads must remain close to the scan
    reference (looser than the exact-f32 path, but well inside training
    noise)."""
    monkeypatch.setenv("GDKVM_GDR_BWD", "stored")
    monkeypatch.setenv("GDKVM_GDR_SAVE_DTYPE", "bf16")
    args = _rand_bh(jax.random.PRNGKey(9), B=1, H=2, T=3, N=17, dk=16,
                    dv=16)

    def loss_pl(*a):
        o, s = gdr_pallas.gdr_pallas_bh(*a)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    def loss_ref(*a):
        o, s = gdr.gdr_ref_bh(*a)
        return jnp.sum(o ** 2) + jnp.sum(s ** 2)

    g_pl = jax.grad(loss_pl, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a, b in zip(g_pl, g_ref):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        assert np.isfinite(a).all() and rel < 3e-2, rel

    monkeypatch.setenv("GDKVM_GDR_SAVE_DTYPE", "nope")
    with pytest.raises(ValueError, match="SAVE_DTYPE"):
        gdr_pallas._save_dtype()
