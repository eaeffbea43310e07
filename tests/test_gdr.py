"""GDR recurrence-law and parity tests (SURVEY.md §4.2 a/b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdkvm_tpu.core import gdr


def _rand(key, T=4, N=7, dk=8, dv=6):
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (T, N, dk))
    k = jax.random.normal(ks[1], (T, N, dk))
    # L2-normalize keys as the model does; keeps the delta rule contractive.
    k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
    v = jax.random.normal(ks[2], (T, N, dv))
    beta = jax.nn.sigmoid(jax.random.normal(ks[3], (T, N)))
    alpha = jax.nn.sigmoid(jax.random.normal(ks[4], (T,)) + 2.0)
    s0 = 0.1 * jax.random.normal(ks[5], (dk, dv))
    return q, k, v, beta, alpha, s0


def test_beta_zero_is_pure_decay():
    """β=0 ⇒ no writes: S_T = (Πα) S_0 and o_t = q_t (Π_{≤t} α) S_0."""
    q, k, v, beta, alpha, s0 = _rand(jax.random.PRNGKey(0))
    beta = jnp.zeros_like(beta)
    o, s_t = gdr.gdr_ref(q, k, v, beta, alpha, s0)
    np.testing.assert_allclose(s_t, jnp.prod(alpha) * s0, rtol=1e-5)
    cum = jnp.cumprod(alpha)
    expect = jnp.einsum("tnd,de->tne", q, s0) * cum[:, None, None]
    np.testing.assert_allclose(o, expect, rtol=1e-4, atol=1e-5)


def test_alpha_one_is_pure_delta_rule():
    """α=1 ⇒ classic (ungated) delta rule; a written kv pair is retrievable."""
    dk, dv = 8, 6
    k1 = jnp.zeros((dk,)).at[3].set(1.0)
    v1 = jnp.arange(dv, dtype=jnp.float32)
    # One frame, one token, β=1, zero init: S = k1 v1ᵀ; reading with q=k1
    # returns v1 exactly.
    q = k1[None, None, :]
    k = k1[None, None, :]
    v = v1[None, None, :]
    beta = jnp.ones((1, 1))
    alpha = jnp.ones((1,))
    s0 = jnp.zeros((dk, dv))
    o, s_t = gdr.gdr_ref(q, k, v, beta, alpha, s0)
    np.testing.assert_allclose(s_t, jnp.outer(k1, v1), atol=1e-6)
    # Read in a second frame:
    o2, _ = gdr.gdr_ref(q, k, 0 * v, jnp.zeros((1, 1)), alpha, s_t)
    np.testing.assert_allclose(o2[0, 0], v1, atol=1e-6)


def test_delta_rule_overwrites():
    """β=1 write to an existing key replaces its value (the 'delta' in GDR)."""
    dk, dv = 8, 6
    k1 = jnp.zeros((dk,)).at[2].set(1.0)
    v_old = jnp.ones((dv,))
    v_new = -2.0 * jnp.ones((dv,))
    s0 = jnp.outer(k1, v_old)
    q = k1[None, None, :]
    o, s_t = gdr.gdr_ref(q, k1[None, None, :], v_new[None, None, :],
                         jnp.ones((1, 1)), jnp.ones((1,)), s0)
    np.testing.assert_allclose(s_t, jnp.outer(k1, v_new), atol=1e-6)


def test_read_is_pre_write():
    """A frame's readout must not see its own writes."""
    q, k, v, beta, alpha, s0 = _rand(jax.random.PRNGKey(1), T=1)
    o, _ = gdr.gdr_ref(q, k, v, beta, alpha, s0)
    expect = jnp.einsum("nd,de->ne", q[0], alpha[0] * s0)
    np.testing.assert_allclose(o[0], expect, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("T,N,dk,dv", [(1, 1, 4, 4), (3, 5, 8, 6),
                                       (8, 16, 16, 16), (2, 49, 32, 32)])
def test_chunked_matches_ref(T, N, dk, dv):
    q, k, v, beta, alpha, s0 = _rand(jax.random.PRNGKey(2), T, N, dk, dv)
    o_ref, s_ref = gdr.gdr_ref(q, k, v, beta, alpha, s0)
    o_ch, s_ch = gdr.gdr_chunked(q, k, v, beta, alpha, s0)
    np.testing.assert_allclose(o_ch, o_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s_ch, s_ref, rtol=1e-4, atol=1e-5)


def test_chunked_stable_with_correlated_keys_large_n():
    """Regression: N=256 tokens with highly correlated keys (the realistic
    at-init regime at 256×256 input).  A whole-matrix nilpotent-series
    inverse overflows here (measured 3e17/NaN — caused NaN training); the
    blocked solve must stay finite and match the scan reference."""
    rng = np.random.default_rng(0)
    N, dk, dv = 256, 32, 32
    base = rng.standard_normal(dk)
    k = base[None, :] + 0.1 * rng.standard_normal((N, dk))
    k = k / np.linalg.norm(k, axis=1, keepdims=True)
    q = rng.standard_normal((1, N, dk)).astype(np.float32)
    k = k[None].astype(np.float32)
    v = rng.standard_normal((1, N, dv)).astype(np.float32)
    beta = np.full((1, N), 0.9, np.float32)      # strong writes
    alpha = np.ones((1,), np.float32)
    s0 = 0.1 * rng.standard_normal((dk, dv)).astype(np.float32)
    o_ref, s_ref = gdr.gdr_ref(q, k, v, beta, alpha, s0)
    o_ch, s_ch = gdr.gdr_chunked(q, k, v, beta, alpha, s0)
    assert np.isfinite(np.asarray(o_ch)).all()
    np.testing.assert_allclose(np.asarray(s_ch), np.asarray(s_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(o_ch), np.asarray(o_ref),
                               rtol=2e-3, atol=2e-3)


def test_streaming_equals_batched_core():
    """Carrying state across two calls ≡ one call over the concatenation."""
    q, k, v, beta, alpha, s0 = _rand(jax.random.PRNGKey(3), T=6)
    o_full, s_full = gdr.gdr_chunked(q, k, v, beta, alpha, s0)
    o_a, s_a = gdr.gdr_chunked(q[:3], k[:3], v[:3], beta[:3], alpha[:3], s0)
    o_b, s_b = gdr.gdr_chunked(q[3:], k[3:], v[3:], beta[3:], alpha[3:], s_a)
    np.testing.assert_allclose(jnp.concatenate([o_a, o_b]), o_full,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_b, s_full, rtol=1e-5, atol=1e-6)


def test_batched_head_wrapper():
    B, H, T, N, dk, dv = 2, 3, 4, 5, 8, 6
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, H, T, N, dk))
    k = jax.random.normal(ks[1], (B, H, T, N, dk))
    v = jax.random.normal(ks[2], (B, H, T, N, dv))
    beta = jax.nn.sigmoid(jax.random.normal(ks[3], (B, H, T, N)))
    alpha = jax.nn.sigmoid(jax.random.normal(ks[4], (B, H, T)))
    s0 = jnp.zeros((B, H, dk, dv))
    o, s_t = gdr.gdr_chunked_bh(q, k, v, beta, alpha, s0)
    assert o.shape == (B, H, T, N, dv)
    assert s_t.shape == (B, H, dk, dv)
    # Spot-check one (b,h) against the single-head path.
    o1, s1 = gdr.gdr_chunked(q[1, 2], k[1, 2], v[1, 2], beta[1, 2],
                             alpha[1, 2], s0[1, 2])
    np.testing.assert_allclose(o[1, 2], o1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_t[1, 2], s1, rtol=1e-5, atol=1e-6)


def test_gradients_flow():
    """Chunked form is differentiable w.r.t. all inputs (training path)."""
    q, k, v, beta, alpha, s0 = _rand(jax.random.PRNGKey(5), T=3, N=4)

    def loss(q, k, v, beta, alpha, s0):
        o, s_t = gdr.gdr_chunked(q, k, v, beta, alpha, s0)
        return jnp.sum(o ** 2) + jnp.sum(s_t ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, beta,
                                                       alpha, s0)
    for g in grads:
        assert jnp.all(jnp.isfinite(g))
    assert jnp.any(grads[4] != 0)  # alpha gate receives gradient
    assert jnp.any(grads[3] != 0)  # beta gate receives gradient


def test_decoupled_erase_gate_laws():
    """GDN-2-style decoupled erase/write: η=β reduces exactly to the
    coupled rule; η=0 writes additively without erasing; β=0 with η>0
    erases along k without writing.  Chunked form ≡ scan reference."""
    import numpy as np
    from gdkvm_tpu.core import gdr

    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 7)
    B, H, T, N, dk, dv = 1, 2, 3, 6, 8, 8
    q = jax.random.normal(ks[0], (B, H, T, N, dk))
    k = jax.random.normal(ks[1], (B, H, T, N, dk))
    k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
    v = jax.random.normal(ks[2], (B, H, T, N, dv))
    beta = jax.nn.sigmoid(jax.random.normal(ks[3], (B, H, T, N)))
    alpha = jnp.ones((B, H, T))
    s0 = 0.1 * jax.random.normal(ks[5], (B, H, dk, dv))
    eta = jax.nn.sigmoid(jax.random.normal(ks[6], (B, H, T, N)))

    # η=β ⇒ identical to the coupled API.
    o_c, s_c = gdr.gdr_chunked_bh(q, k, v, beta, alpha, s0)
    o_d, s_d = gdr.gdr_chunked_ew_bh(q, k, v, beta, alpha, s0, beta)
    np.testing.assert_allclose(np.asarray(o_d), np.asarray(o_c),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_c),
                               rtol=1e-6, atol=1e-7)

    # Chunked ≡ token-level scan with independent η.
    o_r, s_r = gdr.gdr_ref_ew_bh(q, k, v, beta, alpha, s0, eta)
    o_w, s_w = gdr.gdr_chunked_ew_bh(q, k, v, beta, alpha, s0, eta)
    np.testing.assert_allclose(np.asarray(o_w), np.asarray(o_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_w), np.asarray(s_r),
                               rtol=1e-5, atol=1e-6)

    # η=0: pure additive writes — state change is exactly Σ β k vᵀ.
    zero = jnp.zeros_like(beta)
    _, s_add = gdr.gdr_chunked_ew_bh(q, k, v, beta, alpha, s0, zero)
    expect = np.asarray(s0) + np.einsum(
        "bhtn,bhtnk,bhtnv->bhkv", np.asarray(beta), np.asarray(k),
        np.asarray(v))
    np.testing.assert_allclose(np.asarray(s_add), expect,
                               rtol=1e-5, atol=1e-5)

    # β=0, η>0: erase-only — no value content enters; with v ignored the
    # state is multiplied by erase projections (state norm cannot grow).
    _, s_erase = gdr.gdr_chunked_ew_bh(q, k, v, zero, alpha, s0,
                                       jnp.ones_like(beta) * 0.9)
    assert float(jnp.linalg.norm(s_erase)) <= \
        float(jnp.linalg.norm(s0)) + 1e-5


def test_model_gdn2_variant_trains():
    """gdr_variant=gdn2 end-to-end: forward shape + one grad step."""
    import optax
    from gdkvm_tpu.config.schema import ModelConfig
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params
    from gdkvm_tpu.train import losses

    cfg = ModelConfig(in_channels=1, num_classes=2,
                      enc_channels=(8, 16, 24, 32), enc_blocks=(1, 1, 1, 1),
                      num_heads=2, head_dim_k=16, head_dim_v=16,
                      kpff_channels=(24, 16, 8), compute_dtype="float32",
                      gdr_variant="gdn2")
    model = GDKVM(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=32)
    # The decoupled variant owns an extra eta projection.
    assert "eta_proj" in params["params"]["lkva"]
    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 32, 32, 1))
    masks = jax.random.randint(jax.random.PRNGKey(2), (1, 3, 32, 32), 0, 2)
    valid = jnp.ones((1, 3))

    def loss_fn(p):
        logits, _ = model.apply(p, frames)
        return losses.segmentation_loss(logits, masks, valid)[0]

    logits, state = model.apply(params, frames)
    assert logits.shape == (1, 3, 32, 32, 2)
    g = jax.grad(loss_fn)(params)
    gn = optax.global_norm(g)
    assert float(gn) > 0 and np.isfinite(float(gn))
    # Streaming ≡ batched holds for the decoupled recurrence too.
    lo_a, st = model.apply(params, frames[:, :2])
    lo_b, st = model.apply(params, frames[:, 2:], st)
    got = jnp.concatenate([lo_a, lo_b], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(logits),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T,N,dk,dv", [(1, 1, 4, 4), (3, 5, 8, 6),
                                       (8, 16, 16, 16), (10, 7, 16, 8),
                                       (2, 49, 32, 32)])
def test_assoc_matches_ref(T, N, dk, dv):
    """Parallel (associative-scan) form ≡ token-level scan reference,
    including non-power-of-two T."""
    q, k, v, beta, alpha, s0 = _rand(jax.random.PRNGKey(6), T, N, dk, dv)
    o_ref, s_ref = gdr.gdr_ref(q, k, v, beta, alpha, s0)
    o_as, s_as = gdr.gdr_assoc(q, k, v, beta, alpha, s0)
    np.testing.assert_allclose(o_as, o_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s_as, s_ref, rtol=1e-4, atol=1e-5)


def test_assoc_decoupled_matches_ref():
    """assoc with an independent erase gate ≡ scan reference."""
    q, k, v, beta, alpha, s0 = _rand(jax.random.PRNGKey(7), T=5, N=6)
    eta = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(8), beta.shape))
    o_ref, s_ref = gdr.gdr_ref(q, k, v, beta, alpha, s0, eta)
    o_as, s_as = gdr.gdr_assoc(q, k, v, beta, alpha, s0, eta)
    np.testing.assert_allclose(o_as, o_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s_as, s_ref, rtol=1e-4, atol=1e-5)


def test_assoc_long_sequence_stable():
    """T=128 prefix products of contractive transitions stay bounded and
    match the sequential chunked form (long-context streaming shape)."""
    q, k, v, beta, alpha, s0 = _rand(jax.random.PRNGKey(9), T=128, N=8,
                                     dk=16, dv=16)
    o_ch, s_ch = gdr.gdr_chunked(q, k, v, beta, alpha, s0)
    o_as, s_as = gdr.gdr_assoc(q, k, v, beta, alpha, s0)
    assert np.isfinite(np.asarray(o_as)).all()
    np.testing.assert_allclose(o_as, o_ch, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(s_as, s_ch, rtol=5e-4, atol=5e-5)


def test_assoc_gradients_match_chunked():
    """The training contract: d(loss)/d(inputs) through the associative
    scan ≡ through the sequential chunked form (same math, different
    execution order)."""
    q, k, v, beta, alpha, s0 = _rand(jax.random.PRNGKey(10), T=4, N=5)

    def loss(fn):
        def f(args):
            o, s_t = fn(*args)
            return jnp.sum(o ** 2) + jnp.sum(s_t ** 2)
        return f

    args = (q, k, v, beta, alpha, s0)
    g_ch = jax.grad(loss(gdr.gdr_chunked))(args)
    g_as = jax.grad(loss(gdr.gdr_assoc))(args)
    for a, c in zip(g_as, g_ch):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=2e-5)


def test_assoc_streaming_equals_batched():
    """Carried state across assoc calls ≡ one assoc call (serving contract)."""
    q, k, v, beta, alpha, s0 = _rand(jax.random.PRNGKey(11), T=6)
    o_full, s_full = gdr.gdr_assoc(q, k, v, beta, alpha, s0)
    o_a, s_a = gdr.gdr_assoc(q[:3], k[:3], v[:3], beta[:3], alpha[:3], s0)
    o_b, s_b = gdr.gdr_assoc(q[3:], k[3:], v[3:], beta[3:], alpha[3:], s_a)
    np.testing.assert_allclose(jnp.concatenate([o_a, o_b]), o_full,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s_b, s_full, rtol=1e-4, atol=1e-5)


def test_model_forward_assoc_matches_chunked():
    """gdr_impl='assoc' through the full model ≡ 'chunked' (fp32)."""
    from gdkvm_tpu.config.schema import ModelConfig
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params

    kw = dict(in_channels=1, num_classes=2, enc_channels=(8, 16, 24, 32),
              enc_blocks=(1, 1, 1, 1), num_heads=2, head_dim_k=16,
              head_dim_v=16, kpff_channels=(24, 16, 8),
              compute_dtype="float32")
    frames = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 32, 32, 1))
    outs = {}
    for impl in ("chunked", "assoc"):
        model = GDKVM(cfg=ModelConfig(gdr_impl=impl, **kw))
        params = init_params(model, jax.random.PRNGKey(0), image_size=32)
        outs[impl] = model.apply(params, frames)[0]
    np.testing.assert_allclose(np.asarray(outs["assoc"]),
                               np.asarray(outs["chunked"]),
                               rtol=1e-4, atol=1e-4)
