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
