"""GDKVM model tests: shapes, streaming ≡ batched, prompting (SURVEY §4.2e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdkvm_tpu.config.schema import ModelConfig
from gdkvm_tpu.models.gdkvm import GDKVM, init_params


def tiny_cfg(**kw):
    base = dict(
        in_channels=1, num_classes=2,
        enc_channels=(8, 16, 24, 32), enc_blocks=(1, 1, 1, 1),
        num_heads=2, head_dim_k=16, head_dim_v=16,
        kpff_channels=(24, 16, 8),
        compute_dtype="float32",   # fp32 on CPU for exact stream equivalence
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = GDKVM(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=64)
    return model, params


def _frames(key, b=1, t=6, s=64):
    return jax.random.uniform(key, (b, t, s, s, 1))


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    frames = _frames(jax.random.PRNGKey(1), b=2, t=4)
    logits, state = model.apply(params, frames)
    assert logits.shape == (2, 4, 64, 64, 2)
    assert logits.dtype == jnp.float32
    assert state.mem.shape == (2, 2, 16, 16)
    assert state.mem.dtype == jnp.float32
    assert (state.frames_seen == 4).all()


def test_streaming_equals_batched(model_and_params):
    """Chunked streaming with carried state ≡ full-clip batched forward."""
    model, params = model_and_params
    frames = _frames(jax.random.PRNGKey(2), t=6)
    full, s_full = jax.jit(model.apply)(params, frames)

    apply = jax.jit(model.apply)
    state = None
    outs = []
    for lo, hi in [(0, 2), (2, 3), (3, 6)]:   # uneven chunks on purpose
        logits, state = apply(params, frames[:, lo:hi], state)
        outs.append(logits)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.mem), np.asarray(s_full.mem),
                               rtol=1e-5, atol=1e-5)


def test_memory_affects_later_frames(model_and_params):
    """Changing frame 0 must change predictions for later frames (the
    memory actually carries information across time)."""
    model, params = model_and_params
    frames = _frames(jax.random.PRNGKey(3), t=4)
    logits_a, _ = model.apply(params, frames)
    frames_b = frames.at[:, 0].set(jnp.roll(frames[:, 0], 7, axis=1))
    logits_b, _ = model.apply(params, frames_b)
    diff_later = float(jnp.abs(logits_a[:, 1:] - logits_b[:, 1:]).max())
    assert diff_later > 1e-6, "memory carries no information across frames"


def test_prompt_changes_output(model_and_params):
    """A first-frame mask prompt must alter predictions (prompt is written
    into the initial memory state)."""
    model, params = model_and_params
    frames = _frames(jax.random.PRNGKey(4), t=3)
    mask = jnp.zeros((1, 64, 64), jnp.int32).at[:, 16:48, 16:48].set(1)
    logits_np, _ = model.apply(params, frames)
    logits_p, _ = model.apply(params, frames, None, mask)
    assert float(jnp.abs(logits_np - logits_p).max()) > 1e-6


def test_grad_through_model(model_and_params):
    model, params = model_and_params
    frames = _frames(jax.random.PRNGKey(5), t=2, s=32)

    def loss_fn(p):
        logits, _ = model.apply(p, frames)
        return jnp.mean(logits ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(jnp.all(jnp.isfinite(x)) for x in leaves)
    nonzero = sum(int(jnp.any(x != 0)) for x in leaves)
    assert nonzero > len(leaves) * 0.8, "most params should get gradient"


def test_bf16_compute_path():
    """bf16 compute compiles and yields finite fp32 logits."""
    cfg = tiny_cfg(compute_dtype="bfloat16")
    model = GDKVM(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=32)
    frames = _frames(jax.random.PRNGKey(6), t=2, s=32)
    logits, state = jax.jit(model.apply)(params, frames)
    assert logits.dtype == jnp.float32
    assert state.mem.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_stem_variants():
    """Both stems produce identical output geometry; bad stem raises."""
    frames = _frames(jax.random.PRNGKey(7), t=2, s=64)
    shapes = {}
    for stem in ("s2d", "conv"):
        cfg = tiny_cfg(enc_stem=stem)
        model = GDKVM(cfg=cfg)
        params = init_params(model, jax.random.PRNGKey(0), image_size=64)
        logits, state = model.apply(params, frames)
        shapes[stem] = (logits.shape, state.mem.shape)
        assert bool(jnp.all(jnp.isfinite(logits)))
    assert shapes["s2d"] == shapes["conv"]

    cfg = tiny_cfg(enc_stem="bogus")
    model = GDKVM(cfg=cfg)
    with pytest.raises(ValueError, match="s2d"):
        init_params(model, jax.random.PRNGKey(0), image_size=64)


def test_space_to_depth_layout():
    """space_to_depth folds each p×p patch into channels, losslessly."""
    from gdkvm_tpu.models.encoder import space_to_depth
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    y = space_to_depth(x, 4)
    assert y.shape == (2, 2, 2, 48)
    # Patch (0,0) of batch 0: channels are the 4×4×3 patch row-major.
    patch = x[0, :4, :4, :].reshape(-1)
    np.testing.assert_array_equal(y[0, 0, 0], patch)


def test_resize_bilinear_matches_jax_image():
    """The matmul-form resize (two MXU contractions, trace-time constant
    weights) must reproduce jax.image.resize bilinear semantics in both
    directions — upsampling (decoder/logits) and antialiased downscaling
    (mask-prompt to stride 16, models/gdkvm.py)."""
    import numpy as np
    from gdkvm_tpu.models.decoder import resize_bilinear

    rng = np.random.default_rng(0)
    for h, w, hw in [(7, 7, (28, 28)), (16, 16, (64, 64)),
                     (112, 112, (7, 7)), (10, 14, (31, 9))]:
        x = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
        a = resize_bilinear(x, hw)
        b = jax.image.resize(x, (2, hw[0], hw[1], 3), method="bilinear")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_kpff_weight_space_merge_matches_concat_form():
    """KPFF folds the 1x1 mix conv into each branch's projection in weight
    space (models/decoder.py KPFFBlock docstring).  In fp32 that must
    reproduce the plain concat->mix formulation on the SAME params to
    matmul-reassociation tolerance, and the param tree must keep the
    concat-form names/shapes (checkpoint compatibility)."""
    import flax.linen as nn
    from gdkvm_tpu.models.decoder import KPFFBlock, resize_bilinear

    rng = np.random.default_rng(1)
    ch, cp, cg, cu = 24, 16, 32, 20
    hw = (16, 16)
    pixel = jnp.asarray(rng.standard_normal((2, *hw, cp)), jnp.float32)
    gkey = jnp.asarray(rng.standard_normal((2, 4, 4, cg)), jnp.float32)
    up = jnp.asarray(rng.standard_normal((2, 8, 8, cu)), jnp.float32)

    block = KPFFBlock(ch, dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), pixel, gkey, up)["params"]
    got = block.apply({"params": params}, pixel, gkey, up)

    # param tree: concat-form names and shapes
    assert params["Conv_0"]["kernel"].shape == (1, 1, 3 * ch + cu, ch)
    assert params["global_proj"]["kernel"].shape == (1, 1, cg, ch)
    assert params["pixel_proj"]["kernel"].shape == (1, 1, cp, ch)
    assert params["local_pw"]["kernel"].shape == (1, 1, cp, ch)
    assert params["local_dw"]["kernel"].shape == (3, 3, 1, cp)

    # reference: the explicit concat -> 1x1 mix formulation
    def conv1x1(x, k):
        return jnp.einsum("bhwc,cd->bhwd", x, k[0, 0])

    g_small = conv1x1(gkey, params["global_proj"]["kernel"])
    g = resize_bilinear(g_small, hw)
    loc = jax.lax.conv_general_dilated(
        pixel, params["local_dw"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=cp)
    loc = conv1x1(loc, params["local_pw"]["kernel"])
    px = conv1x1(pixel, params["pixel_proj"]["kernel"])
    h = jnp.concatenate([px, loc, g, resize_bilinear(up, hw)], axis=-1)
    h = conv1x1(h, params["Conv_0"]["kernel"])
    gn = nn.GroupNorm(num_groups=8, dtype=jnp.float32)
    h = gn.apply({"params": params["GroupNorm_0"]}, h)
    h = nn.silu(h)
    h = jax.lax.conv_general_dilated(
        h, params["Conv_1"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = gn.apply({"params": params["GroupNorm_1"]}, h)
    h = nn.silu(h)
    se = jnp.mean(g_small, axis=(1, 2))
    d0 = nn.Dense(max(ch // 4, 8), dtype=jnp.float32)
    d1 = nn.Dense(ch, dtype=jnp.float32)
    se = nn.silu(d0.apply({"params": params["Dense_0"]}, se))
    se = nn.sigmoid(d1.apply({"params": params["Dense_1"]}, se))
    want = h * se[:, None, None, :]

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_group_norm_matches_flax():
    """Lane-friendly GroupNorm (ops/norms.py) ≡ nn.GroupNorm.

    bf16: outputs within one bf16 ulp, grads within bf16 rounding; fp32:
    outputs to reassociation tolerance, param grads ~1e-7 relative.
    Covers the repo's real group sizes (2 at C=64/G=32, 3 at C=48/G=16).
    """
    import flax.linen as nn
    from gdkvm_tpu.ops.norms import GroupNorm

    rng = np.random.default_rng(0)
    for c, g, dt, tol in [(64, 32, jnp.bfloat16, 8e-3),
                          (48, 16, jnp.bfloat16, 8e-3),
                          (64, 32, jnp.float32, 5e-6),
                          (96, 32, jnp.float32, 5e-6)]:
        x = jnp.asarray(rng.standard_normal((4, 8, 8, c)) * 2 + 0.5, dt)
        ref = nn.GroupNorm(num_groups=g, dtype=dt)
        new = GroupNorm(num_groups=g, dtype=dt)
        p = ref.init(jax.random.PRNGKey(0), x)
        p = jax.tree.map(  # random affine so the a·x+b fold is tested
            lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype), p)
        yr = np.asarray(ref.apply(p, x), np.float32)
        yn = np.asarray(new.apply(p, x), np.float32)
        np.testing.assert_allclose(yn, yr, rtol=tol,
                                   atol=tol * max(1.0, np.abs(yr).max()))

        def loss(fn):
            return lambda p, x: (fn.apply(p, x).astype(jnp.float32) ** 2).sum()

        gr = jax.grad(loss(ref), argnums=(0, 1))(p, x)
        gn_ = jax.grad(loss(new), argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gn_)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
            assert rel < (0.02 if dt == jnp.bfloat16 else 1e-5), (c, g, dt, rel)


def test_two_scale_decoder_head():
    """kpff_channels with 2 entries = head at stride 8 (the lane-aligned
    TPU head, decoder.py docstring): forward shapes, streaming ≡ batched,
    grads finite, and no kpff4 params exist."""
    cfg = tiny_cfg(kpff_channels=(24, 16))
    model = GDKVM(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), 64)
    dec = params["params"]["decoder"]
    assert "kpff16" in dec and "kpff8" in dec and "kpff4" not in dec

    rng = jax.random.PRNGKey(1)
    frames = jax.random.uniform(rng, (1, 4, 64, 64, 1))
    full, s_full = jax.jit(model.apply)(params, frames)
    assert full.shape == (1, 4, 64, 64, 2)
    assert np.isfinite(np.asarray(full)).all()

    apply = jax.jit(model.apply)
    state = None
    outs = []
    for lo, hi in [(0, 1), (1, 4)]:
        logits, state = apply(params, frames[:, lo:hi], state)
        outs.append(logits)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, axis=1)), np.asarray(full),
        rtol=1e-5, atol=1e-5)

    def loss(p):
        lg, _ = model.apply(p, frames)
        return jnp.mean(lg ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(g))


def test_decoder_channel_length_validated():
    cfg = tiny_cfg(kpff_channels=(24,))
    model = GDKVM(cfg=cfg)
    with pytest.raises(ValueError, match="2 .*or 3"):
        init_params(model, jax.random.PRNGKey(0), 64)
