"""Fused device-side preprocessing (ops/preproc.py): filter laws, parity
with reference resizers, and the native-resolution infer path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdkvm_tpu.ops import preproc


def test_resize_matrix_rows_sum_to_one():
    for src, dst in [(112, 112), (800, 112), (64, 128), (600, 256)]:
        m = preproc._resize_matrix(src, dst)
        assert m.shape == (dst, src)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_identity_resize_is_exact():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (3, 32, 32, 1), np.uint8)
    out = np.asarray(preproc.resize_normalize(jnp.asarray(x), (32, 32)))
    np.testing.assert_allclose(out, x.astype(np.float32) / 255.0,
                               atol=1e-7)


def test_resize_preserves_constant_fields():
    """A constant image stays constant under any resize (partition of
    unity of the filter)."""
    x = np.full((2, 77, 53, 1), 200, np.uint8)
    out = np.asarray(preproc.resize_normalize(jnp.asarray(x), (112, 112)))
    np.testing.assert_allclose(out, 200 / 255.0, atol=1e-5)
    assert out.shape == (2, 112, 112, 1)


def test_resize_matches_jax_image_bilinear():
    """Downscale ≈ jax.image.resize(antialias=True, 'bilinear') — same
    triangle filter, same half-pixel convention."""
    rng = np.random.default_rng(1)
    x = rng.integers(0, 255, (2, 96, 96, 1), np.uint8)
    got = np.asarray(preproc.resize_normalize(jnp.asarray(x), (48, 48)))
    want = np.asarray(jax.image.resize(
        jnp.asarray(x, jnp.float32) / 255.0, (2, 48, 48, 1), "bilinear",
        antialias=True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resize_under_jit_and_grad():
    x = jnp.asarray(np.random.default_rng(2).integers(
        0, 255, (1, 64, 64, 1), np.uint8))

    @jax.jit
    def f(x):
        return jnp.sum(preproc.resize_normalize(x, (32, 32)))

    assert np.isfinite(float(f(x)))


def test_resize_u8_round_trip():
    x = np.full((1, 50, 50, 1), 128, np.uint8)
    out = np.asarray(preproc.resize_u8(jnp.asarray(x), (25, 25)))
    assert out.dtype == np.uint8
    assert int(out.min()) in (127, 128) and int(out.max()) in (128, 129)


@pytest.mark.slow
def test_infer_native_resolution_device_resize(tmp_path):
    """infer on a native-resolution PNG dir with device-side resize: masks
    come back at the model resolution and roughly match the host-resize
    path (different filters ⇒ near-identical inputs, same model)."""
    from PIL import Image
    from gdkvm_tpu.config.schema import ModelConfig
    from gdkvm_tpu.eval.infer import infer_video_model, load_frames
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params

    rng = np.random.default_rng(3)
    src = tmp_path / "clip"
    src.mkdir()
    for t in range(4):
        Image.fromarray(rng.integers(0, 255, (100, 140), np.uint8)).save(
            src / f"f_{t:02d}.png")

    size = 48
    cfg = ModelConfig(num_classes=2, enc_channels=(8, 16, 24, 32),
                      num_heads=2, head_dim_k=8, head_dim_v=8,
                      compute_dtype="float32")
    model = GDKVM(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), size)

    native = load_frames(str(src), size, host_resize=False)
    assert native.shape == (4, 100, 140, 1)
    masks_dev = infer_video_model(model, params, native, chunk=4,
                                  model_size=size)
    assert masks_dev.shape == (4, size, size)

    host = load_frames(str(src), size, host_resize=True)
    masks_host = infer_video_model(model, params, host, chunk=4)
    # Different resize filters (PIL vs triangle matmul): most pixels agree.
    agree = (masks_dev == masks_host).mean()
    assert agree > 0.85, f"device- vs host-resize masks agree {agree:.2%}"
