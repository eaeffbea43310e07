"""Serving-artifact export tests (StableHLO via jax.export, CPU).

The artifact must reproduce the in-process model exactly and preserve the
streaming state-carry contract (SURVEY §4.2e applied to the exported
program)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gdkvm_tpu.config.schema import ModelConfig
from gdkvm_tpu.io.export import load_artifact, save_artifact
from gdkvm_tpu.models.gdkvm import GDKVM, init_params


def _tiny_model():
    cfg = ModelConfig(in_channels=1, num_classes=3,
                      enc_channels=(8, 16, 24, 32), enc_blocks=(1, 1, 1, 1),
                      num_heads=2, head_dim_k=16, head_dim_v=16,
                      kpff_channels=(24, 16, 8), compute_dtype="float32")
    model = GDKVM(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=32)
    return model, params


def test_export_roundtrip_matches_apply(tmp_path):
    model, params = _tiny_model()
    art = str(tmp_path / "art")
    meta = save_artifact(art, model, params, image_size=32, chunk=3,
                         batch=2)
    assert os.path.exists(os.path.join(art, "model.shlo"))
    assert meta["signature"]["frames_u8"] == [2, 3, 32, 32, 1]

    sm = load_artifact(art)
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 3, 32, 32, 1), np.uint8)
    mem, seen = sm.init_state()
    logits, mem1, seen1 = sm.step(frames, mem, seen)

    ref_logits, ref_state = model.apply(
        params, jnp.asarray(frames, jnp.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mem1), np.asarray(ref_state.mem),
                               rtol=1e-5, atol=1e-5)
    assert jax.device_get(seen1).tolist() == [3, 3]


def test_export_streaming_state_carry(tmp_path):
    """Two exported-step chunks ≡ one direct batched 6-frame forward."""
    model, params = _tiny_model()
    art = str(tmp_path / "art")
    save_artifact(art, model, params, image_size=32, chunk=3, batch=1)
    sm = load_artifact(art)

    frames = np.random.default_rng(1).integers(
        0, 255, (1, 6, 32, 32, 1), np.uint8)
    mem, seen = sm.init_state()
    lo_a, mem, seen = sm.step(frames[:, :3], mem, seen)
    lo_b, mem, seen = sm.step(frames[:, 3:], mem, seen)

    ref_logits, ref_state = model.apply(
        params, jnp.asarray(frames, jnp.float32) / 255.0)
    got = np.concatenate([np.asarray(lo_a), np.asarray(lo_b)], axis=1)
    np.testing.assert_allclose(got, np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mem), np.asarray(ref_state.mem),
                               rtol=1e-5, atol=1e-5)


def test_export_cli_roundtrip(tmp_path):
    """gdkvm export → serve-check end-to-end through the CLI."""
    from gdkvm_tpu.cli import main

    art = str(tmp_path / "cli_art")
    rc = main(["export", "--config", "configs/smoke_synthetic.yaml",
               "--out", art, "--chunk", "2", "--image-size", "32",
               "runtime.run_dir=" + str(tmp_path / "none")])
    assert rc == 0
    meta = json.load(open(os.path.join(art, "meta.json")))
    assert meta["format"] == "gdkvm-stablehlo-v1"
    rc = main(["serve-check", "--artifact", art, "--chunks", "2"])
    assert rc == 0


def test_export_quantized_model_roundtrip(tmp_path):
    """A W8A8 model exports to StableHLO with the int8 convs baked in and
    the artifact reproduces the quantized model's own apply exactly."""
    from gdkvm_tpu.ops import quant

    model, params = _tiny_model()
    rng = np.random.default_rng(5)
    batches = [rng.random((1, 3, 32, 32, 1)).astype(np.float32)]
    scales = quant.calibrate_act_scales(model, params, batches)
    qmodel = quant.w8a8_model(model, scales)

    art = str(tmp_path / "qart")
    save_artifact(art, qmodel, params, image_size=32, chunk=3, batch=1)
    sm = load_artifact(art)
    frames = rng.integers(0, 255, (1, 3, 32, 32, 1), np.uint8)
    mem, seen = sm.init_state()
    logits, mem1, _ = sm.step(frames, mem, seen)

    ref_logits, ref_state = qmodel.apply(
        params, jnp.asarray(frames, jnp.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
    # And it genuinely differs from the full-precision export (the int8
    # path is in the program, not lost in lowering).
    fp_logits, _ = model.apply(
        params, jnp.asarray(frames, jnp.float32) / 255.0)
    assert not np.allclose(np.asarray(logits), np.asarray(fp_logits))


def test_export_two_scale_decoder_roundtrip(tmp_path):
    """The lane-aligned 2-scale decoder (stride-8 sub-pixel head,
    BASELINE r4.4) exports and serves exactly like the in-process model —
    the depth-to-space head must survive StableHLO lowering."""
    from gdkvm_tpu.eval.streaming import stream_video
    from gdkvm_tpu.serve import BatchingEngine

    cfg = ModelConfig(in_channels=1, num_classes=3,
                      enc_channels=(8, 16, 24, 32), enc_blocks=(1, 1, 1, 1),
                      num_heads=2, head_dim_k=16, head_dim_v=16,
                      kpff_channels=(24, 16), compute_dtype="float32")
    model = GDKVM(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=32)
    art = str(tmp_path / "art")
    save_artifact(art, model, params, image_size=32, chunk=3, batch=1)

    video = np.random.default_rng(1).integers(
        0, 255, (6, 32, 32, 1), np.uint8)
    eng = BatchingEngine(artifact=art, streams=1, chunk=3)
    try:
        sid = eng.open_session()["session"]
        got = eng.infer(sid, video)
    finally:
        eng.close()
    want = stream_video(model, params, video, chunk=3)
    np.testing.assert_array_equal(got, want)
