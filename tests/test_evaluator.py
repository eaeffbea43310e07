"""Sharded evaluator, prompted streaming, determinism, long-sequence tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdkvm_tpu.config.schema import ModelConfig, load_config
from gdkvm_tpu.models.gdkvm import GDKVM, init_params


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(in_channels=1, num_classes=2,
                      enc_channels=(8, 16, 24, 32), enc_blocks=(1, 1, 1, 1),
                      num_heads=2, head_dim_k=16, head_dim_v=16,
                      kpff_channels=(24, 16, 8), compute_dtype="float32")
    model = GDKVM(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=32)
    return model, params


def test_evaluate_sharded_over_mesh(tiny_model):
    """Distributed eval: videos shard across the 8-device data axis and the
    Dice partial sums reduce exactly (SURVEY §2.4 distributed eval)."""
    from gdkvm_tpu.eval.evaluator import evaluate
    from gdkvm_tpu.parallel import make_mesh, replicated
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model, params = tiny_model
    cfg = load_config(None, overrides=[
        "data.dataset=synthetic", "data.image_size=32", "data.clip_len=2",
        "model.num_classes=2", "eval_stage.num_vis=0",
        "runtime.run_dir=/tmp/eval_shard_test"])
    mesh8 = make_mesh()                      # 8-way data axis
    params8 = jax.device_put(params, replicated(mesh8))
    out8 = evaluate(cfg, model, params8, mesh8, step=0)

    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    out1 = evaluate(cfg, model, params, mesh1, step=0)
    assert out8["frames"] == out1["frames"] > 0
    assert abs(out8["dice_fg_mean"] - out1["dice_fg_mean"]) < 1e-6


def test_prompted_streaming(tiny_model):
    """A first-frame prompt must actually enter the memory state and change
    the model output (asserted on LOGITS, which move even for a random
    init — an argmax comparison could pass vacuously; VERDICT r2 item 6)."""
    from gdkvm_tpu.eval.streaming import stream_video
    model, params = tiny_model
    video = np.random.default_rng(3).integers(0, 255, (12, 32, 32, 1),
                                              np.uint8)
    prompt = np.zeros((32, 32), np.int32)
    prompt[8:24, 8:24] = 1
    m_plain = np.asarray(stream_video(model, params, video, chunk=4))
    m_prompt = np.asarray(stream_video(model, params, video, chunk=4,
                                       prompt_mask=prompt))
    assert m_plain.shape == m_prompt.shape == (12, 32, 32)
    # masks must stay well-formed through the prompted path:
    assert set(np.unique(m_prompt)).issubset({0, 1})
    # Logits-level: the prompt write must perturb both the memory state
    # and the readout of the very first chunk.
    x = jnp.asarray(video[:4][None]).astype(jnp.float32) / 255.0
    lg_plain, st_plain = model.apply(params, x, None, None)
    lg_prompt, st_prompt = model.apply(params, x, None,
                                       jnp.asarray(prompt)[None])
    assert np.abs(np.asarray(st_prompt.mem) -
                  np.asarray(st_plain.mem)).max() > 0
    assert np.abs(np.asarray(lg_prompt) - np.asarray(lg_plain)).max() > 0


def test_training_determinism():
    """Same seed ⇒ identical first-step metrics (deterministic seeded
    pipeline — the sanitizer tier of SURVEY §5)."""
    from gdkvm_tpu.data.pipeline import Batch
    from gdkvm_tpu.train.loop import (create_train_state, make_optimizer,
                                      make_train_step)
    cfg = load_config("configs/smoke_synthetic.yaml")
    cfg.data.image_size = 32
    cfg.data.clip_len = 2
    model = GDKVM(cfg=cfg.model)
    tx = make_optimizer(cfg)
    rng = np.random.default_rng(0)
    batch = Batch(
        frames=rng.integers(0, 255, (2, 2, 32, 32, 1), np.uint8),
        masks=rng.integers(0, 2, (2, 2, 32, 32)).astype(np.uint8),
        valid=np.ones((2, 2), np.float32))
    losses = []
    for _ in range(2):
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(7))
        step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0)
        _, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[0] == losses[1]


def test_long_sequence_streaming_stable(tiny_model):
    """T=256 streaming (BASELINE configs[3] shape): fixed-size state stays
    finite, masks remain sane across 64 chunks."""
    from gdkvm_tpu.eval.streaming import StreamingSegmenter, stream_video
    model, params = tiny_model
    video = np.random.default_rng(5).integers(0, 255, (256, 32, 32, 1),
                                              np.uint8)
    seg = StreamingSegmenter(model, params, chunk=4)
    for lo in range(0, 256, 4):
        logits = seg.feed(video[lo:lo + 4])
    mem = np.asarray(seg.state.mem)
    assert np.isfinite(mem).all()
    assert np.abs(mem).max() < 1e3, "state magnitude must stay bounded"
    assert np.isfinite(np.asarray(logits)).all()


def test_hd95_metric_math():
    from gdkvm_tpu.eval import metrics as M
    a = np.zeros((32, 32), np.int64)
    a[8:16, 8:16] = 1
    b = np.zeros((32, 32), np.int64)
    b[8:16, 10:18] = 1
    d = M.hd95(a, b, 2)
    assert abs(d["hd95_class1"] - 2.0) < 1e-6      # 2-px shift → HD95 = 2
    assert M.hd95(a, a, 2)["hd95_class1"] == 0.0
    missing = M.hd95(a, np.zeros_like(a), 2)
    assert np.isinf(missing["hd95_class1"])
    assert M.hd95(np.zeros_like(a), np.zeros_like(a), 2) == {}
    # Physical spacing: scalar mm/px scales the distance; an (sy, sx)
    # pair is applied per axis through the EDT sampling, so a pure
    # x-shift scales with sx only (anisotropic-exactness for raw CAMUS).
    assert abs(M.hd95(a, b, 2, spacing=0.5)["hd95_class1"] - 1.0) < 1e-6
    aniso = M.hd95(a, b, 2, spacing=(0.7, 0.25))["hd95_class1"]
    assert abs(aniso - 2.0 * 0.25) < 1e-6
    c = np.zeros((32, 32), np.int64)
    c[11:19, 8:16] = 1                             # 3-px y-shift of a
    aniso_y = M.hd95(a, c, 2, spacing=(0.7, 0.25))["hd95_class1"]
    assert abs(aniso_y - 3.0 * 0.7) < 1e-6


def test_temporal_consistency_metric_math():
    from gdkvm_tpu.eval import metrics as M
    a = np.zeros((16, 16), np.int64)
    a[4:8, 4:8] = 1
    seq_stable = np.stack([a, a, a])
    c = M.temporal_consistency(seq_stable)
    assert c["temporal_fg_iou"] == 1.0 and c["flicker_rate"] == 0.0
    b = np.roll(a, 2, axis=1)
    c2 = M.temporal_consistency(np.stack([a, b]))
    assert 0.0 < c2["temporal_fg_iou"] < 1.0
    assert c2["flicker_rate"] > 0.0
    assert np.isnan(M.temporal_consistency(a[None])["temporal_fg_iou"])


def _cfg_with(**kv):
    from gdkvm_tpu.config.schema import apply_overrides
    cfg = load_config("configs/smoke_synthetic.yaml")
    apply_overrides(cfg, [f"{k}={v}" for k, v in kv.items()])
    return cfg


def test_evaluate_with_hd95(tmp_path):
    """eval_stage.hd95 adds boundary-distance keys to the eval output."""
    from gdkvm_tpu.eval.evaluator import evaluate
    from gdkvm_tpu.parallel import make_mesh
    cfg = _cfg_with(**{"runtime.run_dir": str(tmp_path / "run"),
                       "eval_stage.hd95": True})
    model = GDKVM(cfg=cfg.model)
    params = init_params(model, jax.random.PRNGKey(0), cfg.data.image_size)
    mesh = make_mesh(1, 1)
    out = evaluate(cfg, model, params, mesh, step=1)
    assert "dice_fg_mean" in out
    assert "hd95_miss_frac" in out
    has_hd = any(k.startswith("hd95_class") for k in out)
    assert has_hd or out["hd95_miss_frac"] == 1.0


def test_stream_evaluate_consistency(tmp_path):
    """--consistency reports temporal stability keys."""
    from gdkvm_tpu.eval.streaming import stream_evaluate
    cfg = _cfg_with(**{"runtime.run_dir": str(tmp_path / "run"),
                       "data.image_size": 32})
    model = GDKVM(cfg=cfg.model)
    params = init_params(model, jax.random.PRNGKey(0), 32)
    out = stream_evaluate(cfg, model, params, num_videos=2, video_len=8,
                          consistency=True)
    assert 0.0 <= out["flicker_rate"] <= 1.0
    assert 0.0 <= out["temporal_fg_iou"] <= 1.0


@pytest.mark.quick
def test_mask_from_logits_matches_argmax():
    """Class-major mask extraction (the hot-path form) ≡ argmax(-1)."""
    import numpy as np
    from gdkvm_tpu.eval.metrics import mask_from_logits

    rng = np.random.default_rng(0)
    for shape in [(3, 4, 8, 8, 2), (2, 8, 8, 4), (5, 6, 7, 3)]:
        lg = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        a = np.asarray(mask_from_logits(lg))
        b = np.asarray(jnp.argmax(lg, axis=-1)).astype(np.uint8)
        np.testing.assert_array_equal(a, b)
        assert a.dtype == np.uint8
