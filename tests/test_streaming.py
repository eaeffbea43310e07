"""Streaming inference + scaling-tool tests."""

import jax
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


def test_stream_video_shapes(tiny_model):
    from gdkvm_tpu.eval.streaming import stream_video
    model, params = tiny_model
    video = np.random.default_rng(0).integers(
        0, 255, (37, 32, 32, 1), np.uint8)     # not a multiple of chunk
    masks = stream_video(model, params, video, chunk=8)
    assert masks.shape == (37, 32, 32)
    assert masks.dtype == np.uint8


def test_stream_video_matches_batched(tiny_model):
    """Chunked streaming over a video == one batched forward (fp32)."""
    import jax.numpy as jnp
    from gdkvm_tpu.eval.streaming import stream_video
    model, params = tiny_model
    video = np.random.default_rng(1).integers(
        0, 255, (16, 32, 32, 1), np.uint8)
    stream_masks = stream_video(model, params, video, chunk=4)
    logits, _ = model.apply(params,
                            jnp.asarray(video)[None].astype(jnp.float32)
                            / 255.0)
    batched_masks = np.asarray(jnp.argmax(logits[0], axis=-1))
    np.testing.assert_array_equal(stream_masks, batched_masks)


def test_stream_evaluate_synthetic(tiny_model):
    from gdkvm_tpu.eval.streaming import stream_evaluate
    model, params = tiny_model
    cfg = load_config(None, overrides=[
        "data.dataset=synthetic", "data.image_size=32",
        "model.num_classes=2", "eval_stage.stream_chunk=8"])
    out = stream_evaluate(cfg, model, params, num_videos=2, video_len=24)
    assert out["videos"] == 2
    assert out["frames"] == 48.0
    assert out["stream_frames_per_sec"] > 0
    assert "dice_fg_mean" in out


def test_scaling_tool():
    import math
    from gdkvm_tpu.utils.scaling import optimal_bs_lr, parse_count
    # Documented formulas (reference tool.ts:8-15).
    out = optimal_bs_lr(1e8, 2e10)
    assert np.isclose(out["batch_size_tokens"],
                      math.exp(math.log(0.58) + 0.571 * math.log(2e10)))
    assert np.isclose(out["learning_rate"],
                      math.exp(math.log(1.79) - 0.713 * math.log(1e8)
                               + 0.307 * math.log(2e10)))
    # Liberal input parsing (reference tool.ts:96-111 capability).
    assert parse_count("3.5×10^6") == 3.5e6
    assert parse_count("1e8") == 1e8
    assert parse_count("1_000_000") == 1e6
    with pytest.raises(ValueError):
        parse_count("-5")
    with pytest.raises(ValueError):
        parse_count("import os")


def test_cli_scale_command(capsys):
    from gdkvm_tpu.cli import main
    assert main(["scale", "-N", "1e8", "-D", "2e10"]) == 0
    out = capsys.readouterr().out
    assert "batch_size_tokens" in out and "learning_rate" in out
    assert main(["scale", "-N", "bogus!!", "-D", "1"]) == 2


def test_stream_evaluate_multistream_matches_single(tiny_model):
    """streams=N (batched recurrence, padded groups) gives the exact same
    Dice partial sums as the sequential single-stream path (fp32 CPU),
    including with a group-tail pad (3 videos, 2 streams)."""
    from gdkvm_tpu.eval.streaming import stream_evaluate
    model, params = tiny_model
    cfg = load_config(None, overrides=[
        "data.dataset=synthetic", "data.image_size=32",
        "model.num_classes=2", "eval_stage.stream_chunk=8"])
    single = stream_evaluate(cfg, model, params, num_videos=3, video_len=24)
    multi = stream_evaluate(cfg, model, params, num_videos=3, video_len=24,
                            streams=2)
    assert multi["streams"] == 2 and multi["frames"] == single["frames"]
    for key in single:
        if key.startswith("dice"):
            assert single[key] == pytest.approx(multi[key], abs=1e-6), key
