"""Training-loop integration tests (CPU, tiny shapes — SURVEY §4.2c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdkvm_tpu.config.schema import Config, load_config
from gdkvm_tpu.data.pipeline import Batch, batch_iterator, make_dataset
from gdkvm_tpu.models.gdkvm import GDKVM
from gdkvm_tpu.train import losses
from gdkvm_tpu.train.loop import (TrainState, create_train_state,
                                  make_optimizer, make_train_step)


def smoke_cfg(**overrides) -> Config:
    cfg = load_config("configs/smoke_synthetic.yaml")
    from gdkvm_tpu.config.schema import apply_overrides
    apply_overrides(cfg, [f"{k}={v}" for k, v in overrides.items()])
    return cfg


def test_loss_respects_validity():
    logits = jnp.zeros((1, 2, 8, 8, 2)).at[..., 1].set(5.0)
    labels = jnp.ones((1, 2, 8, 8), jnp.int32)
    valid_all = jnp.ones((1, 2))
    valid_none = jnp.zeros((1, 2))
    l_all, _ = losses.segmentation_loss(logits, labels, valid_all)
    l_none, _ = losses.segmentation_loss(logits, labels, valid_none)
    assert float(l_all) < 0.1            # perfect prediction, low loss
    assert np.isfinite(float(l_none))    # no division blowup
    # A frame with wrong labels only counts when valid.
    labels_bad = labels.at[:, 1].set(0)
    l_good, _ = losses.segmentation_loss(
        logits, labels_bad, jnp.array([[1.0, 0.0]]))
    l_bad, _ = losses.segmentation_loss(
        logits, labels_bad, jnp.array([[1.0, 1.0]]))
    assert float(l_bad) > float(l_good)


def test_overfit_single_clip():
    """Hard Dice must approach 1.0 when overfitting one synthetic clip —
    the de-risking milestone from SURVEY.md §7.2 step 2 (full trajectory
    reaches 0.997 by step 400; we check the 120-step waypoint)."""
    from gdkvm_tpu.eval import metrics as M
    cfg = smoke_cfg(**{"train.prompt_prob": 0.0,
                       "data.image_size": 48, "data.clip_len": 3,
                       "num_iterations": 500, "learning_rate": 2e-3})
    model = GDKVM(cfg=cfg.model)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes)
    frames, masks, valid = ds[0]
    batch = Batch(frames=jnp.asarray(frames)[None],
                  masks=jnp.asarray(masks)[None],
                  valid=jnp.asarray(valid)[None])
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0)
    first = None
    for i in range(120):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.45, f"no learning: {first:.3f} → {last:.3f}"
    logits, _ = model.apply(state.params,
                            batch.frames.astype(jnp.float32) / 255.0)
    acc = M.dice_accumulate(logits, batch.masks.astype(jnp.int32),
                            batch.valid, cfg.model.num_classes)
    d = M.dice_finalize(jax.device_get(acc))
    assert d["dice_fg_mean"] > 0.9, d


def test_checkpoint_roundtrip(tmp_path):
    from gdkvm_tpu.io.checkpoint import CheckpointManager
    cfg = smoke_cfg()
    model = GDKVM(cfg=cfg.model)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    host_state = jax.device_get(state)
    mgr.save(7, host_state)
    mgr.wait()
    assert mgr.latest_step() == 7
    restored = mgr.restore(host_state)
    jax.tree.map(np.testing.assert_array_equal, host_state.params,
                 restored.params)
    mgr.close()


def test_metrics_logger(tmp_path):
    import json
    from gdkvm_tpu.io.metrics_log import MetricsLogger
    lg = MetricsLogger(str(tmp_path), wandb_mode="disabled")
    lg.log(1, {"loss": jnp.float32(1.5)})
    lg.log(2, {"loss": 1.2, "note": "x"})
    lg.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["step"] == 1 and abs(lines[0]["loss"] - 1.5) < 1e-6
    assert lines[1]["note"] == "x"


def test_resume_equals_straight_run(tmp_path):
    """Train 4 steps straight vs 2 + resume + 2: identical final params
    (optimizer, RNG, and the batch stream all restore exactly)."""
    from gdkvm_tpu.train.loop import train

    common = dict(num_iterations=4, **{"train.checkpoint_every": 2,
                                       "train.eval_every": 1000,
                                       "train.log_every": 1,
                                       "data.augment": True,
                                       "parallel.data_axis": 1})

    cfg_a = smoke_cfg(**common, **{"runtime.run_dir": str(tmp_path / "a")})
    train(cfg_a)

    # Same schedule (num_iterations drives LR decay) — stop early instead.
    cfg_b1 = smoke_cfg(**common, **{"runtime.run_dir": str(tmp_path / "b")})
    train(cfg_b1, max_steps=2)
    cfg_b2 = smoke_cfg(**common, **{"runtime.run_dir": str(tmp_path / "b"),
                                    "runtime.resume": True})
    train(cfg_b2)

    from gdkvm_tpu.io.checkpoint import CheckpointManager
    from gdkvm_tpu.train.loop import create_train_state, make_optimizer
    tpl = create_train_state(cfg_a, GDKVM(cfg=cfg_a.model),
                             make_optimizer(cfg_a), jax.random.PRNGKey(0))
    tpl = jax.device_get(tpl)
    ma = CheckpointManager(str(tmp_path / "a" / "checkpoints"))
    mb = CheckpointManager(str(tmp_path / "b" / "checkpoints"))
    assert ma.latest_step() == 4 and mb.latest_step() == 4
    pa, pb = ma.restore(tpl).params, mb.restore(tpl).params
    ma.close(); mb.close()
    jax.tree.map(np.testing.assert_array_equal, pa, pb)
