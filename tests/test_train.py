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


def test_bootstrapped_ce_laws():
    """Bootstrapped (top-k hard-pixel) CE — the lineage default the loss
    module names (SURVEY §2.2 Loss; VERDICT r4 item 2):
    (a) ratio=1 or λ=0 ≡ plain CE exactly;
    (b) at λ=1 the hard-pixel mean ≥ the all-pixel mean (top-k selects
        the worst pixels), strictly > when errors are concentrated;
    (c) λ blends linearly between the two."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, (1, 2, 8, 8)), jnp.int32)
    valid = jnp.ones((1, 2))
    plain = losses.segmentation_loss(logits, labels, valid)[1]["ce"]
    same = losses.segmentation_loss(
        logits, labels, valid, bootstrap_ratio=1.0,
        bootstrap_weight=1.0)[1]["ce"]
    np.testing.assert_allclose(float(plain), float(same), rtol=0, atol=0)
    lam0 = losses.segmentation_loss(
        logits, labels, valid, bootstrap_ratio=0.25,
        bootstrap_weight=0.0)[1]["ce"]
    np.testing.assert_allclose(float(plain), float(lam0), atol=1e-7)
    hard = losses.segmentation_loss(
        logits, labels, valid, bootstrap_ratio=0.25,
        bootstrap_weight=1.0)[1]["ce"]
    assert float(hard) > float(plain)
    mid = losses.segmentation_loss(
        logits, labels, valid, bootstrap_ratio=0.25,
        bootstrap_weight=0.5)[1]["ce"]
    np.testing.assert_allclose(float(mid), 0.5 * (float(plain) +
                                                  float(hard)), rtol=1e-6)
    # Hard-pixel selection is real: with ONE wrong pixel per frame, top-k
    # at ratio=1/64 isolates exactly that pixel's CE.
    easy = jnp.zeros((1, 1, 8, 8, 2)).at[..., 1].set(10.0)
    lab = jnp.ones((1, 1, 8, 8), jnp.int32).at[0, 0, 3, 3].set(0)
    v1 = jnp.ones((1, 1))
    ce_hard = losses.segmentation_loss(
        easy, lab, v1, bootstrap_ratio=1 / 64,
        bootstrap_weight=1.0)[1]["ce"]
    assert float(ce_hard) > 9.0          # ≈ the 10-logit margin CE
    ce_mean = losses.segmentation_loss(easy, lab, v1)[1]["ce"]
    assert float(ce_mean) < 0.5          # diluted 64×


def test_bootstrapped_ce_masked_grad_matches_literal_topk():
    """The shipped selection (stop-grad threshold + mask) must have the
    SAME gradient as the literal top-k mean at non-degenerate inputs —
    top-k selection is piecewise constant, so masking it out of the
    gradient is exact a.e., not an approximation (the masked backward is
    an elementwise multiply instead of the top_k adjoint's scatter; the
    device cost A/B is BASELINE.md r5.5)."""
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, (1, 2, 8, 8)), jnp.int32)
    valid = jnp.ones((1, 2))

    def shipped(lg):
        return losses.segmentation_loss(
            lg, labels, valid, bootstrap_ratio=0.25,
            bootstrap_weight=1.0)[1]["ce"]

    def literal(lg):
        lgm = jnp.transpose(lg, (0, 1, 4, 2, 3))
        logp = jax.nn.log_softmax(lgm, axis=2)
        onehot = (labels[:, :, None] ==
                  jnp.arange(3).reshape(1, 1, 3, 1, 1)).astype(logp.dtype)
        pix = (-(logp * onehot).sum(2)).reshape(1, 2, 64)
        top = jax.lax.top_k(pix, 16)[0]            # 16 = 0.25 · 64
        return (top.mean(-1) * valid).sum() / valid.sum()

    np.testing.assert_allclose(float(shipped(logits)),
                               float(literal(logits)), rtol=1e-6)
    g1 = jax.grad(shipped)(logits)
    g2 = jax.grad(literal)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-7)


def test_bootstrap_schedule_ramp():
    s = losses.bootstrap_schedule
    assert float(s(0, 1000, 0.2, 0.6)) == 0.0
    assert float(s(200, 1000, 0.2, 0.6)) == 0.0
    np.testing.assert_allclose(float(s(400, 1000, 0.2, 0.6)), 0.5)
    assert float(s(600, 1000, 0.2, 0.6)) == 1.0
    assert float(s(999, 1000, 0.2, 0.6)) == 1.0


def test_bootstrapped_ce_grad_flows_and_trains():
    """A train step with bootstrap_ratio<1 produces finite loss/grads and
    learns on the smoke config (the knob is recipe-safe)."""
    cfg = smoke_cfg(**{"data.image_size": 32, "data.clip_len": 2,
                       "train.bootstrap_ratio": 0.25,
                       "train.bootstrap_start": 0.0,
                       "train.bootstrap_end": 0.01})
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
    for _ in range(30):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
        assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first


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


def test_ema_tracking_and_eval_params():
    """EMA shadow follows params with the Polyak update and is preferred by
    eval_params when enabled."""
    from gdkvm_tpu.train.loop import eval_params
    cfg = smoke_cfg(**{"train.ema_decay": 0.9, "num_iterations": 10,
                       "data.image_size": 32, "data.clip_len": 2})
    model = GDKVM(cfg=cfg.model)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    assert state.ema_params is not None
    p0 = jax.device_get(state.params)
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes)
    frames, masks, valid = ds[0]
    batch = Batch(frames=jnp.asarray(frames)[None],
                  masks=jnp.asarray(masks)[None],
                  valid=jnp.asarray(valid)[None])
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0)
    # Run past LR warmup (schedule starts at 0) so params actually move;
    # track the expected shadow alongside.
    ema_ref = p0
    for _ in range(3):
        state, _ = step(state, batch)
        p = jax.device_get(state.params)
        ema_ref = jax.tree.map(lambda e, q: e + 0.1 * (q - e), ema_ref, p)
    e = jax.device_get(state.ema_params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6,
                                                         atol=1e-7),
                 e, ema_ref)
    # Non-trivial: params moved and the shadow lags them.
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), p0, p)))
    lag = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), e, p)))
    assert moved > 0.0 and lag > 0.0
    assert eval_params(state, cfg) is state.ema_params
    cfg.eval_stage.use_ema = False
    assert eval_params(state, cfg) is state.params
    # Disabled: no shadow tracked, checkpoint tree unchanged.
    cfg2 = smoke_cfg()
    s2 = create_train_state(cfg2, model, make_optimizer(cfg2),
                            jax.random.PRNGKey(0))
    assert s2.ema_params is None
    assert eval_params(s2, cfg2) is s2.params


def test_gradient_accumulation_effective_batch():
    """accum_steps=2: params frozen on the first micro-step, and the
    post-accumulation update equals a single step on the averaged batch."""
    # warmup chosen so both paths see identical LRs at applied update
    # counts 0 (LR=0) and 1 (=peak, end of a 1-update warmup): the
    # schedule is horizon-scaled by accum_steps (applied-update counts),
    # so warmup_iterations=2 here ≡ warmup_iterations=1 in the reference.
    cfg_a = smoke_cfg(**{"train.accum_steps": 2, "train.prompt_prob": 0.0,
                         "data.image_size": 32, "data.clip_len": 2,
                         "train.grad_clip": 1e9,
                         "train.warmup_iterations": 2})
    model = GDKVM(cfg=cfg_a.model)
    tx_a = make_optimizer(cfg_a)
    state_a = create_train_state(cfg_a, model, tx_a, jax.random.PRNGKey(0))
    ds = make_dataset(cfg_a.data, "train", cfg_a.model.num_classes)
    f0, m0, v0 = ds[0]
    f1, m1, v1 = ds[1 % len(ds)]
    b0 = Batch(frames=jnp.asarray(f0)[None], masks=jnp.asarray(m0)[None],
               valid=jnp.asarray(v0)[None])
    b1 = Batch(frames=jnp.asarray(f1)[None], masks=jnp.asarray(m1)[None],
               valid=jnp.asarray(v1)[None])
    step_a = jax.jit(make_train_step(model, tx_a, cfg_a))
    p_init = jax.device_get(state_a.params)
    # Two full accumulation cycles (the LR schedule warms up from 0, so the
    # first applied update is a no-op; the second moves params).
    s = state_a
    for i in range(4):
        s, _ = step_a(s, b0 if i % 2 == 0 else b1)
        if i == 0:
            # Mid-accumulation: update is withheld.
            jax.tree.map(np.testing.assert_array_equal, p_init,
                         jax.device_get(s.params))
    p_end = jax.device_get(s.params)
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), p_init, p_end))
    assert max(changed) > 0.0                                   # applied
    # Equivalent two steps on the concatenated (batch-2) data.  Grad of
    # the mean loss over the stacked batch equals the mean of per-clip
    # grads (both clips fully valid), which is what MultiSteps applies.
    # prompt_prob=0 keeps the step deterministic and batch-independent.
    cfg_b = smoke_cfg(**{"train.prompt_prob": 0.0,
                         "data.image_size": 32, "data.clip_len": 2,
                         "train.grad_clip": 1e9,
                         "train.warmup_iterations": 1})
    tx_b = make_optimizer(cfg_b)
    state_b = create_train_state(cfg_b, model, tx_b, jax.random.PRNGKey(0))
    bb = Batch(frames=jnp.concatenate([b0.frames, b1.frames]),
               masks=jnp.concatenate([b0.masks, b1.masks]),
               valid=jnp.concatenate([b0.valid, b1.valid]))
    step_b = jax.jit(make_train_step(model, tx_b, cfg_b))
    s_ref, _ = step_b(state_b, bb)
    s_ref, _ = step_b(s_ref, bb)
    p_ref = jax.device_get(s_ref.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4,
                                                         atol=5e-6),
                 p_end, p_ref)


def test_ema_withheld_during_accumulation():
    """With accum_steps=k the EMA shadow only moves on applied updates —
    otherwise the averaging horizon silently shrinks by k."""
    cfg = smoke_cfg(**{"train.accum_steps": 2, "train.ema_decay": 0.9,
                       "train.prompt_prob": 0.0, "data.image_size": 32,
                       "data.clip_len": 2, "train.warmup_iterations": 2})
    model = GDKVM(cfg=cfg.model)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes)
    f, m, v = ds[0]
    batch = Batch(frames=jnp.asarray(f)[None], masks=jnp.asarray(m)[None],
                  valid=jnp.asarray(v)[None])
    step = jax.jit(make_train_step(model, tx, cfg))
    e0 = jax.device_get(state.ema_params)
    s, _ = step(state, batch)           # micro-step 1: withheld
    e1 = jax.device_get(s.ema_params)
    jax.tree.map(np.testing.assert_array_equal, e0, e1)
    # Run 3 more micro-steps (2 applied updates total; the 2nd moves
    # params since LR reaches peak) — the shadow must have moved.
    for _ in range(3):
        s, _ = step(s, batch)
    e2 = jax.device_get(s.ema_params)
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), e0, e2)))
    assert moved > 0.0


def test_lr_schedule_scales_with_accumulation():
    """The cosine horizon counts APPLIED updates: accum_steps=k over
    num_iterations micro-steps must finish the schedule, not stop at 1/k."""
    import optax
    cfg1 = smoke_cfg(num_iterations=100)
    cfgk = smoke_cfg(num_iterations=100, **{"train.accum_steps": 4})
    # Reconstruct the schedules the optimizers embed.
    def sched(cfg):
        t = cfg.train
        k = max(t.accum_steps, 1)
        total = max(t.num_iterations // k, 1)
        warmup = max(min(t.warmup_iterations // k, total // 2), 1)
        return optax.warmup_cosine_decay_schedule(
            0.0, t.learning_rate, warmup, max(total, warmup + 1),
            t.learning_rate * 0.05)
    end1 = float(sched(cfg1)(100))
    endk = float(sched(cfgk)(25))       # 100 micro-steps = 25 applied
    assert abs(end1 - cfg1.train.learning_rate * 0.05) < 1e-9
    assert abs(endk - cfgk.train.learning_rate * 0.05) < 1e-9
