"""Multi-chip tests on the emulated 8-device CPU mesh (SURVEY §4.2d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdkvm_tpu.config.schema import load_config
from gdkvm_tpu.data.pipeline import Batch
from gdkvm_tpu.models.gdkvm import GDKVM
from gdkvm_tpu.parallel import batch_sharding, make_mesh, param_shardings, \
    replicated
from gdkvm_tpu.train.loop import create_train_state, make_optimizer, \
    make_train_step, TrainState


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()


def test_make_mesh_shapes(eight_devices):
    mesh = make_mesh()                      # all devices on data axis
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=5, model=2)


def _tiny():
    cfg = load_config("configs/smoke_synthetic.yaml")
    cfg.data.image_size = 32
    cfg.data.clip_len = 2
    cfg.train.batch_size = 8
    return cfg


def test_data_parallel_train_step(eight_devices):
    """One sharded train step over the ('data',) axis: batch split 8 ways,
    gradient all-reduce implicit in jit."""
    cfg = _tiny()
    mesh = make_mesh()
    model = GDKVM(cfg=cfg.model)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated(mesh))

    b = cfg.train.batch_size
    rng = np.random.default_rng(0)
    batch = Batch(
        frames=rng.integers(0, 255, (b, 2, 32, 32, 1), np.uint8),
        masks=rng.integers(0, 2, (b, 2, 32, 32)).astype(np.uint8),
        valid=np.ones((b, 2), np.float32),
    )
    batch = jax.device_put(batch, batch_sharding(mesh))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0)
    with mesh:
        state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # Params remain replicated (same value visible on every device).
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_data_parallel_matches_single_device(eight_devices):
    """The sharded step computes the same update as the unsharded one."""
    cfg = _tiny()
    model = GDKVM(cfg=cfg.model)
    tx = make_optimizer(cfg)
    b = cfg.train.batch_size
    rng = np.random.default_rng(1)
    batch = Batch(
        frames=rng.integers(0, 255, (b, 2, 32, 32, 1), np.uint8),
        masks=rng.integers(0, 2, (b, 2, 32, 32)).astype(np.uint8),
        valid=np.ones((b, 2), np.float32),
    )
    step_fn = make_train_step(model, tx, cfg)

    # Single device.
    state1 = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    state1, m1 = jax.jit(step_fn)(state1, jax.device_put(batch))

    # 8-way data parallel.
    mesh = make_mesh()
    state8 = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    state8 = jax.device_put(state8, replicated(mesh))
    with mesh:
        state8, m8 = jax.jit(step_fn)(
            state8, jax.device_put(batch, batch_sharding(mesh)))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    p1 = jax.tree.leaves(jax.device_get(state1.params))
    p8 = jax.tree.leaves(jax.device_get(state8.params))
    for a, c in zip(p1, p8):
        np.testing.assert_allclose(a, c, rtol=2e-4, atol=2e-5)


def test_ts8_subpixel_head_on_mesh(eight_devices):
    """The ts8-shaped head (2-entry kpff_channels → sub-pixel depth-to-
    space) under sharding propagation (VERDICT r4 item 6): its
    reshape/transpose chain (models/decoder.py) is exactly the op class
    that can trip propagation, and was only ever exercised single-device.
    Covers: sharded train step (finite loss, single-device parity), and
    mesh serving bit-exact vs stream_video."""
    from gdkvm_tpu.eval.streaming import stream_video
    from gdkvm_tpu.serve import BatchingEngine

    cfg = _tiny()
    cfg.model.kpff_channels = [24, 16]          # 2 entries → sub-pixel head
    model = GDKVM(cfg=cfg.model)
    tx = make_optimizer(cfg)
    b = cfg.train.batch_size
    rng = np.random.default_rng(3)
    batch = Batch(
        frames=rng.integers(0, 255, (b, 2, 32, 32, 1), np.uint8),
        masks=rng.integers(0, 2, (b, 2, 32, 32)).astype(np.uint8),
        valid=np.ones((b, 2), np.float32),
    )
    step_fn = make_train_step(model, tx, cfg)

    state1 = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    params0 = state1.params
    state1, m1 = jax.jit(step_fn)(state1, jax.device_put(batch))

    mesh = make_mesh()                          # 8-way data parallel
    state8 = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    state8 = jax.device_put(state8, replicated(mesh))
    with mesh:
        state8, m8 = jax.jit(step_fn)(
            state8, jax.device_put(batch, batch_sharding(mesh)))
    assert np.isfinite(float(m8["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)

    # dp × tp: the depth-to-space reshape must also compose with the
    # model-axis head sharding.
    mesh2 = make_mesh(data=4, model=2)
    shardings = param_shardings(mesh2, params0)
    params_tp = jax.device_put(params0, shardings)
    frames = jax.device_put(
        batch.frames[:4].astype(np.float32) / 255.0,
        jax.sharding.NamedSharding(mesh2,
                                   jax.sharding.PartitionSpec("data")))
    with mesh2:
        logits, _ = jax.jit(model.apply)(params_tp, frames)
    assert np.isfinite(np.asarray(logits)).all()

    # Mesh serving with the sub-pixel head: bit-exact vs stream_video.
    video = rng.integers(0, 255, (6, 32, 32, 1), np.uint8)
    eng = BatchingEngine(model=model, params=params0, streams=4,
                         chunk=2, image_size=32,
                         mesh=make_mesh(data=4, model=1))
    try:
        sid = eng.open_session()["session"]
        got = eng.infer(sid, video)
    finally:
        eng.close()
    want = stream_video(model, params0, video, chunk=2)
    np.testing.assert_array_equal(got, want)


def test_model_axis_shards_lkva(eight_devices):
    """With model=2, LKVA head projections shard over the model axis and
    the forward still runs (tensor parallelism plumbed end-to-end)."""
    cfg = _tiny()
    mesh = make_mesh(data=4, model=2)
    model = GDKVM(cfg=cfg.model)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    shardings = param_shardings(mesh, state.params)

    # At least the LKVA q/k/v kernels must be model-sharded.
    flat_s = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded = ["/".join(str(p) for p in path) for path, s in flat_s
               if not s.is_fully_replicated]
    assert any("q_proj" in s for s in sharded), sharded
    assert any("out_proj" in s for s in sharded), sharded

    params = jax.device_put(state.params, shardings)
    rng = np.random.default_rng(2)
    frames = jax.device_put(
        rng.integers(0, 255, (4, 2, 32, 32, 1), np.uint8).astype(np.float32)
        / 255.0,
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    with mesh:
        logits, st = jax.jit(model.apply)(params, frames)
    assert np.isfinite(np.asarray(logits)).all()

    # Parity with fully-replicated single-device execution.
    logits1, _ = jax.jit(model.apply)(state.params, jax.device_get(frames))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits1),
                               rtol=2e-4, atol=2e-4)
