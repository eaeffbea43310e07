"""HBM-resident dataset cache tests (data/device_cache.py).

The cache replaces the per-step host→device batch transfer (measured
~55 ms + bytes/60MB/s on the dev link — slower than the whole 256² train
step) with one bulk upload and in-jit sampling/augmentation."""

import jax
import jax.numpy as jnp
import numpy as np

from gdkvm_tpu.config.schema import load_config
from gdkvm_tpu.data import device_cache as dc
from gdkvm_tpu.data.pipeline import make_dataset


def _cfg(**kv):
    cfg = load_config("configs/smoke_synthetic.yaml")
    from gdkvm_tpu.config.schema import apply_overrides
    apply_overrides(cfg, [f"{k}={v}" for k, v in kv.items()])
    return cfg


def _cache(cfg):
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes)
    return dc.build_device_cache(ds), ds


def test_resolve_thresholds():
    cfg = _cfg()
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes)
    assert dc.resolve_device_cache(cfg.data, ds) is True      # tiny → auto on
    cfg.data.device_cache = "off"
    assert dc.resolve_device_cache(cfg.data, ds) is False
    cfg.data.device_cache = "on"
    assert dc.resolve_device_cache(cfg.data, ds) is True
    cfg.data.device_cache = "auto"
    cfg.data.device_cache_max_mb = 0
    assert dc.resolve_device_cache(cfg.data, ds) is False     # too big


def test_sample_no_augment_exact_gather():
    cfg = _cfg(**{"data.image_size": 32, "data.clip_len": 3})
    cache, ds = _cache(cfg)
    rng = jax.random.PRNGKey(3)
    b = dc.sample_batch(cache, rng, 4, augment=False)
    assert b.frames.shape == (4, 3, 32, 32, 1) and b.frames.dtype == jnp.uint8
    assert b.masks.shape == (4, 3, 32, 32)
    # Each sampled clip is byte-identical to some dataset clip.
    host = np.stack([ds[i][0] for i in range(len(ds))])
    got = np.asarray(b.frames)
    for j in range(4):
        assert any((got[j] == host[i]).all() for i in range(len(ds)))
    # Deterministic in rng.
    b2 = dc.sample_batch(cache, rng, 4, augment=False)
    np.testing.assert_array_equal(np.asarray(b.frames),
                                  np.asarray(b2.frames))


def test_augment_flip_consistency_and_occlusion():
    cfg = _cfg(**{"data.image_size": 32, "data.clip_len": 4})
    cache, ds = _cache(cfg)
    host_f = np.stack([ds[i][0] for i in range(len(ds))])
    host_m = np.stack([ds[i][1] for i in range(len(ds))])

    b = jax.jit(lambda c, r: dc.sample_batch(
        c, r, 8, augment=True, occlude_prob=1.0))(
        cache, jax.random.PRNGKey(7))
    f = np.asarray(b.frames)
    m = np.asarray(b.masks)
    flips = 0
    for j in range(8):
        # Mask must be some clip's mask or its W-flip (occlusion never
        # touches masks; photo aug never touches masks).
        direct = [(m[j] == host_m[i]).all() for i in range(len(ds))]
        flipped = [(m[j] == host_m[i][:, :, ::-1]).all()
                   for i in range(len(ds))]
        assert any(direct) or any(flipped), f"clip {j}: unknown mask"
        flips += any(flipped) and not any(direct)
        # occlude_prob=1: some frame t≥1 has a blanked block; frame 0 never.
        later_zero_rows = (f[j, 1:, :, :, 0] == 0).reshape(3, -1).mean(1)
        assert later_zero_rows.max() > 0.1, f"clip {j}: no occlusion"
    assert 0 < flips < 8, f"flip should be ~p=0.5, got {flips}/8"


def test_train_loop_with_cache_learns(tmp_path):
    from gdkvm_tpu.train.loop import train
    cfg = _cfg(**{"runtime.run_dir": str(tmp_path / "run"),
                  "data.device_cache": "on", "num_iterations": 25,
                  "train.log_every": 5, "train.eval_every": 1000,
                  "train.checkpoint_every": 1000,
                  "data.image_size": 32, "data.clip_len": 2,
                  "learning_rate": 2e-3})
    metrics = train(cfg)
    import json
    rows = [json.loads(l)
            for l in open(tmp_path / "run" / "metrics.jsonl")]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses[-1] < losses[0], losses


def test_cache_resume_exact(tmp_path):
    """Cached-path resume is bit-exact: sampling is a pure function of
    (rng, step)."""
    from gdkvm_tpu.io.checkpoint import CheckpointManager
    from gdkvm_tpu.models.gdkvm import GDKVM
    from gdkvm_tpu.train.loop import create_train_state, make_optimizer, \
        train

    common = {"data.device_cache": "on", "num_iterations": 4,
              "train.checkpoint_every": 2, "train.eval_every": 1000,
              "train.log_every": 1, "data.image_size": 32,
              "data.clip_len": 2, "parallel.data_axis": 1}
    cfg_a = _cfg(**common, **{"runtime.run_dir": str(tmp_path / "a")})
    train(cfg_a)
    cfg_b = _cfg(**common, **{"runtime.run_dir": str(tmp_path / "b")})
    train(cfg_b, max_steps=2)
    cfg_b2 = _cfg(**common, **{"runtime.run_dir": str(tmp_path / "b"),
                               "runtime.resume": True})
    train(cfg_b2)

    tpl = jax.device_get(create_train_state(
        cfg_a, GDKVM(cfg=cfg_a.model), make_optimizer(cfg_a),
        jax.random.PRNGKey(0)))
    ma = CheckpointManager(str(tmp_path / "a" / "checkpoints"))
    mb = CheckpointManager(str(tmp_path / "b" / "checkpoints"))
    pa, pb = ma.restore(tpl).params, mb.restore(tpl).params
    ma.close(); mb.close()
    jax.tree.map(np.testing.assert_array_equal, pa, pb)


def test_stochastic_dataset_not_auto_cached():
    """Datasets that sample a random window per access (EchoNet) must not
    be silently snapshot into the cache."""
    class FakeStochastic:
        stochastic_items = True
        def __len__(self): return 2
        def __getitem__(self, i):
            return (np.zeros((2, 8, 8, 1), np.uint8),
                    np.zeros((2, 8, 8), np.uint8),
                    np.ones((2,), np.float32))

    cfg = _cfg()
    ds = FakeStochastic()
    assert dc.resolve_device_cache(cfg.data, ds) is False   # auto → off
    cfg.data.device_cache = "on"
    import warnings
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert dc.resolve_device_cache(cfg.data, ds) is True
        assert any("FREEZES" in str(x.message) for x in w)


def _echonet(tmp_path, **cfg_kv):
    from gdkvm_tpu.data.echonet import materialize_synthetic_echonet
    root = str(tmp_path / "echo")
    materialize_synthetic_echonet(root, num_train=3, num_val=1,
                                  num_frames=12, image_size=32)
    cfg = _cfg(**{"data.dataset": "echonet", "data.data_path": root,
                  "data.image_size": 32, "data.clip_len": 4, **cfg_kv})
    ds = make_dataset(cfg.data, "train", cfg.model.num_classes)
    return cfg, ds


def test_video_cache_mode_and_sampling(tmp_path):
    cfg, ds = _echonet(tmp_path)
    assert dc.resolve_cache_mode(cfg.data, ds) == "video"
    cache = dc.build_video_cache(ds, clip_len=4)
    assert cache.frames.shape[0] == 3 and cache.frames.shape[1] >= 12
    b = jax.jit(lambda c, r: dc.sample_video_batch(
        c, r, 6, 4, augment=False))(cache, jax.random.PRNGKey(0))
    assert b.frames.shape == (6, 4, 32, 32, 1)
    assert b.masks.shape == (6, 4, 32, 32)
    # Every sampled window from a traced video contains >=1 valid frame
    # (EchoNet anchor bias): synthetic echonet traces ED/ES on each video.
    v = np.asarray(b.valid)
    assert (v.sum(axis=1) >= 1).all(), v
    # Windows are in-bounds slices of real videos: frames match a
    # contiguous slice of some full video.
    full = [ds.full_video(i) for i in range(len(ds))]
    f = np.asarray(b.frames)
    for j in range(6):
        ok = False
        for vf, _, _ in full:
            for s in range(vf.shape[0] - 3):
                if (f[j] == vf[s:s + 4]).all():
                    ok = True
        assert ok, f"window {j} is not a contiguous video slice"
    # Determinism in rng.
    b2 = dc.sample_video_batch(cache, jax.random.PRNGKey(0), 6, 4)
    np.testing.assert_array_equal(np.asarray(b.frames),
                                  np.asarray(b2.frames))
    b3 = dc.sample_video_batch(cache, jax.random.PRNGKey(1), 6, 4)
    assert not (np.asarray(b3.frames) == np.asarray(b.frames)).all()


def test_video_cache_train_smoke(tmp_path):
    from gdkvm_tpu.train.loop import train
    cfg, _ = _echonet(tmp_path,
                      **{"runtime.run_dir": str(tmp_path / "run"),
                         "num_iterations": 12, "train.log_every": 3,
                         "train.eval_every": 1000,
                         "train.checkpoint_every": 1000,
                         "learning_rate": 2e-3, "batch_size": 2})
    train(cfg)
    import json
    rows = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses[-1] < losses[0], losses


def test_video_cache_max_bytes_fallback(tmp_path):
    """True padded size over budget → build returns None (host fallback)
    instead of uploading an over-limit cache."""
    import warnings
    cfg, ds = _echonet(tmp_path)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cache = dc.build_video_cache(ds, clip_len=4, max_bytes=1024)
    assert cache is None
    assert any("falling back" in str(x.message) for x in w)
    assert dc.build_video_cache(ds, clip_len=4, max_bytes=1 << 30) is not None
