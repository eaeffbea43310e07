"""Data layer tests: synthetic generator, CAMUS/EchoNet layouts, pipeline."""

import numpy as np
import pytest

from gdkvm_tpu.config.schema import DataConfig
from gdkvm_tpu.data import pipeline
from gdkvm_tpu.data.synthetic import SyntheticDataset, generate_clip


def test_synthetic_clip_properties():
    frames, masks = generate_clip(0, num_frames=10, height=112, width=112,
                                  num_classes=4)
    assert frames.shape == (10, 112, 112, 1) and frames.dtype == np.uint8
    assert masks.shape == (10, 112, 112) and masks.dtype == np.uint8
    assert set(np.unique(masks)).issubset({0, 1, 2, 3})
    assert (masks == 1).sum() > 50, "LV cavity should be present"
    # Deterministic by seed.
    f2, m2 = generate_clip(0, 10, 112, 112, 4)
    np.testing.assert_array_equal(frames, f2)
    # Different seeds differ.
    f3, _ = generate_clip(1, 10, 112, 112, 4)
    assert (frames != f3).any()


def test_batch_iterator_shapes():
    ds = SyntheticDataset(num_clips=8, clip_len=4, image_size=32,
                          num_classes=2)
    it = pipeline.batch_iterator(ds, batch_size=4, seed=0, num_workers=2)
    b = next(it)
    assert b.frames.shape == (4, 4, 32, 32, 1)
    assert b.masks.shape == (4, 4, 32, 32)
    assert b.valid.shape == (4, 4)
    assert b.frames.dtype == np.uint8


def test_camus_roundtrip(tmp_path):
    from gdkvm_tpu.data.camus import CamusDataset, materialize_synthetic_camus
    root = str(tmp_path / "camus")
    materialize_synthetic_camus(root, num_train=2, num_val=1,
                                image_size=64, clip_len=3, num_classes=4)
    ds = CamusDataset(root, "train", image_size=64, clip_len=3,
                      num_classes=4)
    assert len(ds) == 2
    frames, masks, valid = ds[0]
    assert frames.shape == (3, 64, 64, 1)
    assert masks.shape == (3, 64, 64)
    assert valid.tolist() == [1.0, 1.0, 1.0]
    assert masks.max() <= 3
    assert (masks == 1).sum() > 10


def test_camus_missing_dir_message(tmp_path):
    from gdkvm_tpu.data.camus import CamusDataset
    with pytest.raises(FileNotFoundError, match="materialize_synthetic"):
        CamusDataset(str(tmp_path / "nope"), "train")


def test_echonet_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from gdkvm_tpu.data.echonet import EchoNetDataset, \
        materialize_synthetic_echonet
    root = str(tmp_path / "echonet")
    materialize_synthetic_echonet(root, num_train=2, num_val=1,
                                  num_frames=12, image_size=64)
    ds = EchoNetDataset(root, "train", image_size=64, clip_len=6,
                        num_classes=2, seed=0)
    assert len(ds) == 2
    frames, masks, valid = ds[0]
    assert frames.shape == (6, 64, 64, 1)
    assert masks.shape == (6, 64, 64)
    # At least one traced frame should be in the sampled clip.
    assert valid.sum() >= 1
    traced = masks[valid.astype(bool)]
    assert (traced == 1).sum() > 10, "LV trace mask should be filled"


def test_make_dataset_factory():
    cfg = DataConfig(dataset="synthetic", image_size=32, clip_len=2)
    ds = pipeline.make_dataset(cfg, "train", num_classes=2)
    assert len(ds) > 0
    with pytest.raises(ValueError, match="unknown dataset"):
        pipeline.make_dataset(DataConfig(dataset="bogus"), "train", 2)


def test_prefetch_to_device():
    import jax
    ds = SyntheticDataset(num_clips=4, clip_len=2, image_size=16)
    it = pipeline.batch_iterator(ds, batch_size=2, loop=False,
                                 num_workers=1)
    batches = list(pipeline.prefetch_to_device(it, size=2))
    assert len(batches) == 2
    assert isinstance(batches[0].frames, jax.Array)


def test_batch_iterator_deterministic_and_fast_forward():
    """Stream is a pure function of (seed, step): identical across worker
    counts, and start_step=k reproduces the tail of a straight run."""
    ds = SyntheticDataset(num_clips=10, clip_len=2, image_size=16)

    def take(n, **kw):
        it = pipeline.batch_iterator(ds, batch_size=3, augment=True,
                                     occlude_prob=0.5, seed=7, **kw)
        return [next(it) for _ in range(n)]

    a = take(7, num_workers=1)
    b = take(7, num_workers=4)
    for x, y in zip(a, b):                      # thread-count invariance
        np.testing.assert_array_equal(x.frames, y.frames)
        np.testing.assert_array_equal(x.masks, y.masks)

    c = take(3, num_workers=2, start_step=4)    # resume fast-forward
    for x, y in zip(a[4:], c):
        np.testing.assert_array_equal(x.frames, y.frames)
        np.testing.assert_array_equal(x.masks, y.masks)


def test_synthetic_difficulty_knob():
    """difficulty=0 is the legacy generator; >0 degrades the image while
    masks keep tracking the (now drifting) anatomy deterministically."""
    from gdkvm_tpu.data import synthetic as s
    f0a, m0a = s.generate_clip(11, 6, 64, 64, 4, difficulty=0.0)
    f0b, m0b = s.generate_clip(11, 6, 64, 64, 4)   # default = 0
    assert np.array_equal(f0a, f0b) and np.array_equal(m0a, m0b)
    fh1, mh1 = s.generate_clip(11, 6, 64, 64, 4, difficulty=1.0)
    fh2, mh2 = s.generate_clip(11, 6, 64, 64, 4, difficulty=1.0)
    assert np.array_equal(fh1, fh2) and np.array_equal(mh1, mh2)
    assert not np.array_equal(fh1, f0a)
    # Artifacts darken/attenuate the image on average (shadow + TGC decay).
    assert fh1.mean() < f0a.mean()
    # Probe drift moves the true anatomy → masks differ from the easy clip.
    assert (mh1 != m0a).mean() > 0.01
    # All classes still present inside the cone.
    assert set(np.unique(mh1)) == {0, 1, 2, 3}


def test_prefetch_abandoned_consumer_stops_producer():
    """Breaking out of a prefetch loop cancels the producer thread (no
    unhandled device_put at teardown) and surfaces producer exceptions."""
    import threading
    import time
    ds = SyntheticDataset(num_clips=8, clip_len=2, image_size=16)
    it = pipeline.batch_iterator(ds, batch_size=2, loop=True, num_workers=1)
    n_before = threading.active_count()
    gen = pipeline.prefetch_to_device(it, size=1)
    next(gen)
    gen.close()                               # abandon mid-stream
    deadline = time.time() + 5
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)

    def boom():
        yield from ()
        raise RuntimeError("decode exploded")

    def gen_boom():
        b = next(pipeline.batch_iterator(ds, batch_size=2, loop=False,
                                         num_workers=1))
        yield b
        raise RuntimeError("decode exploded")

    g = pipeline.prefetch_to_device(gen_boom(), size=2)
    next(g)
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(g)
