"""Packed (PCK) dataset tests: roundtrip, native gather, flip, errors."""

import numpy as np
import pytest

from gdkvm_tpu.data import packed
from gdkvm_tpu.data.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def pck_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("pck")
    ds = SyntheticDataset(num_clips=6, clip_len=4, image_size=32,
                          num_classes=2, seed=3)
    path = str(root / "train.pck")
    packed.write_pck(path, ds)
    return path, ds


def test_roundtrip_matches_source(pck_file):
    path, src = pck_file
    pds = packed.PackedDataset(path)
    assert len(pds) == 6
    assert (pds.clip_len, pds.height, pds.width) == (4, 32, 32)
    for i in (0, 3, 5):
        f, m, v = pds[i]
        sf, sm, sv = src[i]
        np.testing.assert_array_equal(f, sf)
        np.testing.assert_array_equal(m, sm)
        np.testing.assert_array_equal(v, sv)
    pds.close()


def test_native_library_loads():
    """The C++ gather library must build and load in this environment."""
    lib = packed._load_native()
    assert lib is not None, "native/libpck.so failed to build or load"


def test_gather_batch_and_flip(pck_file):
    path, src = pck_file
    pds = packed.PackedDataset(path)
    idx = np.array([1, 4, 2], np.int32)
    frames, masks, valid = pds.gather(idx)
    assert frames.shape == (3, 4, 32, 32, 1)
    sf, sm, sv = src[4]
    np.testing.assert_array_equal(frames[1], sf)
    # Flip: must equal the horizontally mirrored source.
    frames_f, masks_f, _ = pds.gather(idx, np.array([0, 1, 0], np.uint8))
    np.testing.assert_array_equal(frames_f[0], frames[0])
    np.testing.assert_array_equal(frames_f[1], sf[:, :, ::-1])
    np.testing.assert_array_equal(masks_f[1], sm[:, :, ::-1])
    pds.close()


def test_numpy_fallback_matches_native(pck_file, monkeypatch):
    path, _ = pck_file
    native = packed.PackedDataset(path)
    fallback = packed.PackedDataset(path)
    fallback._native = None           # force the pure-numpy path
    idx = np.array([0, 5], np.int32)
    flips = np.array([1, 0], np.uint8)
    fn, mn, vn = native.gather(idx, flips)
    ff, mf, vf = fallback.gather(idx, flips)
    np.testing.assert_array_equal(fn, ff)
    np.testing.assert_array_equal(mn, mf)
    np.testing.assert_array_equal(vn, vf)
    native.close()


def test_gather_bad_index(pck_file):
    path, _ = pck_file
    pds = packed.PackedDataset(path)
    with pytest.raises(IndexError):
        pds.gather(np.array([99], np.int32))
    pds.close()


def test_missing_file_message(tmp_path):
    with pytest.raises(FileNotFoundError, match="gdkvm pack"):
        packed.PackedDataset(str(tmp_path / "nope.pck"))


def test_pipeline_integration(pck_file):
    from gdkvm_tpu.config.schema import DataConfig
    from gdkvm_tpu.data.pipeline import batch_iterator, make_dataset
    import os
    path, _ = pck_file
    cfg = DataConfig(dataset="packed", data_path=os.path.dirname(path))
    ds = make_dataset(cfg, "train", num_classes=2)
    it = batch_iterator(ds, batch_size=2, augment=True, seed=0)
    b = next(it)
    assert b.frames.shape == (2, 4, 32, 32, 1)
    assert b.masks.shape == (2, 4, 32, 32)


def test_packed_iterator_applies_photometric_aug(tmp_path):
    """The packed fast path must apply gain/gamma (it silently skipped it
    before): with augment=True some clips differ photometrically from the
    plain gather while masks stay flip-or-identity."""
    import numpy as np
    from gdkvm_tpu.data.packed import PackedDataset, write_pck
    from gdkvm_tpu.data.pipeline import batch_iterator, make_dataset
    from gdkvm_tpu.data.synthetic import SyntheticDataset

    src = SyntheticDataset(num_clips=8, clip_len=2, image_size=24,
                           num_classes=2, seed=0)
    path = str(tmp_path / "t.pck")
    write_pck(path, src)
    ds = PackedDataset(path, num_workers=1)

    it_plain = batch_iterator(ds, 8, shuffle=False, augment=False,
                              seed=3, num_workers=1)
    it_aug = batch_iterator(ds, 8, shuffle=False, augment=True,
                            seed=3, num_workers=1)
    plain = next(it_plain)
    aug = next(it_aug)
    photo_changed = 0
    for j in range(8):
        m = np.asarray(aug.masks[j])
        base = np.asarray(plain.masks[j])
        flipped = bool((m == base[:, :, ::-1]).all() and not
                       (m == base).all())
        f_base = np.asarray(plain.frames[j])
        f_base = f_base[:, :, ::-1] if flipped else f_base
        f_aug = np.asarray(aug.frames[j])
        if not (f_aug == f_base).all():
            # Photometric LUT: value-dependent only — equal input pixels
            # must map to equal outputs.
            lut_ok = True
            for v in np.unique(f_base):
                outs = np.unique(f_aug[f_base == v])
                lut_ok &= outs.size == 1
            assert lut_ok, f"clip {j}: not a per-value LUT transform"
            photo_changed += 1
    assert photo_changed > 0, "gamma/gain augmentation never applied"
