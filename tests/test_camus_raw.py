"""Raw CAMUS (MetaImage) reader + converter tests."""

import numpy as np
import pytest

from gdkvm_tpu.data import camus_raw
from gdkvm_tpu.data.camus import CamusDataset
from gdkvm_tpu.data.synthetic import generate_clip


def _make_raw_patient(root, pat, t=14, hw=96, with_gt=True, seed=0,
                      spacing=None):
    pdir = root / pat
    pdir.mkdir(parents=True, exist_ok=True)
    frames, masks = generate_clip(seed, t, hw, hw, num_classes=4)
    for view in ("2CH", "4CH"):
        camus_raw.write_mhd(str(pdir / f"{pat}_{view}_half_sequence.mhd"),
                            frames[..., 0], spacing=spacing)
        if with_gt:
            camus_raw.write_mhd(
                str(pdir / f"{pat}_{view}_half_sequence_gt.mhd"), masks,
                spacing=spacing)
    return frames, masks


def test_mhd_roundtrip(tmp_path):
    vol = np.random.default_rng(0).integers(0, 255, (5, 32, 48), np.uint8)
    camus_raw.write_mhd(str(tmp_path / "x.mhd"), vol)
    back, hdr = camus_raw.read_mhd(str(tmp_path / "x.mhd"))
    np.testing.assert_array_equal(back, vol)
    assert hdr["DimSize"] == "48 32 5"


def test_convert_raw_camus(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "processed"
    for i in range(3):
        _make_raw_patient(raw, f"patient{i + 1:04d}", seed=i)
    n = camus_raw.convert_raw_camus(str(raw), str(out), image_size=64,
                                    clip_len=6)
    assert n == 6          # 3 patients × 2 views
    # Loadable through the processed-artifact dataset.
    found = []
    for split in ("train", "val"):
        try:
            ds = CamusDataset(str(out), split, image_size=64, clip_len=6)
            found.extend([split] * len(ds))
            frames, masks, valid = ds[0]
            assert frames.shape == (6, 64, 64, 1)
            assert masks.max() <= 3 and (masks == 1).sum() > 10
            assert valid.sum() == 6
        except FileNotFoundError:
            pass
    assert len(found) == 6


def test_mhd_spacing_roundtrip(tmp_path):
    """ElementSpacing written → parsed back in header x-fastest order."""
    vol = np.zeros((4, 16, 24), np.uint8)
    camus_raw.write_mhd(str(tmp_path / "s.mhd"), vol,
                        spacing=(0.154, 0.308, 1.0))
    _, hdr = camus_raw.read_mhd(str(tmp_path / "s.mhd"))
    assert camus_raw.element_spacing(hdr) == (0.154, 0.308, 1.0)
    # Headers without spacing report None (pixel-units fallback).
    camus_raw.write_mhd(str(tmp_path / "n.mhd"), vol)
    _, hdr = camus_raw.read_mhd(str(tmp_path / "n.mhd"))
    assert camus_raw.element_spacing(hdr) is None


def test_converter_persists_physical_spacing(tmp_path):
    """The converter carries ElementSpacing through the resize into each
    clip's meta.json, and the dataset rescales it to its own image_size
    (VERDICT r2 item 1: the processed layout must not discard spacing)."""
    raw = tmp_path / "raw"
    out = tmp_path / "proc"
    # Raw-CAMUS-style anisotropic spacing: (sx, sy, st) mm, 96×96 frames.
    _make_raw_patient(raw, "patient0001", hw=96, spacing=(0.308, 0.154, 1.0))
    n = camus_raw.convert_raw_camus(str(raw), str(out), image_size=64,
                                    clip_len=6, val_fraction=0.0)
    assert n == 2
    ds = CamusDataset(str(out), "train", image_size=64, clip_len=6)
    sp = ds.spacing(0)
    assert sp is not None
    # meta stores [sy, sx] scaled by orig/target = 96/64.
    assert sp[0] == pytest.approx(0.154 * 96 / 64)
    assert sp[1] == pytest.approx(0.308 * 96 / 64)
    # A loader at a different image_size rescales mm-per-pixel again.
    ds32 = CamusDataset(str(out), "train", image_size=32, clip_len=6)
    sp32 = ds32.spacing(0)
    assert sp32[0] == pytest.approx(sp[0] * 64 / 32)
    # Raw files without spacing → no sidecar → None (pixel units).
    raw2 = tmp_path / "raw2"
    out2 = tmp_path / "proc2"
    _make_raw_patient(raw2, "patient0001", hw=96)
    camus_raw.convert_raw_camus(str(raw2), str(out2), image_size=64,
                                clip_len=6, val_fraction=0.0)
    ds2 = CamusDataset(str(out2), "train", image_size=64, clip_len=6)
    assert ds2.spacing(0) is None


def test_convert_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError, match="patientNNNN"):
        camus_raw.convert_raw_camus(str(tmp_path), str(tmp_path / "o"))


def test_official_split_rule():
    from gdkvm_tpu.data.camus_raw import official_camus_split
    assert official_camus_split("patient0001") == "train"
    assert official_camus_split("patient0400") == "train"
    assert official_camus_split("patient0401") == "val"
    assert official_camus_split("patient0450") == "val"
    assert official_camus_split("patient0451") == "test"
    assert official_camus_split("patient0500") == "test"


def test_convert_raw_camus_official_split(tmp_path):
    """--split-mode official routes patients by number, both views
    together."""
    import numpy as np
    from gdkvm_tpu.data.camus_raw import convert_raw_camus, write_mhd
    raw = tmp_path / "raw"
    for pat in ("patient0399", "patient0402", "patient0455"):
        pdir = raw / pat
        pdir.mkdir(parents=True)
        for view in ("2CH", "4CH"):
            vol = np.random.default_rng(0).integers(
                0, 255, (6, 32, 32)).astype(np.uint8)
            write_mhd(str(pdir / f"{pat}_{view}_half_sequence.mhd"), vol)
            write_mhd(str(pdir / f"{pat}_{view}_half_sequence_gt.mhd"),
                      (vol > 128).astype(np.uint8))
    out = tmp_path / "proc"
    n = convert_raw_camus(str(raw), str(out), image_size=32, clip_len=4,
                          split_mode="official")
    assert n == 6
    import os
    assert sorted(os.listdir(out / "train")) == [
        "patient0399_2CH", "patient0399_4CH"]
    assert sorted(os.listdir(out / "val")) == [
        "patient0402_2CH", "patient0402_4CH"]
    assert sorted(os.listdir(out / "test")) == [
        "patient0455_2CH", "patient0455_4CH"]
