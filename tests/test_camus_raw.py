"""Raw CAMUS (MetaImage) reader + converter tests."""

import numpy as np
import pytest

from gdkvm_tpu.data import camus_raw
from gdkvm_tpu.data.camus import CamusDataset
from gdkvm_tpu.data.synthetic import generate_clip


def _make_raw_patient(root, pat, t=14, hw=96, with_gt=True, seed=0):
    import os
    pdir = root / pat
    pdir.mkdir(parents=True, exist_ok=True)
    frames, masks = generate_clip(seed, t, hw, hw, num_classes=4)
    for view in ("2CH", "4CH"):
        camus_raw.write_mhd(str(pdir / f"{pat}_{view}_half_sequence.mhd"),
                            frames[..., 0])
        if with_gt:
            camus_raw.write_mhd(
                str(pdir / f"{pat}_{view}_half_sequence_gt.mhd"), masks)
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
