"""File-to-masks inference tests (gdkvm infer; eval/infer.py)."""

import json
import os

import numpy as np
import pytest

from gdkvm_tpu.eval.infer import load_frames


def _avi(tmp_path, frames=9, size=32):
    from gdkvm_tpu.data.echonet import materialize_synthetic_echonet
    root = str(tmp_path / "echo")
    materialize_synthetic_echonet(root, num_train=1, num_val=0,
                                  num_frames=frames, image_size=size)
    vids = os.listdir(os.path.join(root, "Videos"))
    return os.path.join(root, "Videos", vids[0])


def test_load_frames_avi_and_pngdir(tmp_path):
    path = _avi(tmp_path)
    frames = load_frames(path, 32)
    assert frames.shape == (9, 32, 32, 1) and frames.dtype == np.uint8

    # PNG directory source.
    from PIL import Image
    d = tmp_path / "pngs"
    d.mkdir()
    for i in range(4):
        Image.fromarray((np.ones((32, 32)) * i * 40).astype(np.uint8)
                        ).save(d / f"f{i:03d}.png")
    frames = load_frames(str(d), 32)
    assert frames.shape == (4, 32, 32, 1)
    assert frames[2, 0, 0, 0] == 80     # sorted order preserved

    with pytest.raises(ValueError, match="unsupported input"):
        load_frames(str(tmp_path / "x.bin"), 32)


def test_infer_cli_model_and_artifact(tmp_path):
    """gdkvm infer end-to-end: checkpoint-free model path and exported
    StableHLO artifact path produce identical masks."""
    from gdkvm_tpu.cli import main

    path = _avi(tmp_path, frames=7)
    small = ["model.enc_channels=[8,16,24,32]", "model.enc_blocks=[1,1,1,1]",
             "model.num_heads=2", "model.head_dim_k=16",
             "model.head_dim_v=16", "model.kpff_channels=[24,16,8]",
             "model.compute_dtype=float32", "data.image_size=32",
             "runtime.run_dir=" + str(tmp_path / "none")]

    out_a = str(tmp_path / "out_model")
    rc = main(["infer", "--input", path, "--out", out_a, "--chunk", "4",
               "--overlay-every", "3"] + small)
    assert rc == 0
    summary = json.load(open(os.path.join(out_a, "infer.json")))
    assert summary["frames"] == 7 and summary["overlays"] == 3
    masks_a = np.load(os.path.join(out_a, "masks.npz"))["masks"]
    assert masks_a.shape == (7, 32, 32) and masks_a.dtype == np.uint8
    assert os.path.exists(os.path.join(out_a, "overlays", "frame_00003.png"))

    # Export an artifact with the same (untrained) params, infer again.
    art = str(tmp_path / "art")
    rc = main(["export", "--out", art, "--chunk", "4", "--image-size", "32"]
              + small)
    assert rc == 0
    out_b = str(tmp_path / "out_art")
    rc = main(["infer", "--input", path, "--out", out_b,
               "--artifact", art] + small)
    assert rc == 0
    masks_b = np.load(os.path.join(out_b, "masks.npz"))["masks"]
    np.testing.assert_array_equal(masks_a, masks_b)


def test_infer_artifact_uses_exported_image_size(tmp_path):
    """--artifact decodes at the artifact's exported size, not the
    config's (the exported program has a fixed input signature)."""
    from gdkvm_tpu.cli import main

    path = _avi(tmp_path, frames=5, size=48)
    small = ["model.enc_channels=[8,16,24,32]", "model.enc_blocks=[1,1,1,1]",
             "model.num_heads=2", "model.head_dim_k=16",
             "model.head_dim_v=16", "model.kpff_channels=[24,16,8]",
             "model.compute_dtype=float32",
             "runtime.run_dir=" + str(tmp_path / "none")]
    art = str(tmp_path / "art48")
    rc = main(["export", "--out", art, "--chunk", "4", "--image-size", "48"]
              + small)
    assert rc == 0
    out = str(tmp_path / "out48")
    # Config says image_size 32; the artifact was exported at 48 and wins.
    rc = main(["infer", "--input", path, "--out", out, "--artifact", art,
               "data.image_size=32"] + small)
    assert rc == 0
    masks = np.load(os.path.join(out, "masks.npz"))["masks"]
    assert masks.shape == (5, 48, 48)


def test_load_frames_mhd(tmp_path):
    """Raw CAMUS MetaImage input path for gdkvm infer."""
    import numpy as np
    from gdkvm_tpu.data.camus_raw import write_mhd
    vol = (np.random.default_rng(0).integers(0, 255, (5, 40, 40))
           .astype(np.uint8))
    path = str(tmp_path / "seq.mhd")
    write_mhd(path, vol)
    frames = load_frames(path, 32)
    assert frames.shape == (5, 32, 32, 1) and frames.dtype == np.uint8
