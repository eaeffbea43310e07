"""Mount-day dress rehearsal: the FULL raw-data chain as ONE test each.

The real CAMUS/EchoNet bytes are unreachable in this container (zero
egress), so every seam of the raw-data path was previously tested in
pieces.  These tests fabricate fixtures in the EXACT raw formats the
datasets ship in (CAMUS MetaImage .mhd/.raw half-sequences with
anisotropic ElementSpacing and official patient naming — reference
pointer website/src/pages/[lang]/reprod/index.astro:217-225; EchoNet AVI
cine loops + FileList.csv with per-video FPS + VolumeTracings.csv) and
run the complete user-facing chain through the CLI:

  convert-camus → validate-data → train → parity (HD95 in mm, EF in mL,
  2-fold CV, ablation smoke) → export → HTTP serve round trip

so the day real data mounts, no seam is exercised for the first time.
The matching day-one runbook is docs/REPRODUCE.md §"Mount day".
"""

import contextlib
import io
import json
import os

import numpy as np
import pytest

from gdkvm_tpu.cli import main

pytestmark = pytest.mark.slow

SPACING = (0.308, 0.154, 1.0)     # anisotropic mm, CAMUS-like (x, y, z)


def _run_cli(args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(args)
    lines = [l for l in buf.getvalue().strip().splitlines() if l.strip()]
    return rc, (json.loads(lines[-1]) if lines else {})


def _camus_cfg(tmp_path, data_root):
    cfg = tmp_path / "camus.yaml"
    cfg.write_text(f"""
data_path: {data_root}
batch_size: 2
learning_rate: 1.0e-3
num_iterations: 30
data:
  dataset: camus
  image_size: 64
  clip_len: 6
  augment: false
model:
  num_classes: 4
  in_channels: 1
  enc_channels: [8, 16, 24, 32]
  enc_blocks: [1, 1, 1, 1]
  num_heads: 2
  head_dim_k: 16
  head_dim_v: 16
  kpff_channels: [24, 16, 8]
  compute_dtype: float32
train:
  warmup_iterations: 5
  log_every: 10
  eval_every: 30
  checkpoint_every: 30
eval_stage:
  num_vis: 1
  streams: 1
  stream_chunk: 4
runtime:
  run_dir: {tmp_path}/camus_run
""")
    return str(cfg)


def test_camus_mount_day_chain(tmp_path):
    """Raw mhd fixtures → convert → validate → train → parity(mm, mL,
    folds, ablate) → export → serve: every seam in one run."""
    from tests.test_camus_raw import _make_raw_patient

    raw = tmp_path / "raw"
    # Official CAMUS patient numbering: 1-400 train, 401-450 val.
    for i, pat in enumerate(["patient0001", "patient0002", "patient0401",
                             "patient0402"]):
        _make_raw_patient(raw, pat, t=12, hw=96, seed=i, spacing=SPACING)

    data_root = str(tmp_path / "processed")
    rc, out = _run_cli(["convert-camus", "--raw", str(raw), "--out",
                        data_root, "--image-size", "64", "--clip-len",
                        "6", "--split-mode", "official"])
    assert rc == 0 and out["clips_written"] == 8     # 4 patients × 2 views

    cfg = _camus_cfg(tmp_path, data_root)
    rc, out = _run_cli(["validate-data", "--config", cfg])
    assert rc == 0, out
    assert out["ok"] and out["splits"]["train"]["clips"] == 4
    assert out["splits"]["val"]["clips"] == 4

    rc, out = _run_cli(["train", "--config", cfg])
    assert rc == 0
    assert np.isfinite(out["final"]["loss"])
    ckpt = os.path.join(str(tmp_path), "camus_run", "checkpoints")
    assert os.path.isdir(ckpt) and os.listdir(ckpt), "no checkpoint saved"

    # Clinical parity, physical units: HD95 must come back in mm (the
    # spacing sidecars survived the converter), 2-fold CV aggregation.
    rc, out = _run_cli(["parity", "--config", cfg, "--protocol", "camus",
                        "--folds", "2"])
    assert rc == 0, out
    assert out["hd95_units"] == "mm", out
    assert out["folds"] == 2 and len(out["per_fold"]) == 2
    assert np.isfinite(out["dice_mean_overall"])
    assert np.isfinite(out["hd95_mean_overall"])

    # Biplane-Simpson EF in mL (volumes need the mm spacing end-to-end).
    rc, out = _run_cli(["parity", "--config", cfg, "--protocol",
                        "camus-ef"])
    assert rc == 0, out
    assert out["per_patient"], out
    assert all("v_ed_ml" in r for r in out["per_patient"]), \
        "EF volumes not in mL — spacing lost between converter and parity"

    # Memory-ablation smoke (the robustness study entry point).
    rc, out = _run_cli(["parity", "--config", cfg, "--ablate",
                        "--ablate-videos", "2", "--ablate-video-len", "8"])
    assert rc == 0, out

    # Export the trained checkpoint and serve it over HTTP.
    art = str(tmp_path / "artifact")
    rc, out = _run_cli(["export", "--config", cfg, "--out", art,
                        "--chunk", "4", "--batch", "1"])
    assert rc == 0 and out["signature"]["frames_u8"][0] == 1

    import threading
    from gdkvm_tpu.serve import BatchingEngine, ServeClient, make_server
    engine = BatchingEngine(artifact=art, streams=1, chunk=4)
    srv = make_server(engine, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        client = ServeClient("127.0.0.1", srv.server_address[1])
        health = client.health()
        assert health["num_classes"] == 4
        client.open()
        video = np.random.default_rng(0).integers(
            0, 255, (8, 64, 64, 1), np.uint8)
        masks = client.infer(video)
        client.close()
        assert masks.shape == (8, 64, 64)
        assert masks.max() <= 3
    finally:
        srv.shutdown()
        engine.close()


def test_echonet_mount_day_chain(tmp_path):
    """Raw AVI + FileList (varying FPS) + VolumeTracings → validate →
    train → FPS-aware EF parity."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841  (AVI codec needed)
    from gdkvm_tpu.data.echonet import materialize_synthetic_echonet

    root = str(tmp_path / "echonet")
    # Two frame rates: the beat-wise EF protocol must read each video's
    # own FPS from FileList.csv, not assume one global rate.
    materialize_synthetic_echonet(root, num_train=4, num_val=2,
                                  num_frames=24, image_size=64,
                                  fps_cycle=(30.0, 50.0))
    import csv
    with open(os.path.join(root, "FileList.csv")) as f:
        rows = list(csv.DictReader(f))
    assert {r["FPS"] for r in rows} == {"30", "50"}

    cfg = tmp_path / "echonet.yaml"
    cfg.write_text(f"""
data_path: {root}
batch_size: 2
learning_rate: 1.0e-3
num_iterations: 20
data:
  dataset: echonet
  image_size: 64
  clip_len: 6
  augment: false
model:
  num_classes: 2
  in_channels: 1
  enc_channels: [8, 16, 24, 32]
  enc_blocks: [1, 1, 1, 1]
  num_heads: 2
  head_dim_k: 16
  head_dim_v: 16
  kpff_channels: [24, 16, 8]
  compute_dtype: float32
train:
  warmup_iterations: 5
  log_every: 10
  eval_every: 20
  checkpoint_every: 20
eval_stage:
  num_vis: 0
  streams: 1
  stream_chunk: 4
runtime:
  run_dir: {tmp_path}/echonet_run
""")
    rc, out = _run_cli(["validate-data", "--config", str(cfg)])
    assert rc == 0, out
    assert out["splits"]["train"]["clips"] == 4
    assert out["splits"]["val"]["ef_labels"] == 6

    rc, out = _run_cli(["train", "--config", str(cfg)])
    assert rc == 0 and np.isfinite(out["final"]["loss"])

    rc, out = _run_cli(["parity", "--config", str(cfg), "--protocol",
                        "echonet-ef", "--split", "VAL"])
    assert rc == 0, out
    assert out["n_videos"] == 2
    # A 20-iter model's EF error is large; the contract here is that the
    # FPS-aware protocol scored BOTH videos against their own labels.
    assert all("ef_true" in r and np.isfinite(r["ef_pred"])
               for r in out["per_video"])
    assert np.isfinite(out["ef_mae"])
