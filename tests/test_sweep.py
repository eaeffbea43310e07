"""gdkvm sweep — hydra-multirun-equivalent grid runner."""

import contextlib
import io
import json
import os

from gdkvm_tpu.cli import main


def test_sweep_grid(tmp_path):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["sweep", "--config", "configs/smoke_synthetic.yaml",
                   "runtime.run_dir=" + str(tmp_path / "base"),
                   "num_iterations=3", "train.log_every=1",
                   "train.eval_every=3", "train.checkpoint_every=100",
                   "data.image_size=32", "data.clip_len=2",
                   "learning_rate=1e-4,1e-3", "batch_size=1,2"])
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    runs, summary = lines[:-1], lines[-1]
    assert len(runs) == 4 and summary["runs"] == 4
    tags = {os.path.basename(r["run_dir"]) for r in runs}
    assert tags == {"00_learning_rate-1e-4_batch_size-1",
                    "01_learning_rate-1e-4_batch_size-2",
                    "02_learning_rate-1e-3_batch_size-1",
                    "03_learning_rate-1e-3_batch_size-2"}
    for r in runs:
        assert os.path.exists(os.path.join(r["run_dir"], "metrics.jsonl"))
        assert "loss" in r
    assert summary["sweep_best"] is not None
    assert summary["sweep_best"]["eval/dice_fg_mean"] == max(
        r["eval/dice_fg_mean"] for r in runs)


def test_sweep_requires_swept_values(tmp_path):
    rc = main(["sweep", "--config", "configs/smoke_synthetic.yaml",
               "runtime.run_dir=" + str(tmp_path)])
    assert rc == 2


def test_sweep_bracket_values_not_swept_and_errors_contained(tmp_path):
    """Bracketed tuple overrides stay fixed; a failing combo is recorded
    with an error field and the grid continues to the summary."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["sweep", "--config", "configs/smoke_synthetic.yaml",
                   "runtime.run_dir=" + str(tmp_path / "base"),
                   "num_iterations=2", "train.log_every=1",
                   "train.eval_every=2", "train.checkpoint_every=100",
                   "data.image_size=32", "data.clip_len=2",
                   "model.enc_channels=[8,16,24,32]",   # fixed tuple
                   "model.enc_blocks=[1,1,1,1]",
                   # second value is invalid -> that combo errors out
                   "data.device_cache=on,bogus"])
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    runs, summary = lines[:-1], lines[-1]
    assert len(runs) == 2 and summary["runs"] == 2
    oks = [r for r in runs if "error" not in r]
    errs = [r for r in runs if "error" in r]
    assert len(oks) == 1 and len(errs) == 1
    assert "bogus" in errs[0]["overrides"][0]
    assert summary["sweep_best"] == oks[0] or \
        summary["sweep_best"]["run_dir"] == oks[0]["run_dir"]
    # Unique, indexed run dirs.
    assert os.path.basename(oks[0]["run_dir"]).startswith("00_")
