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
    assert tags == {"1e-4_1", "1e-4_2", "1e-3_1", "1e-3_2"}
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
