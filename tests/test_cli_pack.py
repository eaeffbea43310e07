"""End-to-end CLI test: `gdkvm pack` → train from `dataset=packed`.

Covers the decode-once serving/data path at the command surface (the
library tiers are covered in test_packed.py)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env_extra=None):
    env = dict(os.environ, GDKVM_PLATFORM="cpu", **(env_extra or {}))
    return subprocess.run([sys.executable, "-m", "gdkvm_tpu", *args],
                          capture_output=True, text=True, timeout=600,
                          env=env, cwd=REPO)


def test_pack_then_train(tmp_path):
    pck_dir = str(tmp_path / "pck")
    out = _run(["pack", "--config", "configs/smoke_synthetic.yaml",
                "--out", pck_dir])
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert set(rec) == {"train", "val"}
    assert os.path.getsize(rec["train"]["path"]) > 0

    run_dir = str(tmp_path / "run")
    out = _run(["train", "--config", "configs/smoke_synthetic.yaml",
                "data.dataset=packed", f"data_path={pck_dir}",
                "num_iterations=3", "train.eval_every=1000",
                "parallel.data_axis=1", f"runtime.run_dir={run_dir}"])
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l)
             for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert any("loss" in l for l in lines)
