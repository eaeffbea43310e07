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


def test_validate_data_camus_and_warnings(tmp_path, capsys):
    """gdkvm validate-data: healthy CAMUS layout passes; bogus path and
    missing-class situations warn with rc=1."""
    import json
    from gdkvm_tpu.cli import main
    from gdkvm_tpu.data.camus import materialize_synthetic_camus
    root = str(tmp_path / "camus")
    materialize_synthetic_camus(root, num_train=2, num_val=2,
                                image_size=48, clip_len=3, num_classes=4)
    rc = main(["validate-data", f"data.data_path={root}",
               "data.dataset=camus", "data.image_size=48",
               "data.clip_len=3", "model.num_classes=4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"]
    assert out["splits"]["train"]["clips"] == 2
    assert out["splits"]["train"]["annotated_frame_fraction"] == 1.0
    fr = out["splits"]["train"]["class_pixel_fractions"]
    assert len(fr) == 4 and abs(sum(fr) - 1.0) < 0.01

    rc2 = main(["validate-data", "data.data_path=/tmp/nope_nope",
                "data.dataset=camus"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 1 and not out2["ok"] and out2["warnings"]
