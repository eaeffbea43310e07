"""Driver contract: bench.py prints exactly ONE JSON line with the keys
{metric, value, unit, vs_baseline} (see repo README / BASELINE.md)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_json_line():
    env = dict(os.environ,
               GDKVM_PLATFORM="cpu",
               GDKVM_BENCH_REPS="1",
               GDKVM_BENCH_TIMED_CHUNKS="2",
               GDKVM_BENCH_CHUNK="4",
               GDKVM_BENCH_BATCH="1")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=900,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE line, got: {lines}"
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["metric"] == "echonet_streaming_frames_per_sec_per_chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["unit"] == "frames/sec"


def test_latency_bench_mode():
    """gdkvm bench --mode latency: reports per-call percentiles."""
    import json
    from gdkvm_tpu.cli import main
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["bench", "--mode", "latency", "--chunk", "2",
                   "--batch", "3", "--image-size", "32",
                   "model.enc_channels=[8,16,24,32]",
                   "model.enc_blocks=[1,1,1,1]", "model.num_heads=2",
                   "model.head_dim_k=16", "model.head_dim_v=16",
                   "model.kpff_channels=[24,16,8]",
                   "model.compute_dtype=float32"])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["chunk"] == 2 and out["batch"] == 3 and out["calls"] > 0
    assert 0 < out["latency_ms_p50"] <= out["latency_ms_p99"]
    assert out["latency_ms_per_frame_p50"] <= out["latency_ms_p50"]


def test_info_command():
    import json, io, contextlib
    from gdkvm_tpu.cli import main
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["info", "--config", "configs/smoke_synthetic.yaml"])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["platform"] == "cpu" and out["jax"]
    assert out["config"]["model"]["gdr_impl"] == "auto"


def test_train_bench_mode():
    """gdkvm bench --mode train: reports step time + train frames/sec."""
    import json, io, contextlib
    from gdkvm_tpu.cli import main
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["bench", "--mode", "train", "--image-size", "32",
                   "batch_size=1", "data.clip_len=2",
                   "model.enc_channels=[8,16,24,32]",
                   "model.enc_blocks=[1,1,1,1]", "model.num_heads=2",
                   "model.head_dim_k=16", "model.head_dim_v=16",
                   "model.kpff_channels=[24,16,8]",
                   "model.compute_dtype=float32"])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["steps_per_sec"] > 0
    assert out["train_frames_per_sec"] == out["steps_per_sec"] * 1 * 2
    assert out["image_size"] == 32


def test_bench_all_artifact_schema(tmp_path):
    """gdkvm bench --mode all --smoke: one schema-versioned JSON artifact
    with every section present and internally valid (VERDICT r3 item 7).
    The consolidated artifact is the round-over-round regression record —
    BASELINE.md links the TPU-measured instance."""
    import json, io, contextlib
    from gdkvm_tpu.cli import main
    from gdkvm_tpu.eval.regression import SECTIONS, validate_artifact
    out = str(tmp_path / "bench_all.json")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["bench", "--mode", "all", "--smoke", "--out", out])
    assert rc == 0
    with open(out) as f:
        artifact = json.load(f)
    validate_artifact(artifact)          # shared schema checker
    # The smoke run on CPU must produce REAL numbers (not error fallbacks)
    # for every section and arm — fault isolation is for flaky hardware,
    # not CI.
    from gdkvm_tpu.eval.regression import ARMED_SECTIONS, ARMS, \
        failed_sections
    assert failed_sections(artifact) == []
    for name in SECTIONS:
        sec = artifact["sections"][name]
        if name in ARMED_SECTIONS:
            assert set(sec) == set(ARMS), (name, sec)
    for arm in ARMS:                     # both model arms measured (v2)
        assert artifact["sections"]["serve_112"][arm]["frames_per_sec"] > 0
        qa = artifact["sections"]["quant_ab"][arm]["tiny"]
        assert qa["fwd_ms_w8a8"] > 0
        # Measurement quality is self-describing: raw interleaved pairs.
        assert len(qa["pairs_raw_ms"]) >= 2
        sb = artifact["sections"]["serve_bench"][arm]
        # Tail attribution: wait vs service decomposition present.
        qd = sb["queue_decomposition"]
        assert qd["pieces"] > 0
        assert qd["wait_ms_p99"] >= 0 and qd["service_ms_p50"] > 0
    # stdout carries the same artifact (pipe-able).
    printed = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert printed["schema"] == artifact["schema"]


def test_bench_all_rejects_shape_flags():
    """--mode all measures FIXED canonical shapes; shape/config flags that
    would be silently ignored must be rejected (ADVICE r4)."""
    import pytest
    from gdkvm_tpu.cli import main
    for bad in (["--chunk", "8"], ["--batch", "2"],
                ["--image-size", "64"], ["--config", "x.yaml"],
                ["model.num_heads=2"]):
        with pytest.raises(SystemExit) as exc:
            main(["bench", "--mode", "all", "--smoke", *bad])
        assert exc.value.code == 2


def test_failed_sections_reports_errors_and_nested_arms():
    """failed_sections: errored sections (top-level and per-arm) are named;
    skips don't count (the CLI exits nonzero on these outside --smoke)."""
    from gdkvm_tpu.eval.regression import failed_sections
    art = {"sections": {
        "ok": {"frames_per_sec": 1.0},
        "skipped": {"skipped": "needs TPU"},
        "broken": {"error": "RuntimeError: boom"},
        "armed": {"flagship": {"x": 1}, "ts8": {"error": "boom"}},
    }}
    assert failed_sections(art) == ["broken", "armed.ts8"]


def test_modules_bench_mode():
    """gdkvm bench --mode modules: per-module FLOPs/time accounting sums
    to ~the full model and reports the meta block."""
    import json, io, contextlib
    from gdkvm_tpu.cli import main
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["bench", "--mode", "modules", "--image-size", "32",
                   "--chunk", "2",
                   "model.enc_channels=[8,16,24,32]", "model.num_heads=2",
                   "model.head_dim_k=8", "model.head_dim_v=8",
                   "model.compute_dtype=float32"])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    for mod in ("encoder", "lkva_gdr", "decoder", "full_model", "loss"):
        assert out[mod]["ms_per_call"] > 0
    assert out["full_model"]["flops_per_call"] > \
        out["encoder"]["flops_per_call"]
    # Parts must account for the bulk of the full model's work.
    assert out["_meta"]["sum_parts_ms"] > 0.5 * out["full_model"]["ms_per_call"]
