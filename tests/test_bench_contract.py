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
               GDKVM_BENCH_CHUNK="4")
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
