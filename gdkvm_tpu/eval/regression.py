"""Consolidated regression benchmark: every headline number in ONE JSON.

Round-over-round performance tracking used to require archaeology across
BASELINE.md sections; `gdkvm bench --mode all` measures the full frontier
in one process and writes one schema-versioned artifact (VERDICT r3 item
7).  Schema v2 (VERDICT r4 items 1/4/5) adds:

- a MODEL-ARM dimension: every model-dependent section is measured for
  both the flagship (3-scale head, the checkpoint-continuity default) and
  ts8 (the lane-aligned 2-scale sub-pixel variant, the recommended
  TPU-native config) — the recommended config must be visible to the
  artifact that exists to catch regressions;
- raw measurement quality: each A/B persists its per-pair interleaved
  times and the session's measured RTT floor, so a degraded tunnel window
  is visible in the artifact instead of in a comment;
- serve-bench tail attribution: per-piece queue-wait vs service-time and
  queue depth at enqueue, so a p99 26× the tick time is decomposable into
  offered-load queueing vs device work.

Sections:

- serve_112   — saturated 112² 2-class streaming (the bench.py headline
                shape; reference real-time claim README.md:22), per arm
- serve_256   — 256² 4-class streaming (CAMUS-resolution serving), per arm
- train_step  — documented 256² recipe step (batch 8, clip 10, 4-class;
                reference recipe website/src/pages/[lang]/reprod/
                index.astro:246-252), per arm
- gdr_kernel_ab — Pallas monolith vs XLA chunked forward at the two
                canonical shapes (floor-corrected chained-scan timing);
                model-independent, so not armed
- quant_ab    — full forward bf16 vs W8A8(encoder), per arm, at BOTH the
                saturated 112² and the 256² recipe shape (the r3.8 "quant
                off at memory-bound 256²" decision was measured on the
                flagship's channel plan; ts8's ≥64/128-ch shapes get their
                own measurement)
- serve_bench — end-to-end HTTP serving throughput (engine + server +
                concurrent clients in-process; measures the host stack),
                per arm, with wait/service decomposition

Each section is fault-isolated: a failure records {"error": ...} instead
of killing the artifact.  ``smoke=True`` shrinks every shape/model so the
whole artifact runs on CPU in CI (tests/test_bench_contract.py validates
the schema contract there).
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional

SCHEMA_VERSION = "gdkvm-bench-all/v2"

# Model arms: flagship = default 3-scale config; ts8 = lane-aligned
# 2-scale sub-pixel variant (configs/gdkvm_ts8_*.yaml, BASELINE.md r4.4).
ARMS = ("flagship", "ts8")
ARMED_SECTIONS = ("serve_112", "serve_256", "train_step", "quant_ab",
                  "serve_bench")

# Every artifact must carry exactly these sections (armed sections hold
# one sub-dict per arm; each value = result dict, {"error": ...} or
# {"skipped": ...}).
SECTIONS = ARMED_SECTIONS + ("gdr_kernel_ab",)


def _section(fn):
    try:
        return fn()
    except Exception as exc:            # fault isolation per section
        return {"error": f"{type(exc).__name__}: {exc}"}


def _arm_cfg(arm: str, num_classes: int, smoke: bool):
    from gdkvm_tpu.config.schema import ModelConfig
    if smoke:
        return ModelConfig(
            num_classes=num_classes, in_channels=1,
            enc_channels=(8, 16, 24, 32), enc_blocks=(1, 1, 1, 1),
            num_heads=2, head_dim_k=16, head_dim_v=16,
            kpff_channels=(24, 16, 8) if arm == "flagship" else (24, 16),
            compute_dtype="float32")
    if arm == "ts8":
        return ModelConfig(
            num_classes=num_classes, in_channels=1,
            enc_channels=(64, 64, 128, 192), enc_blocks=(1, 1, 2, 2),
            num_heads=4, head_dim_k=64, head_dim_v=64,
            kpff_channels=(128, 96))
    return ModelConfig(num_classes=num_classes, in_channels=1)


_TS8_OVERRIDES = [
    "model.enc_channels=[64,64,128,192]", "model.enc_blocks=[1,1,2,2]",
    "model.num_heads=4", "model.head_dim_k=64", "model.head_dim_v=64",
    "model.kpff_channels=[128,96]",
]


def _serve_section(arm: str, num_classes: int, image_size: int, chunk: int,
                   batch: int, smoke: bool, reps: int, timed: int):
    import jax
    from gdkvm_tpu.eval.throughput import measure_streaming_fps
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params

    model = GDKVM(cfg=_arm_cfg(arm, num_classes, smoke))
    params = init_params(model, jax.random.PRNGKey(0), image_size)
    # Best-of-reps: the dev tunnel's dispatch latency swings window to
    # window; max is the stable device-throughput estimate (bench.py).
    runs = [measure_streaming_fps(model, params, image_size=image_size,
                                  chunk=chunk, batch=batch,
                                  warmup_chunks=2, timed_chunks=timed)
            for _ in range(reps)]
    best = max(runs, key=lambda r: r["frames_per_sec"])
    out = {k: best[k] for k in ("frames_per_sec", "ms_per_frame", "chunk",
                                "batch", "image_size", "apparent_tflops",
                                "plausible")}
    # Raw per-rep throughputs: window degradation self-evident (item 5).
    out["reps_raw_fps"] = [round(r["frames_per_sec"], 1) for r in runs]
    return out


def _train_section(arm: str, smoke: bool):
    import jax
    import numpy as np
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.data.pipeline import Batch
    from gdkvm_tpu.eval.throughput import measure_train_step_time
    from gdkvm_tpu.models.gdkvm import GDKVM, train_model_config
    from gdkvm_tpu.train.loop import create_train_state, make_optimizer, \
        make_train_step

    size = 32 if smoke else 256
    overrides = ["model.num_classes=4", f"data.image_size={size}",
                 "data.clip_len=10"]
    if smoke:
        overrides += ["train.batch_size=1", "data.clip_len=2",
                      "model.enc_channels=[8,16,24,32]",
                      "model.enc_blocks=[1,1,1,1]", "model.num_heads=2",
                      "model.head_dim_k=16", "model.head_dim_v=16",
                      "model.kpff_channels=" + (
                          "[24,16,8]" if arm == "flagship" else "[24,16]"),
                      "model.compute_dtype=float32"]
    elif arm == "ts8":
        overrides += _TS8_OVERRIDES
    cfg = load_config(None, overrides=overrides)
    model = GDKVM(cfg=train_model_config(cfg.model, size))
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
    b, t = cfg.train.batch_size, cfg.data.clip_len
    rng = np.random.default_rng(0)
    batch = jax.device_put(Batch(
        frames=rng.integers(0, 255, (b, t, size, size, 1), np.uint8),
        masks=rng.integers(0, 4, (b, t, size, size)).astype(np.uint8),
        valid=np.ones((b, t), np.float32)))
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0)
    timed = 3 if smoke else 10
    r = measure_train_step_time(step, state, batch, warmup=1, timed=timed)
    return {"sec_per_step": r["sec_per_step"],
            "steps_per_sec": r["steps_per_sec"],
            "train_frames_per_sec": r["steps_per_sec"] * b * t,
            "batch_size": b, "clip_len": t, "image_size": size}


def _kernel_section(smoke: bool, reps: int):
    import jax

    if jax.default_backend() == "cpu" and not smoke:
        return {"skipped": "Pallas/XLA kernel A/B requires TPU"}

    import jax.numpy as jnp
    import numpy as np
    from gdkvm_tpu.core.gdr import gdr_chunked_bh
    from gdkvm_tpu.eval.modulebench import _floor_ms, _timed
    from gdkvm_tpu.ops.gdr_pallas import gdr_pallas_bh

    shapes = ([("tiny", 2, 2, 4, 16, 16)] if smoke else
              [("saturated_112", 8, 4, 32, 49, 64),
               ("camus_recipe", 8, 4, 10, 256, 64)])
    floor = _floor_ms(reps)
    out: Dict[str, Dict[str, float]] = {"floor_ms": floor}
    rng = np.random.default_rng(0)
    for name, b, h, t, n, d in shapes:
        q = jnp.asarray(rng.standard_normal((b, h, t, n, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, t, n, d)), jnp.float32)
        k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
        v = jnp.asarray(rng.standard_normal((b, h, t, n, d)), jnp.float32)
        beta = jnp.asarray(rng.random((b, h, t, n)), jnp.float32)
        alpha = jnp.asarray(rng.random((b, h, t)), jnp.float32)
        s0 = jnp.zeros((b, h, d, d), jnp.float32)
        args = (q, k, v, beta, alpha, s0)
        # Interleaved pairs (pallas, chunked) — both sides of each pair
        # share one tunnel window; raw pairs persisted (item 5).
        pairs = [(_timed(gdr_pallas_bh, args, reps),
                  _timed(gdr_chunked_bh, args, reps)) for _ in range(2)]
        pal = min(p for p, _ in pairs) - floor
        chk = min(c for _, c in pairs) - floor
        out[name] = {"pallas_ms": pal, "xla_chunked_ms": chk,
                     "speedup": chk / pal if pal > 0 else float("nan"),
                     "pairs_raw_ms": [[round(p, 4), round(c, 4)]
                                      for p, c in pairs]}
    return out


def _quant_section(arm: str, smoke: bool, reps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gdkvm_tpu.eval.modulebench import _floor_ms, _timed
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params
    from gdkvm_tpu.ops import quant as Q

    shapes = ([("tiny", 2, 32, 2, 2)] if smoke else
              [("saturated_112", 2, 112, 32, 8),
               ("camus_256", 4, 256, 16, 8)])
    floor = _floor_ms(reps)
    out: Dict[str, object] = {"floor_ms": floor, "scope": "encoder",
                              "calibration": "percentile"}
    for name, ncls, size, chunk, batch in shapes:
        model = GDKVM(cfg=_arm_cfg(arm, ncls, smoke))
        params = init_params(model, jax.random.PRNGKey(0), size)
        rng = np.random.default_rng(0)
        calib = [rng.random((1, 4, size, size, 1)).astype(np.float32)
                 for _ in range(2)]
        qmodel = Q.w8a8_model(
            model, Q.calibrate_act_scales(model, params, calib,
                                          method="percentile"))
        frames = jnp.asarray(
            rng.random((batch, chunk, size, size, 1)), jnp.float32)

        def fwd(m):
            def fn(f):
                logits, _ = m.apply(params, f)
                return logits
            return fn

        f_bf16, f_w8a8 = fwd(model), fwd(qmodel)
        # TRUE interleaving: each pair times bf16 then w8a8 back to back,
        # so both sides of a pair share one tunnel window (a first
        # artifact recorded w8a8 2.5× slow because its single measurement
        # landed in a degraded window); raw pairs persisted so a degraded
        # window is visible in the artifact (item 5).
        pairs = [(_timed(f_bf16, (frames,), reps),
                  _timed(f_w8a8, (frames,), reps)) for _ in range(2)]
        bf16 = min(b for b, _ in pairs) - floor
        w8a8 = min(w for _, w in pairs) - floor
        out[name] = {
            "fwd_ms_bf16": bf16, "fwd_ms_w8a8": w8a8,
            "speedup": bf16 / w8a8 if w8a8 > 0 else float("nan"),
            "pairs_raw_ms": [[round(b, 4), round(w, 4)] for b, w in pairs],
            "image_size": size, "chunk": chunk, "batch": batch,
            "num_classes": ncls}
    return out


def _serve_bench_section(arm: str, smoke: bool):
    import threading
    import numpy as np
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params
    from gdkvm_tpu.serve import BatchingEngine, ServeClient, make_server
    import jax

    streams, chunk, size, frames = (2, 2, 32, 4) if smoke \
        else (8, 16, 112, 128)
    model = GDKVM(cfg=_arm_cfg(arm, 2, smoke))
    params = init_params(model, jax.random.PRNGKey(0), size)
    engine = BatchingEngine(model=model, params=params, streams=streams,
                            chunk=chunk, image_size=size)
    srv = make_server(engine, "127.0.0.1", 0)
    srv_thread = threading.Thread(target=srv.serve_forever, daemon=True)
    srv_thread.start()
    port = srv.server_address[1]
    lats_lock = threading.Lock()
    lats, errors = [], []

    clients = []

    def session(i):
        rng = np.random.default_rng(i)
        video = rng.integers(0, 255, (chunk, size, size, 1), np.uint8)
        try:
            c = clients[i]
            done = 0
            while done < frames:
                t0 = time.perf_counter()
                masks = c.infer(video)
                with lats_lock:
                    lats.append(time.perf_counter() - t0)
                assert masks.shape == (chunk, size, size)
                done += chunk
            c.close()
        except Exception as exc:
            with lats_lock:
                errors.append(f"{type(exc).__name__}: {exc}")

    try:
        # Warm: open every session and stream one chunk each OUTSIDE the
        # timed window — the bench measures steady-state serving, not
        # connection setup or first-hit compiles.
        warm = np.zeros((chunk, size, size, 1), np.uint8)
        for i in range(streams):
            c = ServeClient("127.0.0.1", port)
            c.open()
            c.infer(warm)
            clients.append(c)
        engine.drain_stats()                  # discard warmup samples
        threads = [threading.Thread(target=session, args=(i,))
                   for i in range(streams)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = engine.drain_stats()
        host = _host_stack_profile(engine, srv.server_address[1], chunk,
                                   size, smoke)
    finally:
        srv.shutdown()
        engine.close()
    if errors:
        return {"error": "; ".join(errors[:3])}
    ms = np.asarray(lats) * 1e3
    out = {"frames_per_sec": streams * frames / wall,
           "sessions": streams, "chunk": chunk, "image_size": size,
           "request_latency_ms_p50": float(np.percentile(ms, 50)),
           "request_latency_ms_p99": float(np.percentile(ms, 99)),
           "host_profile": host}
    if stats:
        # Tail attribution (item 4): request latency = queue wait (pieces
        # ahead of this one across the tick loop) + service (dispatch →
        # delivery).  If p99 wait ≫ p99 service, the tail is offered-load
        # queueing, not a starved session or a slow device.
        wait = np.asarray([s[0] for s in stats])
        service = np.asarray([s[1] for s in stats])
        depth = np.asarray([s[2] for s in stats])
        out["queue_decomposition"] = {
            "pieces": int(len(stats)),
            "wait_ms_p50": float(np.percentile(wait, 50)),
            "wait_ms_p99": float(np.percentile(wait, 99)),
            "service_ms_p50": float(np.percentile(service, 50)),
            "service_ms_p99": float(np.percentile(service, 99)),
            "depth_at_enqueue_mean": float(depth.mean()),
            "depth_at_enqueue_max": int(depth.max()),
        }
    return out


def _host_stack_profile(engine, port: int, chunk: int, size: int,
                        smoke: bool):
    """Attribute the serve path's per-request cost to its host layers
    (VERDICT r3 item 4): npy codec, bare HTTP round trip, and the device
    tick (dispatch+fetch of one engine step) — so "the host stack is the
    bound" is a measured claim with a named next lever, not a guess."""
    import numpy as np
    from gdkvm_tpu.serve import ServeClient, _np_bytes, _np_from_bytes

    reps = 5 if smoke else 50
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, (chunk, size, size, 1), np.uint8)
    masks = rng.integers(0, 2, (chunk, size, size)).astype(np.uint8)

    # 1. npy codec, both directions (request decode + response encode).
    t0 = time.perf_counter()
    for _ in range(reps):
        blob = _np_bytes(video)
        _np_from_bytes(blob)
        _np_from_bytes(_np_bytes(masks))
    codec_ms = (time.perf_counter() - t0) / reps * 1e3

    # 2. Bare HTTP round trip (threading server + keep-alive client, no
    #    inference): GET /healthz.
    c = ServeClient("127.0.0.1", port)
    c.health()                                   # warm the connection
    t0 = time.perf_counter()
    for _ in range(reps):
        c.health()
    http_ms = (time.perf_counter() - t0) / reps * 1e3

    # 3. Device tick: one engine step (dispatch + post + fetch), measured
    #    through the same jitted callables the batcher thread uses.
    jnp = engine._jnp
    flags = jnp.asarray(np.zeros((2, engine.streams), np.float32))
    fb = engine._frames_arg({})
    mem, seen = engine._mem, engine._seen

    def tick():
        m, mem2, seen2 = engine._step(fb, mem, seen, flags)
        out = engine._post_fn(engine.streams)(
            m, jnp.arange(engine.streams, dtype=jnp.int32))
        np.asarray(engine._jax.device_get(out))
        return mem2, seen2

    mem, seen = tick()                           # warm (donation rebind)
    t0 = time.perf_counter()
    for _ in range(reps):
        mem, seen = tick()
    tick_ms = (time.perf_counter() - t0) / reps * 1e3
    engine._mem, engine._seen = mem, seen

    return {"npy_codec_ms": codec_ms, "http_roundtrip_ms": http_ms,
            "device_tick_ms": tick_ms, "reps": reps}


def bench_all(smoke: bool = False, reps: Optional[int] = None,
              serve_reps: Optional[int] = None) -> Dict:
    """Measure every section (model-dependent sections per arm); return
    the schema-versioned artifact dict."""
    import jax

    reps = reps if reps is not None else (5 if smoke else 100)
    serve_reps = serve_reps if serve_reps is not None else \
        (1 if smoke else 2)
    timed = 2 if smoke else 30
    t0 = time.time()

    def armed(fn):
        return {arm: _section(lambda a=arm: fn(a)) for arm in ARMS}

    sections = {
        "serve_112": armed(lambda arm: _serve_section(
            arm, 2, 32 if smoke else 112, 2 if smoke else 32,
            2 if smoke else 8, smoke, serve_reps, timed)),
        "serve_256": armed(lambda arm: _serve_section(
            arm, 4, 48 if smoke else 256, 2 if smoke else 16,
            2 if smoke else 8, smoke, serve_reps, timed)),
        "train_step": armed(lambda arm: _train_section(arm, smoke)),
        "gdr_kernel_ab": _section(lambda: _kernel_section(smoke, reps)),
        "quant_ab": armed(lambda arm: _quant_section(arm, smoke, reps)),
        "serve_bench": armed(lambda arm: _serve_bench_section(arm, smoke)),
    }
    return {
        "schema": SCHEMA_VERSION,
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "smoke": smoke,
        "arms": list(ARMS),
        "elapsed_sec": round(time.time() - t0, 1),
        "sections": sections,
    }


def _validate_leaf(name: str, sec: Dict) -> None:
    assert isinstance(sec, dict) and sec, name
    if "error" in sec or "skipped" in sec:
        return
    if name.startswith("serve_1") or name.startswith("serve_2") \
            or name == "serve_bench":
        assert sec["frames_per_sec"] > 0, (name, sec)
    elif name == "train_step":
        assert sec["steps_per_sec"] > 0, sec
    elif name == "gdr_kernel_ab":
        shape_rows = [v for k, v in sec.items() if k != "floor_ms"]
        assert shape_rows, sec
        for row in shape_rows:
            assert row["pallas_ms"] > 0 and row["xla_chunked_ms"] > 0
            assert len(row["pairs_raw_ms"]) >= 2, row
    elif name == "quant_ab":
        shape_rows = [v for k, v in sec.items()
                      if k not in ("floor_ms", "scope", "calibration")]
        assert shape_rows, sec
        for row in shape_rows:
            assert row["fwd_ms_bf16"] > 0 and row["fwd_ms_w8a8"] > 0
            assert len(row["pairs_raw_ms"]) >= 2, row


def validate_artifact(artifact: Dict) -> None:
    """Raise AssertionError unless ``artifact`` honors the schema contract
    (the contract test and any downstream tooling share this checker)."""
    assert artifact.get("schema") == SCHEMA_VERSION, artifact.get("schema")
    for key in ("platform", "device", "smoke", "elapsed_sec", "sections",
                "arms"):
        assert key in artifact, f"missing {key}"
    assert list(artifact["arms"]) == list(ARMS), artifact["arms"]
    secs = artifact["sections"]
    assert set(secs) == set(SECTIONS), set(secs) ^ set(SECTIONS)
    for name, sec in secs.items():
        assert isinstance(sec, dict) and sec, name
        if name in ARMED_SECTIONS:
            assert set(sec) == set(ARMS), (name, set(sec))
            for arm, sub in sec.items():
                _validate_leaf(name, sub)
        else:
            _validate_leaf(name, sec)


def failed_sections(artifact: Dict) -> list:
    """Section names that recorded {"error": ...} — fault isolation keeps
    them from killing the artifact, but the CLI must still exit nonzero
    (a fully broken bench that 'succeeds' is an automation trap)."""
    out = []
    for name, sec in artifact.get("sections", {}).items():
        if not isinstance(sec, dict):
            continue
        if "error" in sec:
            out.append(name)
        else:                               # per-arm sub-sections
            out.extend(f"{name}.{arm}" for arm, sub in sec.items()
                       if isinstance(sub, dict) and "error" in sub)
    return out


def write_artifact(artifact: Dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2, sort_keys=True)
        f.write("\n")
