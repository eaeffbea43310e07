"""gdkvm serve: batching engine + HTTP round trips (CPU, tiny model).

The load-bearing check is EXACTNESS: masks served through the multi-stream
active-mask engine must equal direct stream_video() output per session —
idle-slot freezing, state carry, and chunk splitting must not perturb the
recurrence.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdkvm_tpu.config.schema import ModelConfig
from gdkvm_tpu.models.gdkvm import GDKVM, init_params
from gdkvm_tpu.serve import BatchingEngine, ServeClient, make_server

pytestmark = pytest.mark.slow   # engine+HTTP tests: ~20 s each on 1 CPU

SIZE = 48
CHUNK = 4


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(num_classes=2, enc_channels=(8, 16, 24, 32),
                      num_heads=2, head_dim_k=8, head_dim_v=8,
                      compute_dtype="float32")
    model = GDKVM(cfg=cfg)
    params = init_params(model, jax.random.PRNGKey(0), SIZE)
    return model, params


@pytest.fixture()
def engine(small_model):
    model, params = small_model
    eng = BatchingEngine(model=model, params=params, streams=3,
                        chunk=CHUNK, image_size=SIZE)
    yield eng
    eng.close()


def _video(seed, t=10):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (t, SIZE, SIZE, 1), np.uint8)


def test_engine_matches_stream_video(small_model, engine):
    """Engine output ≡ direct chunked streaming, including a ragged tail."""
    from gdkvm_tpu.eval.streaming import stream_video
    model, params = small_model
    video = _video(0, t=10)                     # 10 = 2×4 + ragged 2
    sid = engine.open_session()["session"]
    got = engine.infer(sid, video)
    want = stream_video(model, params, video, chunk=CHUNK)
    np.testing.assert_array_equal(got, want)


def test_engine_concurrent_sessions_exact(small_model, engine):
    """3 sessions in flight concurrently, each ≡ its own stream_video."""
    from gdkvm_tpu.eval.streaming import stream_video
    model, params = small_model
    videos = [_video(i, t=8 + 2 * i) for i in range(3)]
    sids = [engine.open_session()["session"] for _ in range(3)]
    results = {}

    def run(i):
        results[i] = engine.infer(sids[i], videos[i])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(3):
        want = stream_video(model, params, videos[i], chunk=CHUNK)
        np.testing.assert_array_equal(results[i], want)


def test_idle_session_gc_reclaims_slot(small_model):
    """A crashed client must not leak its slot (VERDICT r3 item 3): with
    session_ttl set, an idle session is reclaimed by the batcher and the
    pool regains capacity; an ACTIVE session within its TTL survives."""
    import time as _time
    model, params = small_model
    eng = BatchingEngine(model=model, params=params, streams=1,
                         chunk=CHUNK, image_size=SIZE, session_ttl=1.0)
    try:
        s1 = eng.open_session()
        eng.infer(s1["session"], _video(1, t=4))
        # Active within TTL: still alive shortly after the infer.
        _time.sleep(0.3)
        assert eng.slot_of(s1["session"]) is not None
        assert eng.open_session() is None        # pool genuinely full
        # Client "crashes" (goes silent).  After TTL the slot returns.
        deadline = _time.monotonic() + 10.0
        while eng.slot_of(s1["session"]) is not None:
            assert _time.monotonic() < deadline, "GC never reclaimed slot"
            _time.sleep(0.2)
        assert eng.sessions_reclaimed == 1
        s2 = eng.open_session()
        assert s2 is not None, "reclaimed slot not reusable"
        # The recycled slot starts from a zero state (reset-on-open).
        video = _video(2, t=4)
        from gdkvm_tpu.eval.streaming import stream_video
        np.testing.assert_array_equal(
            eng.infer(s2["session"], video),
            stream_video(model, params, video, chunk=CHUNK))
        # A dead session id fails cleanly.
        with pytest.raises(KeyError):
            eng.infer(s1["session"], video)
    finally:
        eng.close()


def test_infer_rejects_recycled_slot_mid_staging(small_model):
    """Slot-reuse race (ADVICE r4, medium): infer() resolves sid→slot,
    then STAGES (device resize/split can take seconds).  If the session is
    closed/GC'd and the slot recycled to a NEW client during staging, the
    stale client's pieces must NOT be enqueued into the new session's
    queue — the enqueue re-validates session identity under the lock."""
    model, params = small_model
    eng = BatchingEngine(model=model, params=params, streams=1,
                         chunk=CHUNK, image_size=SIZE)
    try:
        s1 = eng.open_session()["session"]
        staged, gate = threading.Event(), threading.Event()
        orig = eng._split_fn

        def slow_split(n):            # block mid-staging, deterministically
            fn = orig(n)

            def wrapped(v):
                staged.set()
                assert gate.wait(timeout=30)
                return fn(v)
            return wrapped

        eng._split_fn = slow_split
        err = {}

        def run():
            try:
                eng.infer(s1, _video(1, t=2 * CHUNK))   # 2 pieces → split
            except KeyError as exc:
                err["e"] = exc

        th = threading.Thread(target=run)
        th.start()
        assert staged.wait(timeout=30)
        eng.close_session(s1)                 # GC reclaims mid-staging…
        s2 = eng.open_session()["session"]    # …and the slot is recycled
        eng._split_fn = orig
        gate.set()
        th.join(timeout=30)
        assert not th.is_alive()
        assert isinstance(err.get("e"), KeyError), err
        slot2 = eng.slot_of(s2)               # (resolve OUTSIDE the lock
        with eng._lock:                       # — it is not reentrant)
            assert not eng._queues[slot2]     # new session unpolluted
    finally:
        eng.close()


def test_gc_close_rechecks_staleness_under_one_lock(small_model):
    """A session that becomes active between the GC's stale scan and the
    close must be spared (ADVICE r4): _close_if_stale re-checks last
    activity AND queue emptiness under one lock acquisition."""
    import time as _time
    from gdkvm_tpu.serve import _Piece
    model, params = small_model
    eng = BatchingEngine(model=model, params=params, streams=1,
                         chunk=CHUNK, image_size=SIZE, session_ttl=None)
    try:
        sid = eng.open_session()["session"]
        slot = eng.slot_of(sid)
        eng.session_ttl = 30.0
        # Scenario A: the scan said stale, then a request landed (all
        # inside one lock hold so the batcher cannot interleave).
        with eng._lock:
            eng._last_active[slot] = _time.monotonic() - 60.0
            assert eng._stale_sids() == [sid]       # old scan's verdict
            eng._last_active[slot] = _time.monotonic()
        assert eng._close_if_stale(sid) is False
        assert eng.slot_of(sid) == slot             # spared
        # Scenario B: stale by time but work queued → spared too.
        eng.pause()
        with eng._lock:
            eng._last_active[slot] = _time.monotonic() - 60.0
            eng._queues[slot].append(_Piece(None, 0))
        assert eng._close_if_stale(sid) is False
        with eng._lock:
            eng._queues[slot].clear()
            eng._last_active[slot] = _time.monotonic() - 60.0
        eng.resume()
        # Genuinely stale: closed (by this call or the batcher's GC —
        # either way the slot is reclaimed).
        eng._close_if_stale(sid)
        deadline = _time.monotonic() + 10.0
        while eng.slot_of(sid) is not None:
            assert _time.monotonic() < deadline
            _time.sleep(0.05)
    finally:
        eng.close()


def test_client_failed_connect_leaves_no_half_connection():
    """A transient failure during connect() must not leave a
    half-initialized connection behind (ADVICE r4): a later request on a
    leftover object would auto-connect WITHOUT TCP_NODELAY."""
    c = ServeClient("127.0.0.1", 1, timeout=0.5)   # nothing listens here
    with pytest.raises(OSError):
        c.health()
    assert c._c is None


def test_queue_stats_measure_real_waiting(small_model):
    """drain_stats() semantics (VERDICT r4 item 4): pieces that genuinely
    queue report positive wait and their depth at enqueue; an idle engine
    reports ~zero wait.  (The r5 serve-bench used these samples to refute
    the 'p99 is queueing' hypothesis — depth 0 everywhere — so the
    instrument itself must demonstrably detect queueing.)"""
    import time as _time
    model, params = small_model
    eng = BatchingEngine(model=model, params=params, streams=1,
                         chunk=CHUNK, image_size=SIZE)
    try:
        sid = eng.open_session()["session"]
        eng.infer(sid, _video(1, t=CHUNK))       # idle-engine request
        idle = eng.drain_stats()
        assert len(idle) == 1
        assert idle[0][2] == 0                   # depth 0 at enqueue
        # Now force queueing: hold the batcher, enqueue 3 pieces, sleep,
        # release — every piece waited ≥ the hold time minus one tick.
        eng.pause()
        done = {}
        th = threading.Thread(
            target=lambda: done.__setitem__(
                "m", eng.infer(sid, _video(2, t=3 * CHUNK))))
        th.start()
        for _ in range(200):                     # wait for the enqueue
            with eng._lock:
                if len(eng._queues[0]) == 3:
                    break
            _time.sleep(0.02)
        _time.sleep(0.5)
        eng.resume()
        th.join(timeout=60)
        assert not th.is_alive() and done["m"].shape == (3 * CHUNK, SIZE,
                                                         SIZE)
        stats = eng.drain_stats()
        assert len(stats) == 3
        waits = sorted(s[0] for s in stats)
        depths = sorted(s[2] for s in stats)
        assert depths == [0, 1, 2]               # pieces ahead recorded
        assert waits[0] >= 400                   # held ≥0.5 s ⇒ real wait
        assert all(s[1] > 0 for s in stats)      # service time positive
    finally:
        eng.close()


def test_engine_state_carry_across_infer_calls(small_model, engine):
    """Two infer() calls on one session ≡ one call over the whole video
    (the server-side GDR state carries between requests)."""
    from gdkvm_tpu.eval.streaming import stream_video
    model, params = small_model
    video = _video(42, t=8)
    sid = engine.open_session()["session"]
    part1 = engine.infer(sid, video[:4])
    part2 = engine.infer(sid, video[4:])
    want = stream_video(model, params, video, chunk=CHUNK)
    np.testing.assert_array_equal(np.concatenate([part1, part2]), want)


def test_engine_session_reset_on_reopen(small_model, engine):
    """A new session on a recycled slot starts from a zero state."""
    video = _video(7, t=4)
    s1 = engine.open_session()
    first = engine.infer(s1["session"], video)
    engine.infer(s1["session"], _video(8, t=4))   # advance the state
    assert engine.close_session(s1["session"])
    s2 = engine.open_session()
    again = engine.infer(s2["session"], video)
    np.testing.assert_array_equal(first, again)


def test_http_round_trip(small_model, engine):
    srv = make_server(engine, "127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = srv.server_address
        c = ServeClient(host, port)
        info = c.health()
        assert info["ok"] and info["chunk"] == CHUNK
        c.open()
        video = _video(3, t=6)
        masks = c.infer(video)
        assert masks.shape == (6, SIZE, SIZE)
        assert masks.dtype == np.uint8
        c.close()
        # Closed session rejects further inference.
        with pytest.raises(RuntimeError):
            sid_gone = ServeClient(host, port)
            sid_gone.session = "deadbeef0000"
            sid_gone.infer(video)
    finally:
        srv.shutdown()


def test_http_slot_exhaustion(small_model, engine):
    srv = make_server(engine, "127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = srv.server_address
        clients = []
        for _ in range(engine.streams):
            c = ServeClient(host, port)
            c.open()
            clients.append(c)
        extra = ServeClient(host, port)
        with pytest.raises(RuntimeError, match="busy"):
            extra.open()
        clients[0].close()
        extra.open()           # freed slot is reusable
        extra.close()
        for c in clients[1:]:
            c.close()
    finally:
        srv.shutdown()


def test_engine_artifact_path(small_model, tmp_path):
    """Engine over an exported StableHLO artifact ≡ live-model engine."""
    from gdkvm_tpu.io.export import save_artifact
    model, params = small_model
    art = str(tmp_path / "art")
    save_artifact(art, model, params, image_size=SIZE, chunk=CHUNK,
                  batch=2)
    eng = BatchingEngine(artifact=art, streams=2, chunk=CHUNK)
    try:
        video = _video(5, t=8)
        sid = eng.open_session()["session"]
        got = eng.infer(sid, video)
        from gdkvm_tpu.eval.streaming import stream_video
        want = stream_video(model, params, video, chunk=CHUNK)
        np.testing.assert_array_equal(got, want)
    finally:
        eng.close()
    with pytest.raises(ValueError, match="re-export"):
        BatchingEngine(artifact=art, streams=4, chunk=CHUNK)


def test_engine_arbitrary_resolution_input(small_model, engine):
    """A native-resolution video is resized on device to the engine size;
    masks come back at the engine size."""
    rng = np.random.default_rng(9)
    video = rng.integers(0, 255, (6, 100, 140, 1), np.uint8)
    sid = engine.open_session()["session"]
    masks = engine.infer(sid, video)
    assert masks.shape == (6, SIZE, SIZE)
    assert masks.dtype == np.uint8


def test_close_session_fails_pending_pieces(small_model):
    """Closing a session with queued work unblocks a waiting infer() with
    a KeyError — deterministically: the batcher is paused so the queued
    pieces cannot drain before the close lands (VERDICT r2 item 6)."""
    model, params = small_model
    eng = BatchingEngine(model=model, params=params, streams=1,
                         chunk=CHUNK, image_size=SIZE)
    try:
        sid = eng.open_session()["session"]
        done = {}
        eng.pause()                      # hold ticks: work stays queued

        def run():
            try:
                eng.infer(sid, _video(1, t=40))   # 10 pieces queued
            except KeyError as exc:
                done["err"] = exc

        t = threading.Thread(target=run)
        t.start()
        # Wait until the pieces are actually enqueued, then close.
        for _ in range(100):
            with eng._lock:
                if eng._queues.get(0):
                    break
            import time
            time.sleep(0.05)
        eng.close_session(sid)
        eng.resume()
        t.join(timeout=30)
        assert not t.is_alive()
        assert isinstance(done.get("err"), KeyError)
    finally:
        eng.close()


def test_engine_pack_unpack_round_trip(small_model, engine):
    """Device bit-pack → host unpack is exact for every class count."""
    import jax.numpy as jnp
    for k in (2, 3, 4, 7, 16):
        bits = 1 if k <= 2 else 2 if k <= 4 else 4
        eng_bits = engine._pack_bits
        engine._pack_bits = bits
        engine._post_cache.clear()
        rng = np.random.default_rng(k)
        masks = rng.integers(0, k, (3, CHUNK, SIZE, SIZE)).astype(np.uint8)
        idx = jnp.asarray([0, 2], dtype=jnp.int32)
        packed = np.asarray(jax.device_get(
            engine._post_fn(2)(jnp.asarray(masks), idx)))
        assert packed.shape[-1] == SIZE * bits // 8
        got = engine._unpack(packed)
        np.testing.assert_array_equal(got, masks[[0, 2]])
        engine._pack_bits = eng_bits
        engine._post_cache.clear()


def test_engine_overload_raises(small_model):
    """Beyond the in-flight byte budget, infer raises EngineOverloaded
    instead of queueing unboundedly."""
    from gdkvm_tpu.serve import EngineOverloaded
    model, params = small_model
    eng = BatchingEngine(model=model, params=params, streams=1,
                         chunk=CHUNK, image_size=SIZE,
                         max_inflight_mb=0.01)   # 10 KB budget
    try:
        sid = eng.open_session()["session"]
        eng.pause()
        with pytest.raises(EngineOverloaded):
            eng.infer(sid, _video(1, t=40))      # 40×48×48 ≈ 92 KB
        eng.resume()
        # Small requests still fit.
        masks = eng.infer(sid, _video(1, t=2))
        assert masks.shape == (2, SIZE, SIZE)
    finally:
        eng.close()


def test_http_overload_429(small_model):
    model, params = small_model
    eng = BatchingEngine(model=model, params=params, streams=1,
                         chunk=CHUNK, image_size=SIZE,
                         max_inflight_mb=0.01)
    srv = make_server(eng, "127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = srv.server_address
        c = ServeClient(host, port)
        c.open()
        eng.pause()
        with pytest.raises(RuntimeError, match="budget"):
            c.infer(_video(2, t=40))
        eng.resume()
        c.close()
    finally:
        srv.shutdown()
        eng.close()


def test_client_timeout_raises_cleanly():
    """A stalled server surfaces as TimeoutError, not a hang (VERDICT r2
    item 10).  A bare listening socket that never answers stands in for
    a stalled tick."""
    import socket
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    try:
        host, port = srv.getsockname()
        c = ServeClient(host, port, timeout=0.5)
        c.session = "deadbeef0000"
        with pytest.raises(TimeoutError, match="did not answer"):
            c.infer(np.zeros((2, SIZE, SIZE, 1), np.uint8))
    finally:
        srv.close()


def test_resize_cache_capped(small_model, engine):
    """Distinct source resolutions beyond the LRU cap evict the oldest
    jitted resize instead of growing unboundedly."""
    from gdkvm_tpu.serve import _RESIZE_CACHE_MAX
    rng = np.random.default_rng(0)
    sid = engine.open_session()["session"]
    for i in range(_RESIZE_CACHE_MAX + 3):
        video = rng.integers(0, 255, (2, 50 + 2 * i, 60, 1), np.uint8)
        masks = engine.infer(sid, video)
        assert masks.shape == (2, SIZE, SIZE)
    assert len(engine._resize_cache) <= _RESIZE_CACHE_MAX


def test_engine_quantized_model_exact_vs_stream_video(small_model):
    """A W8A8-quantized model (ops/quant.py) serves bit-identically to its
    own direct stream_video output — the engine's slot machinery must be
    transparent to the quantized forward, and the quant cfg tag must keep
    its jitted traces separate from the full-precision fixture's."""
    from gdkvm_tpu.eval.streaming import stream_video
    from gdkvm_tpu.ops import quant

    model, params = small_model
    rng = np.random.default_rng(7)
    batches = [rng.random((1, CHUNK, SIZE, SIZE, 1)).astype(np.float32)]
    scales = quant.calibrate_act_scales(model, params, batches)
    qmodel = quant.w8a8_model(model, scales)

    video = _video(11, t=6)
    eng = BatchingEngine(model=qmodel, params=params, streams=2,
                         chunk=CHUNK, image_size=SIZE)
    try:
        sid = eng.open_session()["session"]
        got = eng.infer(sid, video)
    finally:
        eng.close()
    want = stream_video(qmodel, params, video, chunk=CHUNK)
    np.testing.assert_array_equal(got, want)
    # Execution-path check (not mask-level, which argmax can mask): the
    # quantized model's LOGITS must differ from full precision, proving
    # the engine really ran the int8 path rather than a cache collision
    # with the fp trace (the cfg quant tag is what prevents that).
    frames = jnp.asarray(video[None, :CHUNK], jnp.float32) / 255.0
    lq, _ = jax.jit(qmodel.apply)(params, frames)
    lf, _ = jax.jit(model.apply)(params, frames)
    assert not np.allclose(np.asarray(lq), np.asarray(lf))


def test_engine_mesh_sharded_exact_vs_stream_video(small_model):
    """Slot pool sharded over a 4-chip 'data' mesh serves bit-identically
    to single-device stream_video per session (slots never interact; the
    data axis only changes WHERE a slot's state lives)."""
    from gdkvm_tpu.eval.streaming import stream_video
    from gdkvm_tpu.parallel.mesh import make_mesh

    model, params = small_model
    eng = BatchingEngine(model=model, params=params, streams=4,
                         chunk=CHUNK, image_size=SIZE,
                         mesh=make_mesh(data=4, model=1))
    try:
        vids = {eng.open_session()["session"]: _video(40 + i, t=9)
                for i in range(3)}
        got = {}
        ts = []
        for sid, v in vids.items():
            t = threading.Thread(
                target=lambda s=sid, vv=v: got.__setitem__(
                    s, eng.infer(s, vv)))
            t.start()
            ts.append(t)
        for t in ts:
            t.join(timeout=120)
    finally:
        eng.close()
    for sid, v in vids.items():
        want = stream_video(model, params, v, chunk=CHUNK)
        np.testing.assert_array_equal(got[sid], want)


def test_engine_quantized_mesh_composes_exact(small_model):
    """--quant-scales and --mesh compose (both are checkpoint-path serve
    options, cli.py): a W8A8 model served over a data-sharded slot pool is
    bit-identical to its own single-device stream_video."""
    from gdkvm_tpu.eval.streaming import stream_video
    from gdkvm_tpu.ops import quant
    from gdkvm_tpu.parallel.mesh import make_mesh

    model, params = small_model
    rng = np.random.default_rng(13)
    batches = [rng.random((1, CHUNK, SIZE, SIZE, 1)).astype(np.float32)]
    qmodel = quant.w8a8_model(
        model, quant.calibrate_act_scales(model, params, batches))

    video = _video(21, t=6)
    eng = BatchingEngine(model=qmodel, params=params, streams=2,
                         chunk=CHUNK, image_size=SIZE,
                         mesh=make_mesh(data=2, model=1))
    try:
        sid = eng.open_session()["session"]
        got = eng.infer(sid, video)
    finally:
        eng.close()
    want = stream_video(qmodel, params, video, chunk=CHUNK)
    np.testing.assert_array_equal(got, want)
    # Proof the int8 path ran (not an fp-trace cache collision): the
    # quantized logits differ from full precision on the same frames.
    frames = jnp.asarray(video[None, :CHUNK], jnp.float32) / 255.0
    lq, _ = jax.jit(qmodel.apply)(params, frames)
    lf, _ = jax.jit(model.apply)(params, frames)
    assert not np.allclose(np.asarray(lq), np.asarray(lf))


def test_engine_mesh_with_model_axis_smoke(small_model):
    """data=2 × model=2 (LKVA heads sharded): the serving tick runs over
    the 2D mesh; masks agree with single-device up to the fp32
    reassociation the head psum introduces (≥99% pixel agreement on a
    random init is far beyond chance for 2 classes)."""
    from gdkvm_tpu.eval.streaming import stream_video
    from gdkvm_tpu.parallel.mesh import make_mesh

    model, params = small_model
    eng = BatchingEngine(model=model, params=params, streams=2,
                         chunk=CHUNK, image_size=SIZE,
                         mesh=make_mesh(data=2, model=2))
    try:
        sid = eng.open_session()["session"]
        video = _video(50, t=6)
        got = eng.infer(sid, video)
    finally:
        eng.close()
    want = stream_video(model, params, video, chunk=CHUNK)
    assert got.shape == want.shape
    assert (got == want).mean() > 0.99


def test_engine_mesh_streams_divisibility_error(small_model):
    from gdkvm_tpu.parallel.mesh import make_mesh
    model, params = small_model
    with pytest.raises(ValueError, match="divisible"):
        BatchingEngine(model=model, params=params, streams=3,
                       chunk=CHUNK, image_size=SIZE,
                       mesh=make_mesh(data=4, model=1), warmup=False)
