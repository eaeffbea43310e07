"""`gdkvm serve` — multi-stream streaming segmentation over HTTP.

Closes the reference's "real-time performance" claim end-to-end (reference:
README.md:22; deployment contract docs/SERVING.md): a server that accepts
cine-loop chunks over a socket and returns masks, with the GDR memory state
held server-side per session.

Design (TPU-first):
  - A fixed pool of ``streams`` SLOTS.  All slots advance in ONE jitted
    multi-stream step per tick — static shapes, one device program, the
    multi-stream batcher measured at 5.5× single-stream throughput
    (BASELINE.md).  Slots without pending work are computed but their
    state is frozen via an active-mask select (wasted FLOPs on idle slots
    buy zero dynamic shapes — the right TPU trade).
  - Each HTTP request thread splits its video into ``chunk``-frame pieces,
    enqueues them in order, and blocks until the batcher delivers; pieces
    from different sessions ride the same device step.
  - Frames/masks travel as raw .npy bodies (uint8) — no codec deps.

Endpoints:
  POST   /v1/sessions                  → {"session": id, "slot": n}
  POST   /v1/sessions/<id>/infer       .npy (T,H,W[,1]) u8 → .npy (T,H,W) u8
  DELETE /v1/sessions/<id>             → {"closed": true}
  GET    /healthz                      → model/config info JSON

The engine serves either a live (model, params) pair or an exported
StableHLO artifact (io/export.py) wrapped in the same active-mask step.
"""

from __future__ import annotations

import io
import json
import re
import threading
import uuid
from collections import deque
from typing import Dict, Optional

import numpy as np


def _np_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _np_from_bytes(data: bytes) -> np.ndarray:
    return np.load(io.BytesIO(data), allow_pickle=False)


class _Piece:
    """One chunk-sized unit of work for a slot."""

    __slots__ = ("frames_dev", "done", "masks", "error")

    def __init__(self, frames_dev):
        self.frames_dev = frames_dev
        self.done = threading.Event()
        self.masks: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None


class BatchingEngine:
    """Slot-pool batching engine around one jitted multi-stream step."""

    def __init__(self, *, model=None, params=None, artifact=None,
                 streams: int = 4, chunk: int = 16, image_size: int = 112,
                 tick_ms: float = 1.0):
        import jax
        import jax.numpy as jnp

        from gdkvm_tpu.eval.metrics import mask_from_logits

        self._jax = jax
        self.streams = streams
        self.chunk = chunk
        self.image_size = image_size

        if artifact is not None:
            from gdkvm_tpu.io.export import load_artifact
            sm = load_artifact(artifact) if isinstance(artifact, str) \
                else artifact
            sig = sm.meta["signature"]
            if sig["frames_u8"][0] != streams or sig["frames_u8"][1] != chunk:
                raise ValueError(
                    f"artifact was exported for batch={sig['frames_u8'][0]} "
                    f"chunk={sig['frames_u8'][1]}; serve requested "
                    f"streams={streams} chunk={chunk} — re-export with "
                    f"--batch/--chunk matching the serve config")
            self.image_size = sig["frames_u8"][2]
            self.num_classes = sm.meta["num_classes"]
            mem_shape = tuple(sig["mem"])

            def raw_step(frames_u8, mem, seen):
                return sm.step(frames_u8, mem, seen)
        else:
            from gdkvm_tpu.models.gdkvm import StreamState
            self.num_classes = model.cfg.num_classes
            mem_shape = (streams, model.cfg.num_heads,
                         model.cfg.head_dim_k, model.cfg.head_dim_v)

            def raw_step(frames_u8, mem, seen):
                x = frames_u8.astype(jnp.float32) / 255.0
                logits, st = model.apply(params, x,
                                         StreamState(mem=mem,
                                                     frames_seen=seen))
                return logits, st.mem, st.frames_seen

        def step(frames_u8, mem, seen, active):
            """One tick: advance every slot, freeze inactive slots' state.

            active: (S,) f32 1/0.  Inactive slots still compute (static
            shapes) but their memory does not move and their masks are
            discarded host-side.
            """
            logits, mem2, seen2 = raw_step(frames_u8, mem, seen)
            masks = mask_from_logits(logits)
            mem_out = jnp.where(active.reshape((-1,) + (1,) * (mem2.ndim - 1))
                                > 0, mem2, mem)
            seen_out = jnp.where(active > 0, seen2, seen)
            return masks, mem_out, seen_out

        self._step = jax.jit(step, donate_argnums=(1, 2))
        self._mem = jax.device_put(jnp.zeros(mem_shape, jnp.float32))
        self._seen = jax.device_put(jnp.zeros((streams,), jnp.int32))

        self._resize_cache: Dict[tuple, object] = {}
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._queues: Dict[int, deque] = {}      # slot → deque[_Piece]
        self._sessions: Dict[str, int] = {}      # session id → slot
        self._free = list(range(streams))[::-1]  # pop() yields slot 0 first
        self._reset_slots: set = set()
        self._closed = False
        self.ticks = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        self._tick_s = tick_ms / 1e3

    # -- session management -------------------------------------------------

    def open_session(self) -> Optional[dict]:
        with self._lock:
            if not self._free:
                return None
            slot = self._free.pop()
            sid = uuid.uuid4().hex[:12]
            self._sessions[sid] = slot
            self._queues[slot] = deque()
            self._reset_slots.add(slot)     # zero state before first use
            return {"session": sid, "slot": slot}

    def close_session(self, sid: str) -> bool:
        with self._lock:
            slot = self._sessions.pop(sid, None)
            if slot is None:
                return False
            pending = self._queues.pop(slot, None)
            self._free.append(slot)
        # Fail any queued pieces so a concurrent infer() unblocks instead
        # of waiting forever on work that will never be scheduled.
        for piece in (pending or ()):
            piece.error = KeyError(f"session {sid!r} closed with work "
                                   f"pending")
            piece.done.set()
        return True

    def slot_of(self, sid: str) -> Optional[int]:
        with self._lock:
            return self._sessions.get(sid)

    # -- inference ----------------------------------------------------------

    def _device_resize(self, video_u8: np.ndarray) -> np.ndarray:
        """Resize a native-resolution video to the engine size on device
        (jitted per source shape); masks are then at the engine size."""
        jax = self._jax
        key = ("resize", video_u8.shape[1:3])
        fn = self._resize_cache.get(key)
        if fn is None:
            from gdkvm_tpu.ops.preproc import resize_u8
            size = self.image_size

            def _resize(v):
                return resize_u8(v, (size, size))

            fn = jax.jit(_resize)
            self._resize_cache[key] = fn
        return np.asarray(jax.device_get(fn(jax.device_put(
            np.ascontiguousarray(video_u8)))))

    def infer(self, sid: str, video_u8: np.ndarray) -> np.ndarray:
        """Blocking: segment (T,H,W[,1]) u8, threading the session state.

        One in-flight infer per session: the memory is a causal recurrence,
        so a second concurrent call on the SAME session would interleave
        its chunks into the first call's state timeline.  Different
        sessions batch together freely (that is the whole design)."""
        jax = self._jax
        slot = self.slot_of(sid)
        if slot is None:
            raise KeyError(f"unknown session {sid!r}")
        if video_u8.ndim == 3:
            video_u8 = video_u8[..., None]
        t_total, hh, ww = video_u8.shape[:3]
        if (hh, ww) != (self.image_size, self.image_size):
            # Arbitrary-resolution input: resize ON DEVICE (fused matmul
            # preproc, ops/preproc.py), one jitted call per source shape.
            video_u8 = self._device_resize(video_u8)
        # Split into chunk pieces; stage on device up front (explicit
        # async device_put — jit-argument numpy upload is ~60× slower on
        # remote-dispatch platforms, CLAUDE.md rule 8).
        pieces = []
        for lo in range(0, t_total, self.chunk):
            piece = video_u8[lo:lo + self.chunk]
            if piece.shape[0] < self.chunk:
                pad = self.chunk - piece.shape[0]
                piece = np.concatenate(
                    [piece, np.repeat(piece[-1:], pad, axis=0)])
            pieces.append(_Piece(jax.device_put(
                np.ascontiguousarray(piece))))
        with self._work:
            q = self._queues.get(slot)
            if q is None:
                raise KeyError(f"session {sid!r} closed")
            q.extend(pieces)
            self._work.notify()
        outs = []
        for p in pieces:
            p.done.wait()
            if p.error is not None:
                raise p.error
            outs.append(p.masks)
        return np.concatenate(outs)[:t_total]

    # -- batcher loop -------------------------------------------------------

    def _run(self):
        import jax
        import jax.numpy as jnp

        zero_chunk = np.zeros((self.chunk, self.image_size,
                               self.image_size, 1), np.uint8)
        zero_dev = jax.device_put(zero_chunk)
        while True:
            with self._work:
                while not self._closed and \
                        not any(self._queues.get(s) for s in self._queues):
                    self._work.wait(timeout=0.5)
                if self._closed:
                    return
                batch_pieces: Dict[int, _Piece] = {}
                for slot, q in self._queues.items():
                    if q:
                        batch_pieces[slot] = q.popleft()
                resets = self._reset_slots
                self._reset_slots = set()
            try:
                if resets:
                    # Zero the joining slots' state (host-side rebuild of
                    # the small state tensors; happens once per session).
                    mem_h = np.array(jax.device_get(self._mem))   # writable
                    seen_h = np.array(jax.device_get(self._seen))
                    for s in resets:
                        mem_h[s] = 0
                        seen_h[s] = 0
                    self._mem = jax.device_put(mem_h)
                    self._seen = jax.device_put(seen_h)
                frames = [zero_dev] * self.streams
                active = np.zeros((self.streams,), np.float32)
                for slot, piece in batch_pieces.items():
                    frames[slot] = piece.frames_dev
                    active[slot] = 1.0
                fb = jnp.stack(frames)
                masks, self._mem, self._seen = self._step(
                    fb, self._mem, self._seen, jnp.asarray(active))
                masks_h = np.asarray(jax.device_get(masks))
                for slot, piece in batch_pieces.items():
                    piece.masks = masks_h[slot]
                    piece.done.set()
            except Exception as exc:          # deliver, don't kill the loop
                for piece in batch_pieces.values():
                    piece.error = exc
                    piece.done.set()
            self.ticks += 1

    def close(self):
        with self._work:
            self._closed = True
            self._work.notify_all()
        self._thread.join(timeout=5)


# ---------------------------------------------------------------------------
# HTTP layer (stdlib only).
# ---------------------------------------------------------------------------

_SESS_RE = re.compile(r"^/v1/sessions/([0-9a-f]+)(/infer)?$")


def make_server(engine: BatchingEngine, host: str = "127.0.0.1",
                port: int = 0):
    """Build a ThreadingHTTPServer bound to (host, port)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):          # quiet by default
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _bytes(self, code: int, body: bytes,
                   ctype: str = "application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True,
                    "streams": engine.streams,
                    "chunk": engine.chunk,
                    "image_size": engine.image_size,
                    "num_classes": engine.num_classes,
                    "ticks": engine.ticks,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/v1/sessions":
                out = engine.open_session()
                if out is None:
                    self._json(409, {"error": "all stream slots busy",
                                     "streams": engine.streams})
                else:
                    self._json(200, out)
                return
            m = _SESS_RE.match(self.path)
            if m and m.group(2):
                sid = m.group(1)
                length = int(self.headers.get("Content-Length", "0"))
                data = self.rfile.read(length)
                try:
                    video = _np_from_bytes(data)
                    if video.dtype != np.uint8:
                        raise ValueError("frames must be uint8")
                    masks = engine.infer(sid, video)
                except KeyError as exc:
                    self._json(404, {"error": str(exc)})
                    return
                except Exception as exc:
                    self._json(400, {"error": f"{type(exc).__name__}: "
                                              f"{exc}"})
                    return
                self._bytes(200, _np_bytes(masks))
                return
            self._json(404, {"error": "not found"})

        def do_DELETE(self):
            m = _SESS_RE.match(self.path)
            if m and not m.group(2):
                ok = engine.close_session(m.group(1))
                self._json(200 if ok else 404, {"closed": ok})
                return
            self._json(404, {"error": "not found"})

    return ThreadingHTTPServer((host, port), Handler)


class ServeClient:
    """Minimal stdlib client: one session = one streaming video."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self.host, self.port, self.timeout = host, port, timeout
        self.session: Optional[str] = None

    def _conn(self):
        import http.client
        return http.client.HTTPConnection(self.host, self.port,
                                          timeout=self.timeout)

    def _request(self, method: str, path: str, body: bytes = b""):
        c = self._conn()
        try:
            c.request(method, path, body=body)
            r = c.getresponse()
            data = r.read()
            return r.status, r.getheader("Content-Type", ""), data
        finally:
            c.close()

    def health(self) -> dict:
        status, _, data = self._request("GET", "/healthz")
        assert status == 200, data
        return json.loads(data)

    def open(self) -> dict:
        status, _, data = self._request("POST", "/v1/sessions")
        out = json.loads(data)
        if status != 200:
            raise RuntimeError(out.get("error", data))
        self.session = out["session"]
        return out

    def infer(self, video_u8: np.ndarray) -> np.ndarray:
        assert self.session, "open() first"
        status, ctype, data = self._request(
            "POST", f"/v1/sessions/{self.session}/infer",
            _np_bytes(np.ascontiguousarray(video_u8)))
        if status != 200:
            raise RuntimeError(json.loads(data).get("error", data))
        return _np_from_bytes(data)

    def close(self) -> None:
        if self.session:
            self._request("DELETE", f"/v1/sessions/{self.session}")
            self.session = None
