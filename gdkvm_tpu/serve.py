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
  - Host traffic is proportional to ACTIVE work, not pool size (r3):
    session resets ride the jitted step as a (S,) mask (no host state
    round trip), only active slots' masks are gathered device-side
    before the fetch, and masks cross the link BIT-PACKED (1/2/4 bits
    per pixel for K≤2/4/16 classes — an exact, device-cheap transform
    that cuts the dominant fetch bytes 2-8× on remote-dispatch links).
  - One-deep pipelining: tick t+1 is dispatched before tick t's masks
    are fetched (state chains device-side), overlapping host fetch and
    delivery with device compute.
  - A constructor warmup tick moves the first-contact jit compile out of
    the first user request (cold p99 was paying ~20 s through the
    remote-compile tunnel).
  - Each HTTP request thread splits its video into ``chunk``-frame pieces,
    enqueues them in order, and blocks until the batcher delivers; pieces
    from different sessions ride the same device step.
  - Frames/masks travel as raw .npy bodies (uint8) — no codec deps.
  - Backpressure: the engine bounds in-flight request bytes
    (``max_inflight_mb``); beyond it, infer raises EngineOverloaded
    (HTTP 429) instead of queueing unboundedly.
  - Multi-chip: pass a ``jax.sharding.Mesh`` (``--mesh`` on the CLI) and
    the slot pool shards over the 'data' axis — each chip owns
    streams/d slots and their GDR states, the tick stays ONE jit over
    the mesh (slots never interact, so the forward needs no
    collectives; 'model' > 1 shards LKVA heads as in training), and
    per-tick frames ship only to the chip that owns their slot.
    Serving throughput scales with chips the same way training batch
    does; exactness vs single-device is tested on the CPU mesh.

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
import time
import uuid
from collections import OrderedDict, deque
from typing import Dict, Optional

import numpy as np

_RESIZE_CACHE_MAX = 8        # distinct source resolutions kept jitted


def _np_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _np_from_bytes(data: bytes) -> np.ndarray:
    return np.load(io.BytesIO(data), allow_pickle=False)


class EngineOverloaded(RuntimeError):
    """Raised when the in-flight byte budget is exhausted (HTTP 429)."""


class _Piece:
    """One chunk-sized unit of work for a slot."""

    __slots__ = ("frames_dev", "done", "masks", "error", "nbytes",
                 "t_enq", "t_disp", "depth")

    def __init__(self, frames_dev, nbytes: int):
        self.frames_dev = frames_dev
        self.nbytes = nbytes
        self.done = threading.Event()
        self.masks: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None
        # Queue-wait vs service attribution (VERDICT r4 item 4): enqueue
        # time, dispatch time, and queue depth at enqueue let serve-bench
        # decompose tail latency into waiting vs device work.
        self.t_enq: Optional[float] = None
        self.t_disp: Optional[float] = None
        self.depth: int = 0


class BatchingEngine:
    """Slot-pool batching engine around one jitted multi-stream step."""

    def __init__(self, *, model=None, params=None, artifact=None,
                 streams: int = 4, chunk: int = 16, image_size: int = 112,
                 tick_ms: float = 1.0, warmup: bool = True,
                 max_inflight_mb: float = 256.0, pack_masks: bool = True,
                 mesh=None, session_ttl: Optional[float] = None):
        import jax
        import jax.numpy as jnp

        from gdkvm_tpu.eval.metrics import mask_from_logits

        self._jax = jax
        self._jnp = jnp
        self.streams = streams
        self.chunk = chunk
        self.image_size = image_size

        # Multi-chip serving: the slot pool shards over the mesh's 'data'
        # axis (each chip owns streams/d slots and its own GDR states; the
        # step is ONE jit over the mesh — XLA inserts no collectives in
        # the forward because slots never interact; 'model' > 1 shards the
        # LKVA heads as in training).  Per-tick frames are assembled
        # host-side and device_put with the batch sharding, so each byte
        # ships only to the chip that owns its slot.
        self._mesh = mesh
        self._shard = None
        if mesh is not None:
            if artifact is not None:
                raise ValueError(
                    "mesh serving requires the (model, params) path — an "
                    "exported artifact is already lowered for one device")
            from gdkvm_tpu.parallel import mesh as M
            d = mesh.shape[M.DATA_AXIS]
            if streams % d:
                raise ValueError(
                    f"streams={streams} must be divisible by the mesh "
                    f"data axis ({d}) so every chip owns whole slots")
            self._shard = M.batch_sharding(mesh)
            params = jax.device_put(params, M.param_shardings(mesh, params))

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

        # Mask transfer packing: exact b-bit encoding, b = bits needed for
        # num_classes, provided the row length divides the pixels/byte.
        bits = 1 if self.num_classes <= 2 else \
            2 if self.num_classes <= 4 else \
            4 if self.num_classes <= 16 else 8
        self._pack_bits = bits if (pack_masks and bits < 8 and
                                   self.image_size % (8 // bits) == 0) else 8

        def step(frames, mem, seen, flags):
            """One tick: advance every slot, freeze inactive slots' state.

            frames: tuple of S (chunk,H,W,1) u8 arrays — stacked INSIDE
            the jit (an eager stack between jit calls is a separate
            dispatch every tick on remote platforms).  Mesh mode instead
            receives ONE (S,chunk,H,W,1) array already sharded over
            'data' (host-assembled — committed per-slot device arrays on
            different chips cannot be restacked inside one jit).
            flags: (2,S) f32 — one upload per tick, not two:
              flags[0] = active 1/0.  Inactive slots still compute
              (static shapes) but their memory does not move and their
              masks are discarded host-side.
              flags[1] = resets 1/0 — slots whose state is zeroed BEFORE
              the tick (device-side session reset; no host round trip).
            """
            frames_u8 = frames if self._mesh is not None \
                else jnp.stack(frames)
            active, resets = flags[0], flags[1]
            keep = (1.0 - resets)
            mem_in = mem * keep.reshape((-1,) + (1,) * (mem.ndim - 1))
            seen_in = seen * (1 - resets.astype(seen.dtype))
            logits, mem2, seen2 = raw_step(frames_u8, mem_in, seen_in)
            masks = mask_from_logits(logits)
            mem_out = jnp.where(active.reshape(
                (-1,) + (1,) * (mem2.ndim - 1)) > 0, mem2, mem_in)
            seen_out = jnp.where(active > 0, seen2, seen_in)
            return masks, mem_out, seen_out

        self._step = jax.jit(step, donate_argnums=(1, 2))
        put_state = (lambda a: jax.device_put(a, self._shard)) \
            if self._shard is not None else jax.device_put
        self._mem = put_state(jnp.zeros(mem_shape, jnp.float32))
        self._seen = put_state(jnp.zeros((streams,), jnp.int32))
        self._post_cache: Dict[int, object] = {}   # n_active → jitted fn
        self._split_cache: Dict[int, object] = {}  # n_pieces → jitted fn

        self._resize_cache: "OrderedDict[tuple, object]" = OrderedDict()
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._queues: Dict[int, deque] = {}      # slot → deque[_Piece]
        self._sessions: Dict[str, int] = {}      # session id → slot
        self._free = list(range(streams))[::-1]  # pop() yields slot 0 first
        # Idle-session GC: a crashed client would otherwise leak its slot
        # forever and permanently shrink pool capacity.  A session with no
        # queued work whose last activity (open / enqueue / tick) is older
        # than session_ttl seconds is reclaimed by the batcher thread.
        self.session_ttl = session_ttl
        self._last_active: Dict[int, float] = {}  # slot → monotonic time
        self.sessions_reclaimed = 0
        # Per-piece queue-wait / service / depth samples (bounded; drained
        # by serve-bench to attribute tail latency — wait is offered-load
        # queueing, service is device tick + fetch).
        self._stats: deque = deque(maxlen=8192)
        self._reset_slots: set = set()
        self._closed = False
        self._paused = False
        self._inflight_bytes = 0
        self._max_inflight = int(max_inflight_mb * 1e6)
        self.ticks = 0
        self._zero_dev = None if self._mesh is not None else jax.device_put(
            np.zeros((self.chunk, self.image_size, self.image_size, 1),
                     np.uint8))
        if warmup:
            self._warmup()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        self._tick_s = tick_ms / 1e3

    # -- device-side mask postprocess ---------------------------------------

    def _post_bucket(self, n_active: int) -> int:
        """Gather size for n_active slots: next power of two (capped at
        the pool size).  Why buckets: a per-count trace meant a NEW jit
        compile whenever the active-session count first hit a value —
        measured 1-10 s stalls mid-traffic through the remote-compile
        tunnel (BASELINE.md r4 serve-bench p99).  Buckets cost ≤2×
        transfer bytes on odd counts and cap the trace set at
        log2(S)+1, all pre-compiled by the constructor warmup."""
        b = 1
        while b < n_active:
            b *= 2
        return min(b, self.streams)

    def _post_fn(self, n_active: int):
        """Jitted gather-active + bit-pack, cached per bucket size.
        Output bytes ∝ active work (within 2×), not pool size."""
        fn = self._post_cache.get(n_active)
        if fn is None:
            jnp = self._jnp
            bits = self._pack_bits

            def post(masks, idx):
                m = masks[idx]                       # (k, chunk, H, W) u8
                if bits >= 8:
                    return m
                ppb = 8 // bits
                m = m.reshape(m.shape[:-1] + (m.shape[-1] // ppb, ppb))
                weights = (2 ** (bits * jnp.arange(ppb, dtype=jnp.int32)))
                return (m.astype(jnp.int32) * weights).sum(-1).astype(
                    jnp.uint8)

            fn = self._jax.jit(post)
            self._post_cache[n_active] = fn
        return fn

    def _split_fn(self, n_pieces: int):
        """Jitted device-side split of one staged video into chunk pieces
        (cached per piece count)."""
        fn = self._split_cache.get(n_pieces)
        if fn is None:
            chunk = self.chunk

            def split(v):
                return tuple(v[i * chunk:(i + 1) * chunk]
                             for i in range(n_pieces))

            fn = self._jax.jit(split)
            self._split_cache[n_pieces] = fn
        return fn

    def _unpack(self, packed: np.ndarray) -> np.ndarray:
        """Host-side exact inverse of the device bit-pack."""
        bits = self._pack_bits
        if bits >= 8:
            return packed
        ppb = 8 // bits
        lanes = [(packed >> (bits * i)) & ((1 << bits) - 1)
                 for i in range(ppb)]
        out = np.stack(lanes, axis=-1)               # (..., W/ppb, ppb)
        return out.reshape(packed.shape[:-1] + (packed.shape[-1] * ppb,))

    def _frames_arg(self, batch_pieces: Dict[int, "_Piece"]):
        """Build the step's frames argument for one tick.

        Single-device: a tuple of per-slot DEVICE arrays (pieces were
        staged at request time; idle slots reuse one zero buffer) —
        stacked inside the jit.  Mesh: pieces are host numpy (staging to
        the owning chip happens here), assembled into one (S,…) array and
        device_put with the batch sharding so each byte ships only to the
        chip that owns its slot."""
        if self._mesh is None:
            frames = [self._zero_dev] * self.streams
            for slot, piece in batch_pieces.items():
                frames[slot] = piece.frames_dev
            return tuple(frames)
        fnp = np.zeros((self.streams, self.chunk, self.image_size,
                        self.image_size, 1), np.uint8)
        for slot, piece in batch_pieces.items():
            fnp[slot] = piece.frames_dev
        return self._jax.device_put(fnp, self._shard)

    def _warmup(self):
        """Compile the tick step (and the saturated-path postprocess) at
        construction, so the first user request does not pay the jit
        compile (~20 s cold through a remote-compile tunnel)."""
        jax, jnp = self._jax, self._jnp
        fb = self._frames_arg({})
        zeros = jnp.zeros((2, self.streams), jnp.float32)
        masks, self._mem, self._seen = self._step(
            fb, self._mem, self._seen, zeros)
        # Pre-compile EVERY post bucket: the active-session count changes
        # as clients come and go, and a first-hit compile mid-traffic
        # costs seconds through a remote-compile tunnel.
        for nb in sorted({self._post_bucket(n)
                          for n in range(1, self.streams + 1)}):
            out = self._post_fn(nb)(
                masks, jnp.zeros((nb,), dtype=jnp.int32))
            jax.device_get(out)                      # force execution

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
            self._last_active[slot] = time.monotonic()
            return {"session": sid, "slot": slot}

    def close_session(self, sid: str) -> bool:
        with self._lock:
            slot = self._sessions.pop(sid, None)
            if slot is None:
                return False
            pending = self._queues.pop(slot, None)
            self._last_active.pop(slot, None)
            self._free.append(slot)
        # Fail any queued pieces so a concurrent infer() unblocks instead
        # of waiting forever on work that will never be scheduled.
        for piece in (pending or ()):
            self._finish(piece, error=KeyError(
                f"session {sid!r} closed with work pending"))
        return True

    def slot_of(self, sid: str) -> Optional[int]:
        with self._lock:
            return self._sessions.get(sid)

    def pause(self) -> None:
        """Hold the batcher: queued work stays queued until resume().
        (Drain/maintenance hook; also makes close-with-pending-work
        deterministic to test.)"""
        with self._work:
            self._paused = True

    def resume(self) -> None:
        with self._work:
            self._paused = False
            self._work.notify_all()

    # -- inference ----------------------------------------------------------

    def _device_resize(self, video_u8: np.ndarray) -> np.ndarray:
        """Resize a native-resolution video to the engine size on device
        (jitted per source shape, LRU-capped); masks are then at the
        engine size."""
        jax = self._jax
        key = ("resize", video_u8.shape[1:3])
        with self._lock:
            fn = self._resize_cache.get(key)
            if fn is not None:
                self._resize_cache.move_to_end(key)
        if fn is None:
            from gdkvm_tpu.ops.preproc import resize_u8
            size = self.image_size

            def _resize(v):
                return resize_u8(v, (size, size))

            fn = jax.jit(_resize)
            with self._lock:
                self._resize_cache[key] = fn
                while len(self._resize_cache) > _RESIZE_CACHE_MAX:
                    self._resize_cache.popitem(last=False)
        return np.asarray(jax.device_get(fn(jax.device_put(
            np.ascontiguousarray(video_u8)))))

    def _finish(self, piece: _Piece, masks=None, error=None):
        now = time.monotonic()
        with self._lock:
            self._inflight_bytes -= piece.nbytes
            if piece.t_enq is not None and piece.t_disp is not None \
                    and error is None:
                self._stats.append(
                    ((piece.t_disp - piece.t_enq) * 1e3,   # queue wait ms
                     (now - piece.t_disp) * 1e3,           # service ms
                     piece.depth))
        piece.masks = masks
        piece.error = error
        piece.done.set()

    def drain_stats(self):
        """Return and clear the per-piece (wait_ms, service_ms,
        depth_at_enqueue) samples collected since the last drain."""
        with self._lock:
            out = list(self._stats)
            self._stats.clear()
        return out

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
        with self._lock:
            if self._inflight_bytes + video_u8.nbytes > self._max_inflight:
                raise EngineOverloaded(
                    f"in-flight request bytes would exceed the "
                    f"{self._max_inflight // 10**6} MB budget — retry later")
        if (hh, ww) != (self.image_size, self.image_size):
            # Arbitrary-resolution input: resize ON DEVICE (fused matmul
            # preproc, ops/preproc.py), one jitted call per source shape.
            video_u8 = self._device_resize(video_u8)
        # Stage the WHOLE request on device in ONE device_put, then split
        # into chunk pieces with a jitted slice (cached per piece count):
        # per-call transfer overhead through a remote-dispatch tunnel runs
        # ~tens of ms, so n uploads for an n-chunk video serialized the
        # deep-request path (measured 27.8 ms/frame → one-upload fixes it).
        n_pieces = max(1, -(-t_total // self.chunk))
        pad = n_pieces * self.chunk - t_total
        if pad:
            video_u8 = np.concatenate(
                [video_u8, np.repeat(video_u8[-1:], pad, axis=0)])
        if self._mesh is not None:
            # Mesh mode stages at TICK time (the slot's owning chip is a
            # sharding decision, not a default-device put); pieces stay
            # host numpy here.
            devs = tuple(video_u8[i * self.chunk:(i + 1) * self.chunk]
                         for i in range(n_pieces))
        else:
            vdev = jax.device_put(np.ascontiguousarray(video_u8))
            devs = (vdev,) if n_pieces == 1 \
                else self._split_fn(n_pieces)(vdev)
        piece_bytes = video_u8.nbytes // n_pieces
        pieces = [_Piece(d, piece_bytes) for d in devs]
        with self._work:
            # Re-validate SESSION identity, not just slot liveness: staging
            # above (device resize + split jit) can take seconds, during
            # which idle-session GC may reclaim this session and
            # open_session() may recycle the slot to a NEW client — a
            # slot-only check would then interleave two clients' frames
            # into one GDR state.
            if self._sessions.get(sid) != slot:
                raise KeyError(f"session {sid!r} closed")
            q = self._queues.get(slot)
            if q is None:
                raise KeyError(f"session {sid!r} closed")
            q.extend(pieces)
            now = time.monotonic()
            for i, p in enumerate(pieces):
                p.t_enq = now
                p.depth = len(q) - len(pieces) + i  # pieces ahead of it
            self._last_active[slot] = now
            self._inflight_bytes += sum(p.nbytes for p in pieces)
            self._work.notify()
        outs = []
        for p in pieces:
            p.done.wait()
            if p.error is not None:
                raise p.error
            outs.append(p.masks)
        return np.concatenate(outs)[:t_total]

    # -- batcher loop -------------------------------------------------------

    def _deliver(self, pending):
        """Fetch one dispatched tick's (gathered, packed) masks and wake
        the waiting request threads."""
        out_dev, idx, batch_pieces = pending
        try:
            packed = np.asarray(self._jax.device_get(out_dev))
            masks = self._unpack(packed)
            for j, slot in enumerate(idx):
                self._finish(batch_pieces[slot], masks=masks[j])
        except Exception as exc:          # deliver, don't kill the loop
            for piece in batch_pieces.values():
                self._finish(piece, error=exc)

    def _stale_sids(self):
        """Sessions idle past session_ttl with no queued work (caller
        holds self._lock)."""
        ttl = self.session_ttl
        if not ttl:
            return []
        now = time.monotonic()
        return [sid for sid, slot in self._sessions.items()
                if not self._queues.get(slot)
                and now - self._last_active.get(slot, now) > ttl]

    def _close_if_stale(self, sid: str) -> bool:
        """Atomically re-check staleness and close (GC path only).

        close_session() decides nothing; calling it from a stale list
        computed in an EARLIER lock scope would fail a request that landed
        in between with 'closed with work pending' even though the session
        just became active again at the TTL boundary — so the re-check and
        the pop happen under one lock acquisition here."""
        ttl = self.session_ttl
        with self._lock:
            slot = self._sessions.get(sid)
            if slot is None:
                return False
            now = time.monotonic()
            if (self._queues.get(slot) or not ttl
                    or now - self._last_active.get(slot, now) <= ttl):
                return False            # became active again — keep it
            self._sessions.pop(sid)
            self._queues.pop(slot, None)
            self._last_active.pop(slot, None)
            self._free.append(slot)
        return True

    def _reclaim_idle(self) -> None:
        """Idle-session GC (batcher thread): reclaim slots whose client
        went away — open_session capacity must not shrink permanently
        because a scanner crashed mid-stream."""
        with self._lock:
            stale = self._stale_sids()
        for sid in stale:
            if self._close_if_stale(sid):
                self.sessions_reclaimed += 1

    def _run(self):
        import jax
        import jax.numpy as jnp

        pending = None        # (out_dev, idx, batch_pieces) from tick t
        while True:
            self._reclaim_idle()
            with self._work:
                while not self._closed and pending is None and \
                        (self._paused or not any(
                            self._queues.get(s) for s in self._queues)):
                    if self._stale_sids():
                        break            # release lock; reclaim up top
                    self._work.wait(timeout=0.5)
                closed = self._closed
                batch_pieces: Dict[int, _Piece] = {}
                resets: set = set()
                if not closed and not self._paused:
                    now = time.monotonic()
                    for slot, q in self._queues.items():
                        if q:
                            piece = q.popleft()
                            piece.t_disp = now
                            batch_pieces[slot] = piece
                            self._last_active[slot] = now
                    resets = self._reset_slots
                    self._reset_slots = set()
            if closed:
                if pending is not None:
                    self._deliver(pending)
                return
            nxt = None
            if batch_pieces or resets:
                try:
                    flags = np.zeros((2, self.streams), np.float32)
                    for slot in resets:
                        flags[1, slot] = 1.0
                    for slot in batch_pieces:
                        flags[0, slot] = 1.0
                    masks, self._mem, self._seen = self._step(
                        self._frames_arg(batch_pieces), self._mem,
                        self._seen, jnp.asarray(flags))
                    if batch_pieces:
                        idx = sorted(batch_pieces)
                        nb = self._post_bucket(len(idx))
                        idx_pad = idx + [idx[-1]] * (nb - len(idx))
                        out = self._post_fn(nb)(
                            masks, jnp.asarray(idx_pad, dtype=jnp.int32))
                        try:                  # start the D2H copy early
                            out.copy_to_host_async()
                        except AttributeError:
                            pass
                        nxt = (out, idx, batch_pieces)
                    self.ticks += 1
                except Exception as exc:   # deliver, don't kill the loop
                    with self._lock:       # resets were not applied
                        self._reset_slots |= resets
                    for piece in batch_pieces.values():
                        self._finish(piece, error=exc)
            # Overlap: tick t+1 is already dispatched; now fetch tick t.
            if pending is not None:
                self._deliver(pending)
            pending = nxt

    def close(self):
        with self._work:
            self._closed = True
            self._work.notify_all()
        self._thread.join(timeout=5)
        # Fail anything still queued so no request thread waits forever.
        with self._lock:
            leftover = [p for q in self._queues.values() for p in q]
            self._queues.clear()
        for piece in leftover:
            self._finish(piece, error=RuntimeError("engine closed"))


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
        # TCP_NODELAY: the handler writes status/headers/body as separate
        # small sends; with Nagle on, the tail send waits for the client's
        # delayed ACK — a measured ~40 ms floor PER REQUEST on loopback
        # (BASELINE.md r4 host-stack profile: bare /healthz 43.4 → 0.4 ms
        # with this + the client-side setting).
        disable_nagle_algorithm = True

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
                    "session_ttl": engine.session_ttl,
                    "sessions_reclaimed": engine.sessions_reclaimed,
                    "mesh": (dict(engine._mesh.shape)
                             if engine._mesh is not None else None),
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
                except EngineOverloaded as exc:
                    self._json(429, {"error": str(exc)})
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
    """Minimal stdlib client: one session = one streaming video.

    Session-management calls (health/open/close) retry once on transient
    connection errors.  infer() is NOT retried — the server threads each
    chunk through a causal memory state, so a blind resend could replay
    frames into the recurrence; a stalled server surfaces as a clean
    TimeoutError instead (docs/SERVING.md)."""

    def __init__(self, host: str, port: int, timeout: float = 120.0,
                 retries: int = 1):
        self.host, self.port, self.timeout = host, port, timeout
        self.retries = retries
        self.session: Optional[str] = None
        self._c = None          # persistent keep-alive connection

    def _conn(self):
        import http.client
        import socket as _socket
        if self._c is None:
            c = http.client.HTTPConnection(self.host, self.port,
                                           timeout=self.timeout)
            # TCP_NODELAY on the client side too: http.client leaves
            # Nagle on, and request-line + headers + body go out as
            # separate sends — each handoff can stall on the peer's
            # delayed ACK (see Handler.disable_nagle_algorithm).
            # self._c is assigned only AFTER connect + setsockopt succeed:
            # a half-connected object left behind would auto-connect on the
            # next request WITHOUT TCP_NODELAY (and without cleanup).
            try:
                c.connect()
                c.sock.setsockopt(_socket.IPPROTO_TCP,
                                  _socket.TCP_NODELAY, 1)
            except Exception:
                c.close()
                raise
            self._c = c
        return self._c

    def _drop_conn(self):
        if self._c is not None:
            try:
                self._c.close()
            except Exception:
                pass
            self._c = None

    def _request(self, method: str, path: str, body: bytes = b"",
                 retry: bool = True):
        """One HTTP round trip over a persistent connection (a fresh TCP
        connect + server thread per chunk measurably costs host CPU on a
        busy serving box).  The connection is dropped and rebuilt on any
        transport error."""
        attempts = (self.retries + 1) if retry else 1
        last: Optional[Exception] = None
        for _ in range(attempts):
            try:
                # Connect INSIDE the retried block: a transient
                # ConnectionError during the TCP handshake deserves the
                # same retry policy as one during the request itself.
                c = self._conn()
                c.request(method, path, body=body)
                r = c.getresponse()
                data = r.read()
                return r.status, r.getheader("Content-Type", ""), data
            except TimeoutError as exc:
                self._drop_conn()
                last = TimeoutError(
                    f"server {self.host}:{self.port} did not answer "
                    f"{method} {path} within {self.timeout}s")
                last.__cause__ = exc
                if not retry:
                    break
            except (ConnectionError, OSError) as exc:
                self._drop_conn()
                last = exc
        raise last

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
            _np_bytes(np.ascontiguousarray(video_u8)), retry=False)
        if status != 200:
            raise RuntimeError(json.loads(data).get("error", data))
        return _np_from_bytes(data)

    def close(self) -> None:
        if self.session:
            self._request("DELETE", f"/v1/sessions/{self.session}")
            self.session = None
        self._drop_conn()
