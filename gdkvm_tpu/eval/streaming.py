"""Streaming inference: frame-in → mask-out with explicit state carry.

The reference API shape is "per-frame mask logits, memory-state carry"
(/root/repo/BASELINE.json).  Frames are processed in fixed-size chunks per
device call (static shapes for XLA; state carried across calls), giving
full-sequence streaming at O(1) memory in T — the chunked GDR recurrence is
the long-context mechanism itself (SURVEY.md §5 long-context).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gdkvm_tpu.eval.metrics import mask_from_logits
from gdkvm_tpu.models.gdkvm import GDKVM, StreamState


_APPLY_CACHE: dict = {}


def _jitted_apply(model: GDKVM, donate_state: bool):
    """Shared jitted apply per model architecture.

    Keyed on the config repr (ModelConfig is a mutable dataclass, not
    hashable) so every segmenter / stream_video call over the same
    architecture reuses ONE compiled executable — a fresh jax.jit per
    video recompiles each time (measured: 2 frames/sec instead of
    thousands).
    """
    key = (repr(model.cfg), donate_state)
    fn = _APPLY_CACHE.get(key)
    if fn is None:
        fn = jax.jit(model.apply,
                     donate_argnums=(2,) if donate_state else ())
        _APPLY_CACHE[key] = fn
    return fn


def _jitted_mask_step(model: GDKVM):
    """Jitted chunk step: uint8 frames + state → uint8 argmax masks + state.

    Everything (normalize, forward, argmax) lives inside ONE jit: eager ops
    between chunks are catastrophically slow on remote-dispatch platforms
    (measured ~70 s per eager argmax through the dev tunnel) and forbidden
    in the hot path.
    """
    key = (repr(model.cfg), "mask_step")
    fn = _APPLY_CACHE.get(key)
    if fn is None:
        def step(params, frames_u8, state):
            # frames_u8: (chunk,H,W,1) → masks (chunk,H,W) u8.  Batch dim
            # added/removed INSIDE the jit: even an eager [0] indexing of a
            # device array costs a full remote compile per call out here.
            x = frames_u8[None].astype(jnp.float32) / 255.0
            logits, state = model.apply(params, x, state)
            return mask_from_logits(logits[0]), state
        fn = jax.jit(step, donate_argnums=(2,))
        _APPLY_CACHE[key] = fn
    return fn


def _jitted_mask_step_native(model: GDKVM, out_size: int):
    """Jitted chunk step for NATIVE-resolution input: device-side fused
    resize+normalize (ops/preproc.py matmul resize — MXU) → forward →
    argmax, all in one jit.  The host ships raw decode bytes only; masks
    come back at the model resolution (SURVEY §2.3 fused preproc)."""
    key = (repr(model.cfg), "mask_step_native", out_size)
    fn = _APPLY_CACHE.get(key)
    if fn is None:
        from gdkvm_tpu.ops.preproc import resize_normalize

        def step(params, frames_u8, state):
            x = resize_normalize(frames_u8[None], (out_size, out_size))
            logits, state = model.apply(params, x, state)
            return mask_from_logits(logits[0]), state
        fn = jax.jit(step, donate_argnums=(2,))
        _APPLY_CACHE[key] = fn
    return fn


def _jitted_prompt_step(model: GDKVM):
    """Jitted first-chunk step with a frame-0 mask prompt."""
    key = (repr(model.cfg), "prompt_step")
    fn = _APPLY_CACHE.get(key)
    if fn is None:
        def step(params, frames_u8, prompt_mask):
            x = frames_u8[None].astype(jnp.float32) / 255.0
            logits, state = model.apply(params, x, None, prompt_mask[None])
            return mask_from_logits(logits[0]), state
        fn = jax.jit(step)
        _APPLY_CACHE[key] = fn
    return fn


def _jitted_mask_step_ms(model: GDKVM):
    """Jitted multi-stream chunk step: (B,chunk,H,W,1) u8 frames + state(B)
    → (B,chunk,H,W) u8 masks + state.  B independent videos in flight on
    one chip — the serving-path configuration (the recurrence is
    per-stream; streams never interact)."""
    key = (repr(model.cfg), "mask_step_ms")
    fn = _APPLY_CACHE.get(key)
    if fn is None:
        def step(params, frames_u8, state):
            x = frames_u8.astype(jnp.float32) / 255.0
            logits, state = model.apply(params, x, state)
            return mask_from_logits(logits), state
        fn = jax.jit(step, donate_argnums=(2,))
        _APPLY_CACHE[key] = fn
    return fn


def _jitted_dice_part_ms(num_classes: int):
    """Jitted multi-stream per-chunk Dice partial sums.

    pred/labels (B,chunk,H,W), valid (B,chunk) → class-dim partial sums.
    """
    key = ("dice_part_ms", num_classes)
    fn = _APPLY_CACHE.get(key)
    if fn is None:
        def part(pred, labels, valid):
            p1 = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
            l1 = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
            v = valid[:, :, None, None, None]
            return {
                "inter": jnp.sum(p1 * l1 * v, axis=(0, 1, 2, 3)),
                "psum": jnp.sum(p1 * v, axis=(0, 1, 2, 3)),
                "lsum": jnp.sum(l1 * v, axis=(0, 1, 2, 3)),
                "frames": jnp.sum(valid),
            }
        fn = jax.jit(part)
        _APPLY_CACHE[key] = fn
    return fn


def _jitted_dice_part(num_classes: int):
    """Jitted per-chunk hard-Dice partial sums (fixed chunk shapes)."""
    key = ("dice_part", num_classes)
    fn = _APPLY_CACHE.get(key)
    if fn is None:
        def part(pred, labels, valid):
            p1 = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
            l1 = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
            v = valid[:, None, None, None]
            return {
                "inter": jnp.sum(p1 * l1 * v, axis=(0, 1, 2)),
                "psum": jnp.sum(p1 * v, axis=(0, 1, 2)),
                "lsum": jnp.sum(l1 * v, axis=(0, 1, 2)),
                "frames": jnp.sum(valid),
            }
        fn = jax.jit(part)
        _APPLY_CACHE[key] = fn
    return fn


class StreamingSegmenter:
    """Stateful wrapper: feed chunks of frames, get per-frame masks."""

    def __init__(self, model: GDKVM, params, chunk: int = 16,
                 donate_state: bool = True):
        self.model = model
        self.params = params
        self.chunk = chunk
        # Donating the carried state lets XLA reuse its buffer in place
        # (aliasing audit: SURVEY.md §5 race detection / sanitizers).
        self._apply = _jitted_apply(model, donate_state)
        self.state: Optional[StreamState] = None

    def reset(self) -> None:
        """Drop the carried memory (next feed starts a fresh recurrence)."""
        self.state = None

    def feed(self, frames_u8: jax.Array) -> jax.Array:
        """frames_u8: (T≤chunk, H, W, 1) uint8 → logits (T, H, W, K) fp32."""
        t = frames_u8.shape[0]
        pad = self.chunk - t
        x = jnp.asarray(frames_u8)
        if pad > 0:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
        x = x[None].astype(jnp.float32) / 255.0
        if self.state is None:
            logits, self.state = self._apply(self.params, x)
        else:
            logits, self.state = self._apply(self.params, x, self.state)
        return logits[0, :t]


def stream_evaluate(cfg, model: GDKVM, params,
                    num_videos: int = 8, video_len: int = 128,
                    reset_state: bool = False,
                    occlude: bool = False,
                    streams: int = 1,
                    consistency: bool = False,
                    probe_window_only: bool = False):
    """Full-sequence streaming eval: per-video chunked recurrence, Dice on
    valid frames, end-to-end frames/sec (BASELINE configs[1]/[3]).

    Videos come from the configured dataset when it exposes full videos
    (EchoNet `decode_video`), else from the synthetic generator.

    Ablation knobs (reproduce the memory-contribution study in
    BASELINE.md): ``reset_state`` zeroes the memory between chunks (set
    eval_stage.stream_chunk=1 for a true per-frame no-memory baseline);
    ``occlude`` blanks an LV-covering region around the last traced (or
    middle) frame — the acoustic-dropout robustness probe.
    ``probe_window_only`` restricts Dice scoring (validity) to the 4
    frames the probe covers, so the robustness delta is measured ON the
    occluded frames rather than diluted over the whole video; applied
    symmetrically to clean runs (same frames, unoccluded) so
    carry-vs-reset deltas compare like with like.

    ``streams`` > 1 runs that many videos in flight as one batched
    recurrence (serving mode): videos are grouped, padded to the group
    max length with valid=0 frames (exact Dice — padding contributes
    nothing), and the state batch carries each stream independently.
    """
    import time as _time
    from gdkvm_tpu.data import synthetic as _synth
    from gdkvm_tpu.eval import metrics as M

    k = cfg.model.num_classes
    chunk = cfg.eval_stage.stream_chunk
    videos = []
    if cfg.data.dataset == "echonet":
        from gdkvm_tpu.data.echonet import EchoNetDataset
        ds = EchoNetDataset(cfg.data.data_path, cfg.data.val_split,
                            image_size=cfg.data.image_size,
                            clip_len=cfg.data.clip_len, num_classes=k)
        for i in range(min(num_videos, len(ds))):
            name = ds.videos[i]
            vid = ds.decode_video(name)
            masks = np.zeros(vid.shape[:3], np.uint8)
            valid = np.zeros((vid.shape[0],), np.float32)
            for t in range(vid.shape[0]):
                m = ds.mask_for(name, t, vid.shape[1:3])
                if m is not None:
                    masks[t] = m
                    valid[t] = 1.0
            videos.append((vid, masks, valid))
    else:
        for i in range(num_videos):
            f, m = _synth.generate_video(1000 + i, video_len,
                                         cfg.data.image_size,
                                         cfg.data.image_size, k,
                                         cfg.data.synth_difficulty)
            videos.append((f, m, np.ones((video_len,), np.float32)))

    if occlude or probe_window_only:
        probed = []
        for vid, gt, valid in videos:
            anchors = np.where(valid > 0)[0]
            es = int(anchors[-1]) if anchors.size else vid.shape[0] // 2
            lo = max(es - 3, 0)
            if occlude:
                vid = vid.copy()
                hh, ww = vid.shape[1:3]
                for t in range(lo, es + 1):
                    vid[t, int(0.27 * hh):int(0.76 * hh),
                        int(0.22 * ww):int(0.80 * ww)] = 0
            if probe_window_only:
                window = np.zeros_like(valid)
                window[lo:es + 1] = 1.0
                valid = valid * window
            probed.append((vid, gt, valid))
        videos = probed

    if streams > 1:
        if consistency:
            import warnings
            warnings.warn("--consistency is computed in single-stream "
                          "mode only; ignoring it for streams > 1")
        return _stream_evaluate_ms(model, params, videos, k, chunk,
                                   streams, reset_state)

    step = _jitted_mask_step(model)
    dice_part = _jitted_dice_part(k)

    def run_video(vid, gt, valid):
        """One video: jitted chunk steps + jitted per-chunk dice parts —
        fully async; zero eager ops (each costs ~70 s on remote-dispatch
        platforms).  All chunk data is staged to device with explicit
        ``device_put`` up front: letting jit upload numpy arguments is
        ~60× slower than device_put on the remote-dispatch transfer path
        (measured 15 vs 940 MB/s), and the async puts overlap compute."""
        chunks = [jax.device_put(np.ascontiguousarray(c))
                  for c in _chunk_video(vid, chunk)]
        gt_chunks = [jax.device_put(np.ascontiguousarray(g[..., 0]))
                     for g in _chunk_video(gt[..., None], chunk)]
        v_pad = np.zeros((len(chunks) * chunk,), np.float32)
        v_pad[: valid.shape[0]] = valid
        state = None
        parts = []
        mask_chunks = []
        for i, c in enumerate(chunks):
            masks, state = step(params, c, state)
            if reset_state:
                state = None      # ablation: no memory across chunks
            parts.append(dice_part(
                masks, gt_chunks[i],
                v_pad[i * chunk:(i + 1) * chunk]))   # 64 B — jit-arg OK
            if consistency:
                mask_chunks.append(masks)   # fetched post-loop, stays async
        return parts, mask_chunks

    # Warm the jit cache (compile excluded from throughput, like bench.py).
    if videos:
        jax.device_get(run_video(*videos[0])[0])

    acc = None
    frames_done = 0
    parts = []
    per_video_masks = []
    t0 = _time.perf_counter()
    for vid, gt, valid in videos:
        p, mc = run_video(vid, gt, valid)
        parts.extend(p)
        per_video_masks.append((mc, vid.shape[0]))
        frames_done += vid.shape[0]
    # device_get forces real execution (block_until_ready can return at
    # dispatch-ack on remote platforms — see eval/throughput.py).
    parts = jax.device_get(parts)
    elapsed = _time.perf_counter() - t0
    for part in parts:
        acc = part if acc is None else M.dice_merge(acc, part)
    out = M.dice_finalize(acc) if acc else {}
    out["stream_frames_per_sec"] = frames_done / max(elapsed, 1e-9)
    out["videos"] = float(len(videos))
    if consistency:
        # Temporal stability of the predictions (reference's
        # cycle-consistency robustness claim — eval/metrics.py); fetched
        # after timing so the throughput number stays transfer-free.
        cons = []
        for mask_chunks, n_frames in per_video_masks:
            if not mask_chunks:
                continue
            seq = np.concatenate(
                [np.asarray(m) for m in jax.device_get(mask_chunks)]
            )[:n_frames]
            cons.append(M.temporal_consistency(seq))
        if cons:
            out["temporal_fg_iou"] = float(
                np.mean([c["temporal_fg_iou"] for c in cons]))
            out["flicker_rate"] = float(
                np.mean([c["flicker_rate"] for c in cons]))
    return out


def _stream_evaluate_ms(model: GDKVM, params, videos, num_classes: int,
                        chunk: int, streams: int, reset_state: bool):
    """Multi-stream streaming eval body: groups of ``streams`` videos run
    as one batched chunked recurrence.  Group members are padded to the
    group max length (rounded up to the chunk) with valid=0 frames, so the
    Dice partial sums are exact.  Short groups (the tail) pad the batch by
    repeating the last video with valid=0 — static shapes for XLA, no
    contribution to the metric."""
    import time as _time
    from gdkvm_tpu.eval import metrics as M

    step = _jitted_mask_step_ms(model)
    dice_part = _jitted_dice_part_ms(num_classes)

    def build_group(group):
        """Pad a group to (streams, T_pad, …) and pre-stage per-chunk
        device arrays.  Explicit async ``device_put`` is mandatory here:
        jit-argument numpy upload measures ~60× slower than device_put on
        the remote-dispatch transfer path (15 vs 940 MB/s), and the puts
        overlap device compute."""
        t_max = max(v[0].shape[0] for v in group)
        t_pad = -(-t_max // chunk) * chunk
        hh, ww = group[0][0].shape[1:3]
        frames = np.zeros((streams, t_pad, hh, ww, 1), np.uint8)
        gt = np.zeros((streams, t_pad, hh, ww), np.uint8)
        valid = np.zeros((streams, t_pad), np.float32)
        for j, (vid, g, v) in enumerate(group):
            t = vid.shape[0]
            frames[j, :t] = vid if vid.ndim == 4 else vid[..., None]
            gt[j, :t] = g
            valid[j, :t] = v
        put = lambda a: jax.device_put(np.ascontiguousarray(a))
        return ([(put(frames[:, lo:lo + chunk]),
                  put(gt[:, lo:lo + chunk]),
                  valid[:, lo:lo + chunk])            # 512 B — jit-arg OK
                 for lo in range(0, t_pad, chunk)])

    def run_group(chunks):
        parts = []
        state = None
        for f_c, g_c, v_c in chunks:
            masks, state = step(params, f_c, state)
            if reset_state:
                state = None
            parts.append(dice_part(masks, g_c, v_c))
        return parts

    groups = [build_group(videos[i:i + streams])
              for i in range(0, len(videos), streams)]

    # Warm the jit cache (compile excluded, as in the single-stream path).
    jax.device_get(run_group(groups[0]))

    frames_done = sum(v[0].shape[0] for v in videos)
    parts = []
    t0 = _time.perf_counter()
    for g in groups:
        parts.extend(run_group(g))
    parts = jax.device_get(parts)     # forces real execution
    elapsed = _time.perf_counter() - t0

    acc = None
    for part in parts:
        acc = part if acc is None else M.dice_merge(acc, part)
    out = M.dice_finalize(acc) if acc else {}
    out["stream_frames_per_sec"] = frames_done / max(elapsed, 1e-9)
    out["videos"] = float(len(videos))
    out["streams"] = float(streams)
    return out


def stream_video(model: GDKVM, params, video_u8: np.ndarray,
                 chunk: int = 16,
                 prompt_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Segment a full video (T,H,W,1) by chunked streaming; returns (T,H,W)
    uint8 argmax masks.  All math (normalize → forward → argmax) runs in
    one jitted chunk step; chunk dispatches pipeline asynchronously and the
    host syncs once at the end.  Padding note: T is padded up to a multiple
    of `chunk`; padded outputs are discarded, and because the recurrence is
    causal the valid prefix is unaffected."""
    t_total = video_u8.shape[0]
    # Stage chunks on device explicitly: jit-argument numpy upload is ~60×
    # slower than async device_put on the remote-dispatch transfer path.
    chunks = [jax.device_put(np.ascontiguousarray(c))
              for c in _chunk_video(video_u8, chunk)]
    step = _jitted_mask_step(model)
    state = None
    outs = []
    if prompt_mask is not None:
        # Prompt with frame 0 inside the first chunk call (write-then-read
        # through the full apply, argmax inside the jit).
        masks, state = _jitted_prompt_step(model)(
            params, chunks[0], np.asarray(prompt_mask, np.int32))
        outs.append(masks)
        rest = chunks[1:]
    else:
        rest = chunks
    for c in rest:
        masks, state = step(params, c, state)
        outs.append(masks)
    # np.asarray on a device array is a transfer (fast), not an eager op.
    host = [np.asarray(o) for o in outs]
    return np.concatenate(host, axis=0)[:t_total]


def _chunk_video(video_u8: np.ndarray, chunk: int) -> list:
    """Split (T,H,W,1) into fixed-size chunks, edge-padding the tail."""
    t_total = video_u8.shape[0]
    out = []
    for lo in range(0, t_total, chunk):
        piece = video_u8[lo:lo + chunk]
        if piece.shape[0] < chunk:
            pad = chunk - piece.shape[0]
            piece = np.concatenate(
                [piece, np.repeat(piece[-1:], pad, axis=0)], axis=0)
        out.append(piece)
    return out
