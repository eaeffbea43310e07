"""Streaming inference: frame-in → mask-out with explicit state carry.

The reference API shape is "per-frame mask logits, memory-state carry"
(/root/repo/BASELINE.json).  Frames are processed in fixed-size chunks per
device call (static shapes for XLA; state carried across calls), giving
full-sequence streaming at O(1) memory in T — the chunked GDR recurrence is
the long-context mechanism itself (SURVEY.md §5 long-context).
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gdkvm_tpu.models.gdkvm import GDKVM, StreamState


class StreamingSegmenter:
    """Stateful wrapper: feed chunks of frames, get per-frame masks."""

    def __init__(self, model: GDKVM, params, chunk: int = 16,
                 donate_state: bool = True):
        self.model = model
        self.params = params
        self.chunk = chunk
        # Donating the carried state lets XLA reuse its buffer in place
        # (aliasing audit: SURVEY.md §5 race detection / sanitizers).
        self._apply = jax.jit(
            functools.partial(model.apply),
            donate_argnums=(2,) if donate_state else (),
        )
        self.state: Optional[StreamState] = None

    def reset(self, batch: int = 1) -> None:
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
                    num_videos: int = 8, video_len: int = 128):
    """Full-sequence streaming eval: per-video chunked recurrence, Dice on
    valid frames, end-to-end frames/sec (BASELINE configs[1]/[3]).

    Videos come from the configured dataset when it exposes full videos
    (EchoNet `decode_video`), else from the synthetic generator.
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
                                         cfg.data.image_size, k)
            videos.append((f, m, np.ones((video_len,), np.float32)))

    acc = None
    frames_done = 0
    t0 = _time.perf_counter()
    for vid, masks, valid in videos:
        pred = stream_video(model, params, vid, chunk=chunk)
        frames_done += vid.shape[0]
        # Hard-mask Dice directly (predictions are already argmaxed).
        p1 = jax.nn.one_hot(jnp.asarray(pred), k, dtype=jnp.float32)
        l1 = jax.nn.one_hot(jnp.asarray(masks.astype(np.int32)), k,
                            dtype=jnp.float32)
        v = jnp.asarray(valid)[:, None, None, None]
        part = {
            "inter": jnp.sum(p1 * l1 * v, axis=(0, 1, 2)),
            "psum": jnp.sum(p1 * v, axis=(0, 1, 2)),
            "lsum": jnp.sum(l1 * v, axis=(0, 1, 2)),
            "frames": jnp.sum(valid),
        }
        part = jax.device_get(part)
        acc = part if acc is None else M.dice_merge(acc, part)
    elapsed = _time.perf_counter() - t0
    out = M.dice_finalize(acc) if acc else {}
    out["stream_frames_per_sec"] = frames_done / max(elapsed, 1e-9)
    out["videos"] = float(len(videos))
    return out


def stream_video(model: GDKVM, params, video_u8: np.ndarray,
                 chunk: int = 16,
                 prompt_mask: Optional[np.ndarray] = None
                 ) -> np.ndarray:
    """Segment a full video (T,H,W,1) by chunked streaming; returns (T,H,W)
    argmax masks.  Padding note: T is padded up to a multiple of `chunk`
    with repeated last frames; padded outputs are discarded, and because the
    recurrence is causal the valid prefix is unaffected."""
    seg = StreamingSegmenter(model, params, chunk=chunk)
    t_total = video_u8.shape[0]
    outs = []
    if prompt_mask is not None:
        # Prompt with frame 0 inside the first chunk call.
        frames = jnp.asarray(video_u8[:chunk])
        pad = chunk - frames.shape[0]
        if pad > 0:
            frames = jnp.pad(frames, ((0, pad), (0, 0), (0, 0), (0, 0)),
                             mode="edge")
        x = frames[None].astype(jnp.float32) / 255.0
        logits, seg.state = jax.jit(model.apply)(
            params, x, None, jnp.asarray(prompt_mask)[None])
        outs.append(np.asarray(jnp.argmax(logits[0, :min(chunk, t_total)],
                                          axis=-1)))
        start = chunk
    else:
        start = 0
    for lo in range(start, t_total, chunk):
        hi = min(lo + chunk, t_total)
        logits = seg.feed(video_u8[lo:hi])
        outs.append(np.asarray(jnp.argmax(logits, axis=-1)))
    return np.concatenate(outs, axis=0)[:t_total]
