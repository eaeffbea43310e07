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
