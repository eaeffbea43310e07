"""GDKVM — the flagship model: encoder → LKVA/GDR memory → KPFF → decoder.

Pipeline (reference abstract, README.md:16-22; Fig-1 caption,
website/src/content/homepage/en.json:20):

    frames ──► CNN encoder (per frame, batched over B·T) ──► f4, f8, f16
    f16 ──► LKVA projections ──► GDR memory scan over frames (the only
            sequential computation) ──► global readout map per frame
    (f4, f8, f16, readout) ──► KPFF fusion at 3 scales ──► mask logits

API shape matches the reference framework's ("per-frame mask logits,
memory-state carry", /root/repo/BASELINE.json):

- ``apply(params, frames)`` — batched clip forward, returns
  (logits (B,T,H,W,K), final StreamState).
- streaming — call ``apply`` on successive chunks passing ``state=``;
  exact equivalence with the batched forward is tested
  (tests/test_model.py::test_streaming_equals_batched).
- ``prompt`` — optional first-frame mask conditioning, written into the
  initial memory state (memory-VOS lineage, reference README.md:18).

TPU-first: encoder/decoder fold B·T into one batch so convs hit the MXU at
full tile occupancy; everything is static-shaped; the GDR scan carries a
fixed-size fp32 state (O(1) memory in T — the reference's entire long-video
thesis, SURVEY.md §5 long-context).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from gdkvm_tpu.config.schema import ModelConfig
from gdkvm_tpu.models.decoder import Decoder, resize_bilinear
from gdkvm_tpu.models.encoder import Encoder
from gdkvm_tpu.models.lkva import LKVAMemory


@flax.struct.dataclass
class StreamState:
    """Carried memory state for streaming inference.

    mem: (B, num_heads, d_k, d_v) fp32 associative state.
    frames_seen: (B,) int32 — bookkeeping for logging/debug only.
    """
    mem: jax.Array
    frames_seen: jax.Array


def _dtype(name: str) -> jnp.dtype:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class GDKVM(nn.Module):
    """Echocardiography video segmentation with gated delta-rule KV memory."""
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        if c.mem_stride != 16:
            raise ValueError(
                f"model.mem_stride={c.mem_stride} is not supported: the "
                f"LKVA memory reads the encoder's deepest scale, which is "
                f"stride 16 (encoder stages are fixed at strides 4/8/16)")
        dt = _dtype(c.compute_dtype)
        self.encoder = Encoder(channels=tuple(c.enc_channels),
                               blocks=tuple(c.enc_blocks), dtype=dt,
                               stem=getattr(c, "enc_stem", "s2d"))
        self.lkva = LKVAMemory(num_heads=c.num_heads,
                               head_dim_k=c.head_dim_k,
                               head_dim_v=c.head_dim_v,
                               out_channels=c.enc_channels[-1],
                               dtype=dt, gdr_impl=c.gdr_impl,
                               gdr_variant=getattr(c, "gdr_variant", "gdn"))
        self.decoder = Decoder(channels=tuple(c.kpff_channels),
                               num_classes=c.num_classes, dtype=dt)

    def init_state(self, batch: int) -> StreamState:
        return StreamState(mem=self.lkva.init_state(batch),
                           frames_seen=jnp.zeros((batch,), jnp.int32))

    def _encode(self, frames: jax.Array):
        """frames: (B, T, H, W, C) → per-scale maps with B·T folded."""
        b, t, hh, ww, ci = frames.shape
        flat = frames.reshape(b * t, hh, ww, ci)
        f4, f8, f16 = self.encoder(flat)
        return f4, f8, f16

    def __call__(self, frames: jax.Array,
                 state: Optional[StreamState] = None,
                 prompt_mask: Optional[jax.Array] = None,
                 prompt_weight: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, StreamState]:
        """Forward over a clip (or a streaming chunk).

        Args:
          frames: (B, T, H, W, C_in) — C_in = 1 grayscale echo.
          state: carried StreamState; None ⇒ fresh zero state.
          prompt_mask: optional (B, H, W) int mask for frame 0 of this chunk;
            written into the memory state *before* any frame is processed
            (first-frame conditioning).
          prompt_weight: optional per-batch scalar(s) in [0,1] blending the
            prompted state with the unprompted one — lets a jitted train
            step toggle prompting stochastically without retracing.
        Returns:
          (logits (B, T, H, W, num_classes) fp32, new StreamState).
        """
        b, t, hh, ww, _ = frames.shape
        if state is None:
            state = self.init_state(b)

        f4, f8, f16 = self._encode(frames)
        h16, w16 = f16.shape[1], f16.shape[2]
        f16_seq = f16.reshape(b, t, h16, w16, f16.shape[-1])

        mem = state.mem
        if prompt_mask is not None:
            onehot = jax.nn.one_hot(prompt_mask, self.cfg.num_classes,
                                    dtype=jnp.float32)
            m16 = resize_bilinear(onehot, (h16, w16))
            prompted = self.lkva.prompt_write(f16_seq[:, 0], m16, mem)
            if prompt_weight is None:
                mem = prompted
            else:
                w = jnp.reshape(prompt_weight.astype(jnp.float32),
                                (b, 1, 1, 1))
                mem = w * prompted + (1.0 - w) * mem

        readout_seq, mem = self.lkva(f16_seq, mem)   # (B,T,h16,w16,C)

        # Decode all frames batched (B·T folded).
        ro = readout_seq.reshape(b * t, h16, w16, readout_seq.shape[-1])
        logits = self.decoder(f4, f8, f16, ro, (hh, ww))
        logits = logits.reshape(b, t, hh, ww, self.cfg.num_classes)

        new_state = StreamState(
            mem=mem, frames_seen=state.frames_seen + t)
        return logits, new_state


def create_model(cfg: ModelConfig) -> GDKVM:
    return GDKVM(cfg=cfg)


def train_model_config(cfg: ModelConfig,
                       image_size: int | None = None) -> ModelConfig:
    """Resolve gdr_impl='auto' for a TRAINING trace, by token count.

    Under grad the contenders are (a) pure-XLA chunked (XLA's AD stores
    the forward's WY solves) and (b) the Pallas kernel forward with the
    stored-solve hand adjoint (GDKVM_GDR_BWD=stored — the kernel streams
    its solves and state checkpoints; ops/gdr_pallas.py::_bwd_stored).
    Measured on v5e (floor-corrected, BASELINE.md r2.5): at the CAMUS
    256² shape (N=256 memory tokens) the stored kernel path is **1.78×
    faster AND 170× closer to the scan-reference gradient** (XLA's AD
    through the blocked substitution loses ~3 digits at large N with
    correlated keys); at EchoNet scale (N=49) the two tie (0.95-1.02×),
    so the simpler XLA form keeps that regime.  The cut: keep 'auto'
    (→ Pallas on accelerators, chunked on CPU) when the stride-16 token
    count reaches 128, else resolve 'chunked'.  Inference traces always
    keep 'auto' → pallas, which wins everywhere there.
    """
    import dataclasses
    if cfg.gdr_impl == "auto":
        n_tokens = None if image_size is None else (image_size // 16) ** 2
        if n_tokens is not None and n_tokens >= 128:
            return cfg                     # 'auto': pallas on TPU, stored bwd
        return dataclasses.replace(cfg, gdr_impl="chunked")
    return cfg


def init_params(model: GDKVM, rng: jax.Array, image_size: int,
                clip_len: int = 2, batch: int = 1):
    """Initialize parameters with a dummy clip."""
    dummy = jnp.zeros((batch, clip_len, image_size, image_size,
                       model.cfg.in_channels), jnp.float32)
    dummy_mask = jnp.zeros((batch, image_size, image_size), jnp.int32)
    return model.init(rng, dummy, None, dummy_mask)
