"""Model export for deployment: serialized StableHLO serving artifacts.

The reference framework ships no deployment story beyond "weights saved to
outputs/" (reference: website/src/pages/[lang]/reprod/index.astro:267-269);
real-time serving is a headline claim (README.md:22).  The TPU-native
deployment artifact here is a **self-contained serialized StableHLO
program** (jax.export): the streaming step — uint8 frames in, mask logits +
carried memory state out — with the trained parameters baked in as
constants.  A consumer needs jax (any platform the artifact was exported
for) but none of this package's model code; the recurrence semantics are
frozen into the program.

Artifact layout (one directory):
    model.shlo      serialized jax.export blob (versioned, stable format)
    meta.json       shapes/dtypes of the step signature + model config

The exported step signature (positional):
    (frames_u8 (B,T,H,W,C) uint8, mem (B,heads,dk,dv) f32,
     frames_seen (B,) i32)
      -> (logits (B,T,H,W,K) f32, mem', frames_seen')

Streaming works exactly as in-process: feed chunks, thread (mem,
frames_seen) through.  Chunk-size invariance of the recurrence is tested in
tests/test_export.py (artifact output ≡ direct model.apply, state carry
across chunks ≡ one batched call).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_BLOB = "model.shlo"
_META = "meta.json"


def _streaming_step_fn(model, params):
    """Build the pure serving step with params closed over (baked in)."""

    def step(frames_u8, mem, frames_seen):
        from gdkvm_tpu.models.gdkvm import StreamState
        frames = frames_u8.astype(jnp.float32) * (1.0 / 255.0)
        state = StreamState(mem=mem, frames_seen=frames_seen)
        logits, new_state = model.apply(params, frames, state)
        return logits, new_state.mem, new_state.frames_seen

    return step


def export_streaming(model, params, *, image_size: int, chunk: int = 16,
                     batch: int = 1,
                     platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the streaming step to a StableHLO blob.

    platforms: lowering targets (e.g. ("tpu", "cpu")).  None = the current
    default backend only.  Multi-platform export requires the pure-XLA GDR
    path (gdr_impl="chunked") — the Pallas kernel is TPU-only.
    """
    from jax import export as jexport

    c = model.cfg
    if platforms is not None and len(tuple(platforms)) > 1 \
            and getattr(c, "gdr_impl", "chunked") != "chunked":
        raise ValueError(
            f"multi-platform export (platforms={tuple(platforms)}) requires "
            f"the pure-XLA GDR path: set model.gdr_impl='chunked' (got "
            f"{c.gdr_impl!r} — the Pallas kernel lowers for TPU only)")
    step = jax.jit(_streaming_step_fn(model, params))
    args = (
        jax.ShapeDtypeStruct((batch, chunk, image_size, image_size,
                              c.in_channels), jnp.uint8),
        jax.ShapeDtypeStruct((batch, c.num_heads, c.head_dim_k,
                              c.head_dim_v), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
    )
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    return jexport.export(step, **kw)(*args).serialize()


def save_artifact(out_dir: str, model, params, *, image_size: int,
                  chunk: int = 16, batch: int = 1,
                  platforms: Optional[Sequence[str]] = None) -> dict:
    """Export + write the artifact directory; returns the metadata dict."""
    import dataclasses

    os.makedirs(out_dir, exist_ok=True)
    blob = export_streaming(model, params, image_size=image_size,
                            chunk=chunk, batch=batch, platforms=platforms)
    c = model.cfg
    meta = {
        "format": "gdkvm-stablehlo-v1",
        "signature": {
            "frames_u8": [batch, chunk, image_size, image_size,
                          c.in_channels],
            "mem": [batch, c.num_heads, c.head_dim_k, c.head_dim_v],
            "frames_seen": [batch],
            "outputs": ["logits (B,T,H,W,K) f32", "mem f32",
                        "frames_seen i32"],
        },
        "num_classes": c.num_classes,
        "platforms": list(platforms) if platforms else
        [jax.default_backend()],
        "model_config": dataclasses.asdict(c) if dataclasses.is_dataclass(c)
        else dict(c.__dict__),
        "blob_bytes": len(blob),
    }
    with open(os.path.join(out_dir, _BLOB), "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1, default=str)
    return meta


class ServingModel:
    """Loaded serving artifact: feed uint8 chunks, thread the state."""

    def __init__(self, art_dir: str):
        from jax import export as jexport

        with open(os.path.join(art_dir, _BLOB), "rb") as f:
            self._exported = jexport.deserialize(f.read())
        with open(os.path.join(art_dir, _META)) as f:
            self.meta = json.load(f)
        sig = self.meta["signature"]
        self.batch, self.chunk = sig["frames_u8"][0], sig["frames_u8"][1]
        self._call = jax.jit(self._exported.call)

    def init_state(self) -> Tuple[jax.Array, jax.Array]:
        sig = self.meta["signature"]
        return (jnp.zeros(sig["mem"], jnp.float32),
                jnp.zeros(sig["frames_seen"], jnp.int32))

    def step(self, frames_u8, mem, frames_seen):
        """One chunk: returns (logits, mem', frames_seen')."""
        return self._call(frames_u8, mem, frames_seen)


def load_artifact(art_dir: str) -> ServingModel:
    return ServingModel(art_dir)
