"""KPFF fusion + multi-scale decoder.

"KPFF fuses the local key feature, the global key feature with the pixel
feature" at multiple scales, "enhancing robustness against boundary blurring
and noise" (reference: website/src/content/homepage/en.json:20,
README.md:20).  Here:

- *pixel feature*  = the encoder feature map at that scale (skip connection),
- *local key feature* = a depthwise-separable conv of the scale's features
  (local spatial context),
- *global key feature* = the LKVA memory readout (stride 16), projected and
  bilinearly upsampled to the scale.

Each KPFF block concatenates the three, mixes with 1×1 + 3×3 convs, and
applies an SE-style channel gate computed from the global feature — so memory
content modulates which channels survive at every scale.

The decoder runs batched over all frames (B·T folded into the batch dim) —
convs stay large for the MXU; only the GDR scan is sequential.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gdkvm_tpu.models.encoder import _gn_groups


def resize_bilinear(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize of NHWC maps as two MXU matmuls.

    Same separable triangle-filter-as-matmul trick as the input preproc
    (ops/preproc.py): the (dst, src) interpolation weights are trace-time
    constants, so the resize is two dense contractions instead of the
    gather/reduce graph `jax.image.resize` lowers to — measured 0.37 →
    0.10 ms on the 256² logits upsample (v5e, floor-corrected).  Matches
    `jax.image.resize(..., "bilinear")` semantics in both directions
    (antialiased triangle when downscaling, e.g. the mask-prompt
    downsample in models/gdkvm.py)."""
    b, h, w, c = x.shape
    if (h, w) == hw:
        return x
    from gdkvm_tpu.ops.preproc import _resize_matrix
    r_h = jnp.asarray(_resize_matrix(h, hw[0])).astype(x.dtype)
    r_w = jnp.asarray(_resize_matrix(w, hw[1])).astype(x.dtype)
    # fp32 inputs (logits upsample, mask-prompt downsample) keep full
    # precision through the contraction (CLAUDE.md rule 4: TPU truncates
    # fp32 matmuls to bf16 by default); bf16 feature maps use the normal
    # single-pass dots — their operands carry no extra bits to preserve.
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jnp.einsum("oh,bhwc->bowc", r_h, x, precision=prec)
    return jnp.einsum("pw,bhwc->bhpc", r_w, y, precision=prec)


class KPFFBlock(nn.Module):
    """Key-Pixel Feature Fusion at one scale."""
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel: jax.Array, global_key: jax.Array,
                 up: jax.Array | None = None) -> jax.Array:
        """pixel: (B,h,w,Cp) encoder skip. global_key: (B,hg,wg,Cg) memory
        readout map. up: decoder stream from the coarser scale (optional)."""
        hw = pixel.shape[1:3]
        # Project the memory readout to block channels BEFORE upsampling:
        # a 1×1 conv commutes with the (linear, spatial-only) bilinear
        # resize, and running it at the stride-16 grid instead of the
        # target grid never materializes the (hw, 256)-channel map —
        # measured 0.74 → 0.05 ms on the 256² kpff4 global branch (v5e).
        # Same params/name as the resize-first order ⇒ checkpoints load
        # unchanged.
        g_small = nn.Conv(self.channels, (1, 1), use_bias=False,
                          dtype=self.dtype,
                          name="global_proj")(global_key.astype(self.dtype))
        g = resize_bilinear(g_small, hw)

        # Local key feature: depthwise 3×3 + pointwise over the pixel map.
        loc = nn.Conv(pixel.shape[-1], (3, 3), padding="SAME",
                      feature_group_count=pixel.shape[-1], use_bias=False,
                      dtype=self.dtype, name="local_dw")(pixel)
        loc = nn.Conv(self.channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="local_pw")(loc)

        px = nn.Conv(self.channels, (1, 1), use_bias=False,
                     dtype=self.dtype, name="pixel_proj")(pixel)

        parts = [px, loc, g]
        if up is not None:
            parts.append(resize_bilinear(up, hw).astype(self.dtype))
        h = jnp.concatenate(parts, axis=-1)
        h = nn.Conv(self.channels, (1, 1), use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=_gn_groups(self.channels),
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=_gn_groups(self.channels),
                         dtype=self.dtype)(h)
        h = nn.silu(h)

        # SE-style channel gate from the global (memory) feature: memory
        # decides which fused channels matter at this scale.  Pooled from
        # the pre-resize stride-16 map — spatial mean and upsample nearly
        # commute (they differ only in edge-clamp weighting), and the
        # small map is ~16× cheaper to reduce.  NOTE: unlike the
        # global_proj reorder above (exact), this changes outputs
        # slightly for checkpoints trained before r2.4 — params load
        # unchanged but the SE pooling weights boundary pixels
        # differently; quality re-validated on the hard-synth and 256²
        # full recipes (Dice identical to 4 decimals, BASELINE.md r2.4).
        se = jnp.mean(g_small.astype(jnp.float32), axis=(1, 2))
        se = nn.silu(nn.Dense(max(self.channels // 4, 8),
                              dtype=self.dtype)(se.astype(self.dtype)))
        se = nn.sigmoid(nn.Dense(self.channels, dtype=self.dtype)(se))
        return h * se[:, None, None, :]


class Decoder(nn.Module):
    """KPFF blocks at strides 16/8/4, then logits upsampled to input size.

    Per-frame mask logits output matches the reference API shape
    ("per-frame mask logits, memory-state carry", /root/repo/BASELINE.json).
    """
    channels: Sequence[int] = (96, 64, 48)   # at strides 16, 8, 4
    num_classes: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, f4: jax.Array, f8: jax.Array, f16: jax.Array,
                 readout: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
        c16, c8, c4 = self.channels
        d16 = KPFFBlock(c16, dtype=self.dtype, name="kpff16")(f16, readout)
        d8 = KPFFBlock(c8, dtype=self.dtype, name="kpff8")(f8, readout, d16)
        d4 = KPFFBlock(c4, dtype=self.dtype, name="kpff4")(f4, readout, d8)
        logits4 = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          name="head")(d4)
        # Predict at stride 4, bilinear-upsample logits to full resolution
        # (matmul-form resize; at 256² the old jax.image form cost 0.37 ms
        # vs 0.10 — a class-major variant was also A/B'd and is neutral,
        # the resize contraction has no K-minor lane penalty).
        return resize_bilinear(logits4.astype(jnp.float32), out_hw)
