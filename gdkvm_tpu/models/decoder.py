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
from gdkvm_tpu.ops.norms import GroupNorm


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


class _Kernel(nn.Module):
    """Bare conv-kernel parameter holder.

    Exists so KPFF can fold the mix conv into each branch's projection in
    WEIGHT space (below) while keeping the exact param tree of the plain
    conv formulation — `_Kernel(name="pixel_proj")` creates
    `pixel_proj/kernel` with nn.Conv's shape and init, so checkpoints
    from the concat-form block load unchanged."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class KPFFBlock(nn.Module):
    """Key-Pixel Feature Fusion at one scale.

    Math (reference semantics, homepage/en.json:20): concatenate the
    pixel projection, the local (depthwise) key feature, the upsampled
    global (memory) readout [and the coarser decoder stream], mix with a
    1×1 conv, refine with GN→SiLU→3×3→GN→SiLU, gate channels from the
    global feature (SE).

    Implementation (r3): the concat→1×1-mix is a SUM of per-branch
    linear maps, so the mix kernel's row blocks are folded into each
    branch's own projection at trace time (fp32 weight-space merge):

        mix(concat(px, loc, g, up)) = pixel @ (Wpx·M_px)
                                    + loc_dw @ (Wlpw·M_loc)
                                    + resize(global_key @ (Wg·M_g))
                                    + resize(up @ M_up)

    — no concat map, no intermediate `channels`-wide px/loc/g maps, the
    global and up slices applied at their SMALL grids before the (linear,
    spatial-only) bilinear resize.  Same FLOPs for the Cp→ch branches,
    minus the whole (3ch+Cup)→ch mix matmul and ~6× less intermediate
    HBM traffic; exact up to bf16 matmul reassociation (merges done in
    fp32).  The r2.4 "kernel-slice sums" null result kept the px/loc/g
    intermediates and only split the mix — this folds them away entirely.
    """
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel: jax.Array, global_key: jax.Array,
                 up: jax.Array | None = None) -> jax.Array:
        """pixel: (B,h,w,Cp) encoder skip. global_key: (B,hg,wg,Cg) memory
        readout map. up: decoder stream from the coarser scale (optional)."""
        hw = pixel.shape[1:3]
        ch, cp, cg = self.channels, pixel.shape[-1], global_key.shape[-1]
        w_g = _Kernel((1, 1, cg, ch), name="global_proj")()
        w_lpw = _Kernel((1, 1, cp, ch), name="local_pw")()
        w_px = _Kernel((1, 1, cp, ch), name="pixel_proj")()
        mix_in = 3 * ch + (up.shape[-1] if up is not None else 0)
        w_mix = _Kernel((1, 1, mix_in, ch), name="Conv_0")()

        # Fold the mix slices into the branch projections (fp32, then one
        # cast to compute dtype — same rounding boundary as flax's own
        # param cast in nn.Conv).
        m = w_mix[0, 0].astype(jnp.float32)
        f32 = lambda w: w[0, 0].astype(jnp.float32)
        w_px_m = (f32(w_px) @ m[:ch]).astype(self.dtype)
        w_loc_m = (f32(w_lpw) @ m[ch:2 * ch]).astype(self.dtype)
        w_g_m = (f32(w_g) @ m[2 * ch:3 * ch]).astype(self.dtype)

        # Local key feature: depthwise 3×3 (spatial — stays a real conv).
        loc = nn.Conv(cp, (3, 3), padding="SAME", feature_group_count=cp,
                      use_bias=False, dtype=self.dtype,
                      name="local_dw")(pixel.astype(self.dtype))

        h = jnp.einsum("bhwc,cd->bhwd", pixel.astype(self.dtype), w_px_m)
        h = h + jnp.einsum("bhwc,cd->bhwd", loc, w_loc_m)
        # Global (memory) branch projected at the stride-16 grid, THEN
        # upsampled (projection commutes with the spatial-only resize —
        # the r2.4 reorder, now also carrying the mix slice).
        g_sm = jnp.einsum("bhwc,cd->bhwd", global_key.astype(self.dtype),
                          w_g_m)
        h = h + resize_bilinear(g_sm, hw)
        if up is not None:
            u_sm = jnp.einsum("bhwc,cd->bhwd", up.astype(self.dtype),
                              m[3 * ch:].astype(self.dtype))
            h = h + resize_bilinear(u_sm, hw)

        h = GroupNorm(num_groups=_gn_groups(ch), dtype=self.dtype,
                         name="GroupNorm_0")(h)
        h = nn.silu(h)
        h = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="Conv_1")(h)
        h = GroupNorm(num_groups=_gn_groups(ch), dtype=self.dtype,
                         name="GroupNorm_1")(h)
        h = nn.silu(h)

        # SE-style channel gate from the global (memory) feature: memory
        # decides which fused channels matter at this scale.  Spatial mean
        # commutes with the 1×1 projection (both linear), so pool the RAW
        # global map first and project the single pooled vector — the
        # stride-16 (hg·wg, ch) g_small map is never materialized for the
        # gate.  (Pooling pre-resize ≈ post-resize up to edge-clamp
        # weights — the r2.4 change, re-validated there.)
        se = jnp.mean(global_key.astype(jnp.float32), axis=(1, 2))
        se = (se @ f32(w_g)).astype(self.dtype)
        se = nn.silu(nn.Dense(max(ch // 4, 8), dtype=self.dtype,
                              name="Dense_0")(se))
        se = nn.sigmoid(nn.Dense(ch, dtype=self.dtype, name="Dense_1")(se))
        return h * se[:, None, None, :]


class Decoder(nn.Module):
    """KPFF blocks from stride 16 down, then logits upsampled to input size.

    Per-frame mask logits output matches the reference API shape
    ("per-frame mask logits, memory-state carry", /root/repo/BASELINE.json).

    ``channels`` sets both width and DEPTH of the pyramid: 3 entries =
    KPFF at strides 16/8/4 (the classic head), 2 entries = stop at stride
    8 and upsample the logits 8× instead of 4×.  The 2-scale head is the
    lane-aligned TPU option: the r3.9 profile measured kpff4 — a
    48-channel block on the stride-4 grid at 37.5% of the 128-lane
    contraction axis — carrying 74% of the decoder backward; dropping to
    stride 8 removes the worst lane-occupancy stage of the whole model
    and rebalances that budget into wider (≥64-channel) deep stages
    (configs/gdkvm_ts8_112.yaml; frontier table in BASELINE.md r4).
    """
    channels: Sequence[int] = (96, 64, 48)   # from stride 16 downward
    num_classes: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, f4: jax.Array, f8: jax.Array, f16: jax.Array,
                 readout: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
        if not 2 <= len(self.channels) <= 3:
            raise ValueError(
                f"Decoder.channels needs 2 (head at stride 8) or 3 (head "
                f"at stride 4) entries, got {tuple(self.channels)}")
        feats = (f16, f8, f4)
        names = ("kpff16", "kpff8", "kpff4")
        d = None
        for ch, feat, name in zip(self.channels, feats, names):
            d = KPFFBlock(ch, dtype=self.dtype, name=name)(feat, readout, d)
        if len(self.channels) == 2:
            # Sub-pixel head for the stride-8 pyramid: predict K·4
            # channels at stride 8 and depth-to-space them to stride-4
            # logits — the MXU-friendly way to recover fine boundary
            # detail without a stride-4 feature stage (the head conv gets
            # 4× wider = fuller lanes; a thin-structure Dice gap at the
            # plain 8× upsample motivated this, BASELINE.md r4.4).
            p = 2
            hs = nn.Conv(self.num_classes * p * p, (1, 1),
                         dtype=self.dtype, name="head")(d)
            b, hh, ww, _ = hs.shape
            hs = hs.reshape(b, hh, ww, p, p, self.num_classes)
            logits_s = hs.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, hh * p, ww * p, self.num_classes)
        else:
            logits_s = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                               name="head")(d)
        # Predict at stride 4, bilinear-upsample logits to full resolution
        # (matmul-form resize; at 256² the old jax.image form cost 0.37 ms
        # vs 0.10 — a class-major variant was also A/B'd and is neutral,
        # the resize contraction has no K-minor lane penalty).
        return resize_bilinear(logits_s.astype(jnp.float32), out_hw)
