"""Segmentation losses: cross-entropy + soft Dice.

The reference does not document its loss (SURVEY.md §2.2 "Loss"); the
memory-VOS lineage default is bootstrapped CE + soft Dice.  Both terms
respect a per-frame validity mask (EchoNet has ground truth only at traced
ED/ES frames).

TPU layout note: logits arrive as (B,T,H,W,K) with K ≈ 2-4 classes on the
minor (128-lane) dimension — elementwise/softmax passes in that layout run
at K/128 lane utilization, and label selection via take_along_axis is a
minor-dim gather (both measured: the loss alone cost 92 ms of a 132 ms
train step at 256², batch 8).  The math here therefore transposes once to
(B,T,K,H,W) — W on lanes at full width — and selects labels with a fused
iota==label one-hot instead of a gather.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _class_major(logits: jax.Array) -> jax.Array:
    """(B,T,H,W,K) → (B,T,K,H,W): one relayout pass, full-lane math after."""
    return jnp.transpose(logits, (0, 1, 4, 2, 3))


def _onehot_cm(labels: jax.Array, k: int, dtype) -> jax.Array:
    """Class-major one-hot: labels (B,T,H,W) → (B,T,K,H,W) via iota compare
    (fuses into consumers; no gather/scatter)."""
    classes = jnp.arange(k, dtype=jnp.int32).reshape(1, 1, k, 1, 1)
    return (labels[:, :, None].astype(jnp.int32) == classes).astype(dtype)


def _ce_dice_terms(logits: jax.Array, labels: jax.Array, valid: jax.Array,
                   eps: float, bootstrap_ratio: float = 1.0,
                   bootstrap_weight=1.0) -> Tuple[jax.Array, jax.Array]:
    """Shared class-major CE + soft-Dice computation (one transpose, one
    log_softmax feeding both terms).

    ``bootstrap_ratio`` < 1 enables bootstrapped (top-k hard-pixel) CE —
    the memory-VOS lineage default this module's header names (the
    reference documents no loss, /root/reference/README.md:20; SURVEY
    §2.2 Loss row): per valid frame, only the hardest ratio·H·W pixels
    contribute to CE.  k is static (jit-stable single trace); annealing
    therefore happens by BLENDING mean-CE with top-k CE via the traced
    scalar ``bootstrap_weight`` λ ∈ [0,1] (0 = all pixels early in
    training, 1 = hard pixels only late) — the standard warm-up schedule
    without dynamic shapes or mid-run recompiles.
    """
    lg = _class_major(logits)
    k = lg.shape[2]
    logp = jax.nn.log_softmax(lg, axis=2)
    onehot = _onehot_cm(labels, k, logp.dtype)
    denom = jnp.maximum(jnp.sum(valid), 1.0)

    ll = jnp.sum(logp * onehot, axis=2)                # (B,T,H,W)
    per_frame = -jnp.mean(ll, axis=(2, 3))             # (B,T)
    ce = jnp.sum(per_frame * valid) / denom
    if bootstrap_ratio < 1.0:
        b, t, h, w = ll.shape
        pix_ce = (-ll).reshape(b, t, h * w)
        # TPU-first selection (measured in BASELINE.md r5.5):
        # 1. approx_max_k, not top_k — exact top-k lowers to a full sort
        #    (+0.85 ms fwd at the 112² recipe shape); the TPU-native
        #    approximate top-k is O(n) at 0.95 recall, and hard-pixel
        #    MINING only needs ≈the hardest pixels, not exactly them.
        #    On CPU it lowers to exact top_k (tests see exact selection).
        # 2. The selection is stop_gradient'ed and the hard mean is
        #    computed through a MASK (pix_ce ≥ k-th value) instead of the
        #    selected values: top-k selection is piecewise constant, so
        #    the masked gradient equals the true top-k gradient a.e. —
        #    but the backward is an elementwise multiply instead of the
        #    k-wide scatter the top_k adjoint emits (+1.7 → ~0 ms).
        # 3. At large H·W the threshold is estimated from a strided
        #    subsample (≥8192 pixels): the k-th-largest VALUE is a
        #    quantile, and a quantile estimate from 8k samples of a
        #    spatially-correlated CE field is within noise of the full
        #    one — while approx_max_k over 65k pixels at 256² cost
        #    2.6 ms, the subsampled estimate is ~10× cheaper.  stride=1
        #    (exact shape) below 16k pixels, so the CPU law tests and
        #    the 112² recipe see the full field.
        hw = h * w
        stride = max(1, hw // 8192)
        sub = pix_ce[..., ::stride]
        ksub = max(1, int(round(bootstrap_ratio * sub.shape[-1])))
        hard = jax.lax.approx_max_k(
            jax.lax.stop_gradient(sub), ksub)[0]       # (B,T,ksub) desc
        thr = hard[..., -1:]                           # ≈ k-th largest
        mask = jax.lax.stop_gradient(
            (pix_ce >= thr).astype(pix_ce.dtype))
        cnt = jax.lax.stop_gradient(
            jnp.maximum(mask.sum(axis=-1), 1.0))       # ties ⇒ cnt ≥ k
        per_frame_hard = (pix_ce * mask).sum(axis=-1) / cnt
        ce_hard = jnp.sum(per_frame_hard * valid) / denom
        lam = jnp.asarray(bootstrap_weight, ce.dtype)
        ce = (1.0 - lam) * ce + lam * ce_hard

    probs = jnp.exp(logp)
    inter = jnp.sum(probs * onehot, axis=(3, 4))       # (B,T,K)
    psum = jnp.sum(probs, axis=(3, 4))
    lsum = jnp.sum(onehot, axis=(3, 4))
    dice = (2 * inter + eps) / (psum + lsum + eps)     # (B,T,K)
    fg = dice[..., 1:].mean(axis=-1)                   # (B,T) foreground mean
    dl = 1.0 - jnp.sum(fg * valid) / denom
    return ce, dl


def softmax_ce(logits: jax.Array, labels: jax.Array,
               valid: jax.Array) -> jax.Array:
    """Per-pixel CE averaged over valid frames.

    logits: (B,T,H,W,K) fp32. labels: (B,T,H,W) int. valid: (B,T).
    """
    return _ce_dice_terms(logits, labels, valid, eps=1.0)[0]


def soft_dice(logits: jax.Array, labels: jax.Array, valid: jax.Array,
              eps: float = 1.0) -> jax.Array:
    """1 − mean soft Dice over foreground classes, valid frames only."""
    return _ce_dice_terms(logits, labels, valid, eps=eps)[1]


def bootstrap_schedule(step, num_iterations: int, start_frac: float,
                       end_frac: float):
    """Annealing weight λ(step) for bootstrapped CE: 0 before
    start_frac·N iterations (all pixels — the model first needs easy
    gradient everywhere), linear ramp to 1 by end_frac·N (hard pixels
    only).  Traced scalar: one compile for the whole run."""
    s = float(num_iterations) * start_frac
    e = float(num_iterations) * end_frac
    span = max(e - s, 1.0)
    return jnp.clip((jnp.asarray(step, jnp.float32) - s) / span, 0.0, 1.0)


def segmentation_loss(logits: jax.Array, labels: jax.Array,
                      valid: jax.Array, ce_weight: float = 1.0,
                      dice_weight: float = 1.0,
                      bootstrap_ratio: float = 1.0,
                      bootstrap_weight=1.0
                      ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """CE + soft Dice, sharing one transpose/softmax between the terms.

    ``bootstrap_ratio`` < 1 turns the CE term into annealed bootstrapped
    (top-k hard-pixel) CE — see _ce_dice_terms."""
    ce, dl = _ce_dice_terms(logits, labels, valid, eps=1.0,
                            bootstrap_ratio=bootstrap_ratio,
                            bootstrap_weight=bootstrap_weight)
    loss = ce_weight * ce + dice_weight * dl
    return loss, {"loss": loss, "ce": ce, "dice_loss": dl}
