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
                   eps: float) -> Tuple[jax.Array, jax.Array]:
    """Shared class-major CE + soft-Dice computation (one transpose, one
    log_softmax feeding both terms)."""
    lg = _class_major(logits)
    k = lg.shape[2]
    logp = jax.nn.log_softmax(lg, axis=2)
    onehot = _onehot_cm(labels, k, logp.dtype)
    denom = jnp.maximum(jnp.sum(valid), 1.0)

    ll = jnp.sum(logp * onehot, axis=2)                # (B,T,H,W)
    per_frame = -jnp.mean(ll, axis=(2, 3))             # (B,T)
    ce = jnp.sum(per_frame * valid) / denom

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


def segmentation_loss(logits: jax.Array, labels: jax.Array,
                      valid: jax.Array, ce_weight: float = 1.0,
                      dice_weight: float = 1.0
                      ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """CE + soft Dice, sharing one transpose/softmax between the terms."""
    ce, dl = _ce_dice_terms(logits, labels, valid, eps=1.0)
    loss = ce_weight * ce + dice_weight * dl
    return loss, {"loss": loss, "ce": ce, "dice_loss": dl}
