"""Segmentation losses: cross-entropy + soft Dice.

The reference does not document its loss (SURVEY.md §2.2 "Loss"); the
memory-VOS lineage default is bootstrapped CE + soft Dice.  Both terms
respect a per-frame validity mask (EchoNet has ground truth only at traced
ED/ES frames).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def softmax_ce(logits: jax.Array, labels: jax.Array,
               valid: jax.Array) -> jax.Array:
    """Per-pixel CE averaged over valid frames.

    logits: (B,T,H,W,K) fp32. labels: (B,T,H,W) int. valid: (B,T).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    per_frame = -jnp.mean(ll, axis=(2, 3))            # (B,T)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(per_frame * valid) / denom


def soft_dice(logits: jax.Array, labels: jax.Array, valid: jax.Array,
              eps: float = 1.0) -> jax.Array:
    """1 − mean soft Dice over foreground classes, valid frames only."""
    k = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, k, dtype=probs.dtype)
    # Per frame per class over pixels.
    inter = jnp.sum(probs * onehot, axis=(2, 3))       # (B,T,K)
    psum = jnp.sum(probs, axis=(2, 3))
    lsum = jnp.sum(onehot, axis=(2, 3))
    dice = (2 * inter + eps) / (psum + lsum + eps)     # (B,T,K)
    fg = dice[..., 1:].mean(axis=-1)                   # (B,T) foreground mean
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return 1.0 - jnp.sum(fg * valid) / denom


def segmentation_loss(logits: jax.Array, labels: jax.Array,
                      valid: jax.Array, ce_weight: float = 1.0,
                      dice_weight: float = 1.0
                      ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    ce = softmax_ce(logits, labels, valid)
    dl = soft_dice(logits, labels, valid)
    loss = ce_weight * ce + dice_weight * dl
    return loss, {"loss": loss, "ce": ce, "dice_loss": dl}
