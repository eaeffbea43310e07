"""Dice metrics (hard, per class) with per-frame validity.

Protocol (SURVEY.md §7.3 item 5): per-class Dice on hard argmax predictions,
accumulated as (intersection, pred-sum, label-sum) so aggregation over
frames/videos/chips is exact — chip-level partial sums reduce with
jax.lax.psum or a host gather, never averaging Dice of Dice.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def dice_accumulate(logits: jax.Array, labels: jax.Array,
                    valid: jax.Array, num_classes: int) -> Dict[str, jax.Array]:
    """Partial sums for per-class Dice.

    Returns dict with 'inter', 'psum', 'lsum' each (K,) fp32, plus 'frames'.
    """
    # Class-major layout: K on the minor (lane) dim runs elementwise math at
    # K/128 lane utilization (same fix as train/losses.py — measured there).
    lg = jnp.transpose(logits, (0, 1, 4, 2, 3))        # (B,T,K,H,W)
    pred = jnp.argmax(lg, axis=2)                      # (B,T,H,W)
    classes = jnp.arange(num_classes, dtype=jnp.int32).reshape(
        1, 1, num_classes, 1, 1)
    v = valid[:, :, None, None, None]                  # (B,T,1,1,1)
    pred1 = (pred[:, :, None] == classes).astype(jnp.float32) * v
    lab1 = (labels[:, :, None].astype(jnp.int32) == classes
            ).astype(jnp.float32) * v
    acc = {}
    acc["inter"] = jnp.sum(pred1 * lab1, axis=(0, 1, 3, 4))
    acc["psum"] = jnp.sum(pred1, axis=(0, 1, 3, 4))
    acc["lsum"] = jnp.sum(lab1, axis=(0, 1, 3, 4))
    acc["frames"] = jnp.sum(valid)
    return acc


def dice_merge(a: Dict[str, jax.Array], b: Dict[str, jax.Array]
               ) -> Dict[str, jax.Array]:
    return jax.tree.map(lambda x, y: x + y, a, b)


def dice_finalize(acc: Dict[str, jax.Array], eps: float = 1e-7
                  ) -> Dict[str, float]:
    """Per-class Dice + foreground mean from accumulated partial sums."""
    dice = (2 * acc["inter"] + eps) / (acc["psum"] + acc["lsum"] + eps)
    out = {f"dice_class{i}": float(d) for i, d in enumerate(dice)}
    fg = dice[1:]
    out["dice_fg_mean"] = float(jnp.mean(fg)) if fg.size else float("nan")
    out["frames"] = float(acc["frames"])
    return out
