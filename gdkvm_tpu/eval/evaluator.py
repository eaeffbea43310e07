"""Eval stage: sharded clip evaluation + visualization dumps.

Equivalent of the reference's in-training eval stage (num_vis sample dumps,
reference: website/src/pages/[lang]/reprod/index.astro:250-252).  Videos are
sharded across chips over the ('data',) mesh axis — embarrassingly parallel,
per-chip streaming recurrence, Dice partial sums reduced exactly
(SURVEY.md §2.4 distributed eval).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gdkvm_tpu.config.schema import Config
from gdkvm_tpu.data.pipeline import batch_iterator, make_dataset, \
    prefetch_to_device
from gdkvm_tpu.eval import metrics as M
from gdkvm_tpu.eval.vis import save_vis
from gdkvm_tpu.models.gdkvm import GDKVM
from gdkvm_tpu.parallel import batch_sharding


def evaluate(cfg: Config, model: GDKVM, params, mesh,
             step: int = 0) -> Dict[str, float]:
    """Run the val split; returns per-class Dice + throughput metadata."""
    k = cfg.model.num_classes
    try:
        dataset = make_dataset(cfg.data, cfg.data.val_split, k)
    except FileNotFoundError as exc:
        # Loud, not silent: a typo'd data_path would otherwise train the
        # full run with no eval and no signal.
        import logging
        import warnings
        msg = (f"eval: val split {cfg.data.val_split!r} not found under "
               f"{cfg.data.data_path!r} ({exc}); SKIPPING evaluation — "
               f"check data_path / val_split")
        logging.getLogger("gdkvm").warning(msg)
        warnings.warn(msg, stacklevel=2)
        return {}

    # Eval batch must tile the data axis; pad with the eval batch size.
    data_par = mesh.shape["data"]
    bs = max(cfg.eval_stage.batch_size, data_par)
    bs = (bs // data_par) * data_par

    hd_on = cfg.eval_stage.hd95

    @jax.jit
    def fwd_part(params, frames_u8, masks, valid):
        """Forward + Dice partial sums + mid-frame preds in ONE jit: eager
        ops between batches are remote dispatches on this platform, and a
        per-batch device_get would serialize the pipeline."""
        frames = frames_u8.astype(jnp.float32) / 255.0
        logits, _ = model.apply(params, frames)
        part = M.dice_accumulate(logits, masks.astype(jnp.int32), valid, k)
        lg = jnp.transpose(logits, (0, 1, 4, 2, 3))   # class-major argmax
        pred_all = jnp.argmax(lg, axis=2).astype(jnp.uint8)
        t_mid = logits.shape[1] // 2
        return part, pred_all[:, t_mid], (pred_all if hd_on else 0)

    it = batch_iterator(dataset, bs, shuffle=False, augment=False,
                        drop_last=False, loop=False,
                        num_workers=cfg.data.num_workers)
    parts = []
    vis_jobs = []          # (frames_dev, masks_dev, preds_dev) to dump
    hd_jobs = []           # (pred_all_dev, masks_host, valid_host)
    vis_budget = cfg.eval_stage.num_vis
    vis_dir = os.path.join(cfg.runtime.run_dir, "vis")
    # Ragged tails must be dropped BEFORE the device prefetch: a batch not
    # divisible by the data axis cannot even be device_put with the mesh
    # sharding (it used to kill the producer thread silently — eval then
    # returned {} with no signal).
    it = (b for b in it if b.frames.shape[0] % data_par == 0)
    with mesh:
        it = prefetch_to_device(it, size=2, sharding=batch_sharding(mesh))
        for batch in it:
            part, pred_mid, pred_all = fwd_part(
                params, batch.frames, batch.masks, batch.valid)
            parts.append(part)          # async — fetched once at the end
            if len(vis_jobs) * bs < vis_budget:
                vis_jobs.append((batch.frames, batch.masks, pred_mid))
            if hd_on:
                # Fetch to host immediately (off the timed path) so the
                # full (B,T,H,W) uint8 prediction buffers don't pile up in
                # HBM for the whole eval pass on large val splits.
                hd_jobs.append(jax.device_get(
                    (pred_all, batch.masks, batch.valid)))
    if not parts:
        return {}
    parts = jax.device_get(parts)
    acc = parts[0]
    for part in parts[1:]:
        acc = M.dice_merge(acc, part)

    # num_vis overlay dumps from the first batches (host-side, post-loop).
    vis_saved = 0
    for frames_d, masks_d, preds_d in vis_jobs:
        frames_h, masks_h, preds_h = map(np.asarray, jax.device_get(
            (frames_d, masks_d, preds_d)))
        t_mid = frames_h.shape[1] // 2
        for i in range(min(frames_h.shape[0], vis_budget - vis_saved)):
            save_vis(vis_dir, step, vis_saved, frames_h[i, t_mid],
                     preds_h[i], masks_h[i, t_mid])
            vis_saved += 1
        if vis_saved >= vis_budget:
            break
    out = M.dice_finalize(acc)

    if hd_on and hd_jobs:
        # Host-side HD95 over all valid frames (val splits are small; the
        # uint8 preds fetch is a few MB at eval cadence).
        per_class: Dict[str, list] = {}
        n_inf = 0
        n_pairs = 0          # (frame, class) pairs where the class exists
        for pred_h, masks_h, valid_h in (map(np.asarray, j)
                                         for j in hd_jobs):
            b, t = valid_h.shape
            for i in range(b):
                for tt in range(t):
                    if valid_h[i, tt] <= 0:
                        continue
                    d = M.hd95(pred_h[i, tt],
                               masks_h[i, tt].astype(np.int64), k)
                    for key, val in d.items():
                        n_pairs += 1
                        if np.isinf(val):
                            n_inf += 1
                        else:
                            per_class.setdefault(key, []).append(val)
        for key, vals in per_class.items():
            out[key] = float(np.mean(vals))
        if per_class:
            out["hd95_fg_mean"] = float(np.mean(
                [np.mean(v) for v in per_class.values()]))
        # Fraction of evaluated (frame, class) pairs where one side was
        # empty (HD undefined) — a true fraction for any class count.
        out["hd95_miss_frac"] = float(n_inf / max(n_pairs, 1))
    return out
