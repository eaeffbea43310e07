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
    except FileNotFoundError:
        return {}

    # Eval batch must tile the data axis; pad with the eval batch size.
    data_par = mesh.shape["data"]
    bs = max(cfg.eval_stage.batch_size, data_par)
    bs = (bs // data_par) * data_par

    @jax.jit
    def fwd(params, frames_u8):
        frames = frames_u8.astype(jnp.float32) / 255.0
        logits, _ = model.apply(params, frames)
        return logits

    it = batch_iterator(dataset, bs, shuffle=False, augment=False,
                        drop_last=False, loop=False,
                        num_workers=cfg.data.num_workers)
    acc = None
    vis_saved = 0
    vis_dir = os.path.join(cfg.runtime.run_dir, "vis")
    with mesh:
        it = prefetch_to_device(it, size=2, sharding=batch_sharding(mesh))
        for batch in it:
            if batch.frames.shape[0] % data_par:
                continue  # ragged tail smaller than the mesh; skip
            logits = fwd(params, batch.frames)
            part = M.dice_accumulate(logits, batch.masks.astype(jnp.int32),
                                     batch.valid, k)
            part = jax.device_get(part)
            acc = part if acc is None else M.dice_merge(acc, part)

            # num_vis overlay dumps from the first batches.
            if vis_saved < cfg.eval_stage.num_vis:
                frames_h = np.asarray(jax.device_get(batch.frames))
                masks_h = np.asarray(jax.device_get(batch.masks))
                preds_h = np.asarray(jnp.argmax(logits, axis=-1))
                b = frames_h.shape[0]
                t_mid = frames_h.shape[1] // 2
                for i in range(min(b, cfg.eval_stage.num_vis - vis_saved)):
                    save_vis(vis_dir, step, vis_saved,
                             frames_h[i, t_mid], preds_h[i, t_mid],
                             masks_h[i, t_mid])
                    vis_saved += 1
    if acc is None:
        return {}
    return M.dice_finalize(acc)
