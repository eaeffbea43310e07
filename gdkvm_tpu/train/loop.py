"""Sharded training loop.

Replaces the reference's torchrun + hydra + DDP stack (reference:
website/src/pages/[lang]/reprod/index.astro:238-264) with a single SPMD
program: one jitted train step over a ('data','model') mesh.  The batch is
sharded over 'data'; gradient and metric reductions are XLA collectives
inserted automatically by GSPMD — there is no rendezvous port, no process
group, no NCCL (SURVEY.md §2.4).

Recipe parity keys (batch_size 8, lr 1e-4, 3000 iterations — reference:
reprod/index.astro:246-252) come straight from the config tree.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gdkvm_tpu.config.schema import Config, save_config
from gdkvm_tpu.data.pipeline import Batch, batch_iterator, make_dataset, \
    prefetch_to_device
from gdkvm_tpu.eval.evaluator import evaluate
from gdkvm_tpu.io.checkpoint import CheckpointManager
from gdkvm_tpu.io.metrics_log import MetricsLogger
from gdkvm_tpu.models.gdkvm import GDKVM, init_params
from gdkvm_tpu.parallel import batch_sharding, make_mesh, param_shardings, \
    replicated
from gdkvm_tpu.train import losses
from gdkvm_tpu.utils.profiling import StepTimer, maybe_profile, \
    trace_annotation


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    # Polyak/EMA shadow of params (None when train.ema_decay == 0, keeping
    # the checkpoint tree — and old checkpoints — unchanged).
    ema_params: Any = None


def eval_params(state: TrainState, cfg: Config):
    """Parameters to score: the EMA shadow when tracked and requested."""
    if state.ema_params is not None and cfg.eval_stage.use_ema:
        return state.ema_params
    return state.params


def normalize_frames(frames_u8: jax.Array) -> jax.Array:
    """uint8 → float32 in [0,1] on device (host ships uint8; 4× bandwidth)."""
    return frames_u8.astype(jnp.float32) * (1.0 / 255.0)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    # Schedule counts run in APPLIED optimizer updates: under gradient
    # accumulation optax.MultiSteps advances the inner step only once per
    # k micro-steps, so warmup/decay horizons are scaled by accum_steps —
    # otherwise a 3000-micro-step run would end ~1/k into the cosine.
    k = max(t.accum_steps, 1)
    total_updates = max(t.num_iterations // k, 1)
    warmup = max(min(t.warmup_iterations // k, total_updates // 2), 1)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=t.learning_rate,
        warmup_steps=warmup,
        # optax requires decay_steps > warmup_steps (total, not post-warmup).
        decay_steps=max(total_updates, warmup + 1),
        end_value=t.learning_rate * 0.05)
    tx = optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.adamw(schedule, weight_decay=t.weight_decay),
    )
    if t.accum_steps > 1:
        # Average grads over k micro-steps, apply one update (effective
        # batch = batch_size × accum_steps); replaces nothing in the
        # reference (its DDP recipe is single-step) but covers its
        # capability of scaling effective batch beyond device memory.
        tx = optax.MultiSteps(tx, every_k_schedule=t.accum_steps)
    return tx


def make_train_step(model: GDKVM, tx: optax.GradientTransformation,
                    cfg: Config, *, from_cache: bool = False, mesh=None):
    """Build the (jittable) train step: loss → grads → update → metrics.

    With ``from_cache`` the second argument is an HBM-resident
    DeviceDataset instead of a Batch: the batch is sampled + augmented on
    device inside the step (data/device_cache.py) — zero per-step host
    transfer.
    """
    t = cfg.train

    def fwd(params, frames, prompt_mask, prompt_w):
        return model.apply(params, frames, None, prompt_mask, prompt_w)

    if t.remat:
        # Rematerialize activations during backward: trades FLOPs for HBM
        # (long clips / large batches — SURVEY.md §0 HBM-bandwidth note).
        fwd = jax.checkpoint(fwd)

    def step_fn(state: TrainState, batch: Batch
                ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if from_cache:
            from gdkvm_tpu.data import device_cache as dc
            # data.seed participates (static fold): seed sweeps must vary
            # the batch stream on the cached path exactly as they do on
            # the host batch_iterator path.
            data_rng, prompt_rng = jax.random.split(
                jax.random.fold_in(
                    jax.random.fold_in(
                        jax.random.fold_in(state.rng, 17),
                        cfg.data.seed),
                    state.step))
            if isinstance(batch, dc.VideoDeviceCache):
                batch = dc.sample_video_batch(
                    batch, data_rng, t.batch_size, cfg.data.clip_len,
                    augment=cfg.data.augment,
                    occlude_prob=cfg.data.occlude_prob)
            else:
                batch = dc.sample_batch(batch, data_rng, t.batch_size,
                                        augment=cfg.data.augment,
                                        occlude_prob=cfg.data.occlude_prob)
            if mesh is not None and mesh.devices.size > 1:
                sh = batch_sharding(mesh)
                batch = Batch(
                    frames=jax.lax.with_sharding_constraint(
                        batch.frames, sh),
                    masks=jax.lax.with_sharding_constraint(batch.masks, sh),
                    valid=jax.lax.with_sharding_constraint(batch.valid, sh))
        else:
            _, prompt_rng = jax.random.split(
                jax.random.fold_in(state.rng, state.step))
        frames = normalize_frames(batch.frames)
        b = frames.shape[0]
        # Stochastic first-frame prompting: only where frame 0 has GT.
        use_prompt = jax.random.bernoulli(
            prompt_rng, t.prompt_prob, (b,)).astype(jnp.float32)
        prompt_w = use_prompt * batch.valid[:, 0]
        prompt_mask = batch.masks[:, 0].astype(jnp.int32)

        bweight = 1.0 if t.bootstrap_ratio >= 1.0 else \
            losses.bootstrap_schedule(state.step, t.num_iterations,
                                      t.bootstrap_start, t.bootstrap_end)

        def loss_fn(params):
            logits, _ = fwd(params, frames, prompt_mask, prompt_w)
            loss, aux = losses.segmentation_loss(
                logits, batch.masks.astype(jnp.int32), batch.valid,
                ce_weight=t.ce_weight, dice_weight=t.dice_weight,
                bootstrap_ratio=t.bootstrap_ratio,
                bootstrap_weight=bweight)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(aux)
        # Under accumulation this is the per-MICRO-step norm (the optimizer
        # applies the accumulated average); name it so grad_clip tuning
        # isn't misled.
        norm_key = "micro_grad_norm" if t.accum_steps > 1 else "grad_norm"
        metrics[norm_key] = optax.global_norm(grads)
        ema = state.ema_params
        if ema is not None:
            d = jnp.float32(t.ema_decay)
            if t.accum_steps > 1:
                # Only average on APPLIED updates: MultiSteps withholds
                # params for k-1 micro-steps, and decaying toward an
                # unchanged params would shrink the effective averaging
                # horizon by k.  mini_step wraps to 0 when it applies.
                applied = (opt_state.mini_step == 0).astype(jnp.float32)
                step_d = 1.0 - applied * (1.0 - d)
            else:
                step_d = d
            ema = jax.tree.map(lambda e, p: e + (1.0 - step_d) * (p - e),
                               ema, params)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=state.rng,
                               ema_params=ema)
        return new_state, metrics

    return step_fn


def abstract_train_state(cfg: Config, model: GDKVM,
                         tx: optax.GradientTransformation,
                         rng: jax.Array) -> TrainState:
    """Shape/dtype-only TrainState (jax.eval_shape) — the checkpoint
    restore template.  Never materializes params or touches the device:
    CLI tools that only restore were paying a full device init plus a
    whole-state device→host fetch for a template they threw away (on the
    tunneled dev setup that fetch can stall for minutes)."""
    return jax.eval_shape(lambda: create_train_state(cfg, model, tx, rng))


def create_train_state(cfg: Config, model: GDKVM,
                       tx: optax.GradientTransformation,
                       rng: jax.Array) -> TrainState:
    params = init_params(model, rng, cfg.data.image_size,
                         clip_len=2, batch=1)
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params) if cfg.train.ema_decay > 0 else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, rng=rng, ema_params=ema)


def train(cfg: Config, *, max_steps: Optional[int] = None,
          mesh=None) -> Dict[str, float]:
    """Full training run.  Returns final metrics (incl. last eval Dice)."""
    if cfg.runtime.jit_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          cfg.runtime.jit_cache_dir)

    if cfg.runtime.debug_nans:
        # Sanitizer mode: fail loudly at the first NaN-producing op
        # (SURVEY §5 race-detection/sanitizer tier).  Slower; debug only.
        jax.config.update("jax_debug_nans", True)

    run_dir = cfg.runtime.run_dir
    os.makedirs(run_dir, exist_ok=True)
    save_config(cfg, os.path.join(run_dir, "config.yaml"))
    logger = MetricsLogger(run_dir, wandb_mode=cfg.eval_stage.wandb_mode)

    if mesh is None:
        mesh = make_mesh(cfg.parallel.data_axis, cfg.parallel.model_axis)
    # Training resolution of gdr_impl='auto' by memory-token count (see
    # models.gdkvm.train_model_config: stored-solve Pallas path at 256²
    # scale, XLA chunked at EchoNet scale).
    from gdkvm_tpu.models.gdkvm import train_model_config
    model = GDKVM(cfg=train_model_config(cfg.model, cfg.data.image_size))
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)

    state = create_train_state(cfg, model, tx, rng)
    # Lay out params/opt over the mesh (replicated unless model_axis > 1).
    p_shard = param_shardings(mesh, state.params)
    state = TrainState(
        step=jax.device_put(state.step, replicated(mesh)),
        params=jax.device_put(state.params, p_shard),
        opt_state=jax.device_put(
            state.opt_state,
            jax.tree.map(lambda _: replicated(mesh), state.opt_state,
                         is_leaf=lambda x: isinstance(x, jnp.ndarray))),
        rng=jax.device_put(state.rng, replicated(mesh)),
        ema_params=(None if state.ema_params is None
                    else jax.device_put(state.ema_params, p_shard)),
    )

    ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    start_step = 0
    if cfg.runtime.resume:
        latest = ckpt.latest_step()
        if latest is not None:
            state = ckpt.restore(state)
            start_step = int(jax.device_get(state.step))

    dataset = make_dataset(cfg.data, cfg.data.train_split,
                           cfg.model.num_classes)
    from gdkvm_tpu.data import device_cache as dc
    cache_mode = dc.resolve_cache_mode(cfg.data, dataset)
    if cache_mode != "off":
        # One bulk upload; batches are sampled+augmented inside the step.
        if cache_mode == "video":
            cache = dc.build_video_cache(
                dataset, cfg.data.clip_len, replicated(mesh),
                max_bytes=cfg.data.device_cache_max_mb * 2**20)
            if cache is None:         # true padded size over budget
                cache_mode = "off"
        else:
            cache = dc.build_device_cache(dataset, replicated(mesh))
    if cache_mode != "off":
        train_step = jax.jit(
            make_train_step(model, tx, cfg, from_cache=True, mesh=mesh),
            donate_argnums=0)
        it = None
    else:
        train_step = jax.jit(make_train_step(model, tx, cfg),
                             donate_argnums=0)
        it = batch_iterator(dataset, cfg.train.batch_size, shuffle=True,
                            augment=cfg.data.augment,
                            occlude_prob=cfg.data.occlude_prob,
                            seed=cfg.data.seed,
                            num_workers=cfg.data.num_workers,
                            start_step=start_step)
        it = prefetch_to_device(it, size=cfg.data.prefetch,
                                sharding=batch_sharding(mesh))

    total = max_steps if max_steps is not None else cfg.train.num_iterations
    last_eval: Dict[str, float] = {}
    final_metrics: Dict[str, float] = {}
    timer = StepTimer(skip=1)           # exclude the compile step
    trace_dir = os.path.join(run_dir, "trace") if cfg.runtime.profile \
        else None

    with mesh, maybe_profile(trace_dir):
        for step_idx in range(start_step, total):
            batch = cache if it is None else next(it)
            with trace_annotation("train_step"):
                state, metrics = train_step(state, batch)
            timer.lap(metrics["loss"])

            if (step_idx + 1) % cfg.train.log_every == 0 or step_idx == 0:
                metrics = jax.device_get(metrics)
                metrics.update(timer.stats())
                if "steps_per_sec" in metrics:
                    metrics["frames_per_sec"] = (
                        metrics["steps_per_sec"] * cfg.train.batch_size
                        * cfg.data.clip_len)
                logger.log(step_idx + 1, metrics)
                final_metrics = {k: float(v) for k, v in metrics.items()}
                timer.reset_window()

            if (step_idx + 1) % cfg.train.eval_every == 0 or \
                    step_idx + 1 == total:
                with trace_annotation("eval_stage"):
                    last_eval = evaluate(cfg, model, eval_params(state, cfg),
                                         mesh, step=step_idx + 1)
                logger.log(step_idx + 1, {f"eval/{k}": v
                                          for k, v in last_eval.items()})
                timer.reset_window()

            if (step_idx + 1) % cfg.train.checkpoint_every == 0 or \
                    step_idx + 1 == total:
                ckpt.save(step_idx + 1, jax.device_get(state))
                timer.reset_window()

    ckpt.wait()
    ckpt.close()
    logger.close()
    final_metrics.update({f"eval/{k}": v for k, v in last_eval.items()})
    return final_metrics
