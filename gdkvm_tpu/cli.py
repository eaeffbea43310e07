"""Command-line interface: gdkvm train / eval / bench.

Replaces the reference's ``./train.sh`` + hydra entry (reference:
website/src/pages/[lang]/reprod/index.astro:259-264): same config keys, same
override ergonomics (``key=value`` dotted paths), no launcher — SPMD means
one process drives every chip.
"""

from __future__ import annotations

import argparse
import json
import sys


def _split_args(argv):
    """Separate flag args from key=value overrides."""
    flags, overrides = [], []
    for a in argv:
        (overrides if ("=" in a and not a.startswith("-")) else flags).append(a)
    return flags, overrides


def cmd_train(argv) -> int:
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.parallel.distributed import maybe_initialize_distributed
    from gdkvm_tpu.train.loop import train
    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm train")
    p.add_argument("--config", default=None, help="YAML config path")
    args = p.parse_args(flags)
    maybe_initialize_distributed()      # no-op unless a pod env is set
    cfg = load_config(args.config, overrides)
    metrics = train(cfg)
    print(json.dumps({"final": metrics}))
    return 0


def cmd_eval(argv) -> int:
    import jax
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.eval.evaluator import evaluate
    from gdkvm_tpu.io.checkpoint import CheckpointManager
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params
    from gdkvm_tpu.parallel import make_mesh
    from gdkvm_tpu.train.loop import abstract_train_state, make_optimizer
    import os

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm eval")
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (defaults to <run_dir>/checkpoints)")
    args = p.parse_args(flags)
    cfg = load_config(args.config, overrides)

    mesh = make_mesh(cfg.parallel.data_axis, cfg.parallel.model_axis)
    model = GDKVM(cfg=cfg.model)
    # Abstract (shape-only) restore template: no device init, no fetch.
    tpl = abstract_train_state(cfg, model, make_optimizer(cfg),
                               jax.random.PRNGKey(0))
    ckpt_dir = args.checkpoint or os.path.join(cfg.runtime.run_dir,
                                               "checkpoints")
    ckpt = CheckpointManager(ckpt_dir)
    state = ckpt.restore(tpl)
    from gdkvm_tpu.train.loop import eval_params
    params = jax.device_put(eval_params(state, cfg))  # pin host tree once
    metrics = evaluate(cfg, model, params, mesh, step=int(state.step))
    print(json.dumps(metrics))
    return 0


def cmd_bench(argv) -> int:
    import jax
    import numpy as np
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.eval.throughput import measure_streaming_fps, \
        measure_train_step_time
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm bench")
    p.add_argument("--config", default=None)
    p.add_argument("--mode", choices=("stream", "train", "latency",
                                      "modules", "all"),
                   default="stream")
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--image-size", type=int, default=112)
    p.add_argument("--grad", action="store_true",
                   help="modules mode: fwd+bwd (train-step) breakdown "
                        "using the training-trace model config")
    p.add_argument("--out", default="bench_all.json",
                   help="all mode: consolidated artifact path")
    p.add_argument("--smoke", action="store_true",
                   help="all mode: tiny shapes/model (CI contract run)")
    args = p.parse_args(flags)

    if args.mode == "all":
        # --mode all measures FIXED canonical shapes (that is the point of
        # a regression artifact); silently ignoring shape/config overrides
        # would let automation believe it benchmarked something it didn't.
        unused = [flag for flag, passed in (
            ("--config", args.config is not None),
            ("--chunk", args.chunk != 16), ("--batch", args.batch != 1),
            ("--image-size", args.image_size != 112),
            ("--grad", args.grad)) if passed]
        if overrides:
            unused.append("dotted config overrides")
        if unused:
            p.error(f"--mode all ignores {', '.join(unused)}: the "
                    f"artifact's shapes are fixed by the schema "
                    f"(eval/regression.py)")
        from gdkvm_tpu.eval.regression import bench_all, failed_sections, \
            validate_artifact, write_artifact
        artifact = bench_all(smoke=args.smoke)
        validate_artifact(artifact)
        write_artifact(artifact, args.out)
        print(json.dumps(artifact))
        failed = failed_sections(artifact)
        if failed and not args.smoke:
            # Fault isolation keeps one broken section from killing the
            # artifact, but a bench where sections ERRORED must not read
            # as success to automation (exit code is the contract).
            print(f"bench --mode all: {len(failed)} section(s) errored: "
                  f"{', '.join(failed)}", file=sys.stderr)
            return 1
        return 0

    cfg = load_config(args.config, overrides)
    model = GDKVM(cfg=cfg.model)
    if args.mode == "modules" and args.grad:
        from gdkvm_tpu.eval.modulebench import grad_breakdown
        from gdkvm_tpu.models.gdkvm import train_model_config
        from gdkvm_tpu.train.loop import make_optimizer
        model = GDKVM(cfg=train_model_config(cfg.model, args.image_size))
        params = init_params(model, jax.random.PRNGKey(0), args.image_size)
        result = grad_breakdown(model, params, image_size=args.image_size,
                                chunk=args.chunk, batch=args.batch,
                                tx=make_optimizer(cfg))
    elif args.mode == "modules":
        from gdkvm_tpu.eval.modulebench import module_breakdown
        params = init_params(model, jax.random.PRNGKey(0), args.image_size)
        result = module_breakdown(model, params,
                                  image_size=args.image_size,
                                  chunk=args.chunk, batch=args.batch)
    elif args.mode == "latency":
        from gdkvm_tpu.eval.throughput import measure_streaming_latency
        params = init_params(model, jax.random.PRNGKey(0), args.image_size)
        result = measure_streaming_latency(
            model, params, image_size=args.image_size, chunk=args.chunk,
            batch=args.batch)
    elif args.mode == "train":
        from gdkvm_tpu.data.pipeline import Batch
        from gdkvm_tpu.models.gdkvm import train_model_config
        from gdkvm_tpu.train.loop import create_train_state, \
            make_optimizer, make_train_step
        cfg.data.image_size = args.image_size
        model = GDKVM(cfg=train_model_config(cfg.model, args.image_size))
        tx = make_optimizer(cfg)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0))
        b, t = cfg.train.batch_size, cfg.data.clip_len
        rng = np.random.default_rng(0)
        batch = Batch(
            frames=rng.integers(0, 255, (b, t, args.image_size,
                                         args.image_size, 1), np.uint8),
            masks=rng.integers(0, cfg.model.num_classes,
                               (b, t, args.image_size, args.image_size)
                               ).astype(np.uint8),
            valid=np.ones((b, t), np.float32))
        step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=0)
        result = measure_train_step_time(step, state,
                                         jax.device_put(batch))
        result["train_frames_per_sec"] = result["steps_per_sec"] * b * t
        result["batch_size"] = b
        result["clip_len"] = t
        result["image_size"] = args.image_size
    else:
        params = init_params(model, jax.random.PRNGKey(0), args.image_size)
        result = measure_streaming_fps(
            model, params, image_size=args.image_size,
            chunk=args.chunk, batch=args.batch)
    print(json.dumps(result))
    return 0


def cmd_stream_eval(argv) -> int:
    """Full-sequence streaming eval (Dice + fps) with chunked recurrence."""
    import os
    import jax
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.eval.streaming import stream_evaluate
    from gdkvm_tpu.io.checkpoint import CheckpointManager
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params
    from gdkvm_tpu.train.loop import abstract_train_state, make_optimizer

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm stream-eval")
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num-videos", type=int, default=8)
    p.add_argument("--video-len", type=int, default=128)
    p.add_argument("--reset-state", action="store_true",
                   help="ablation: zero the memory between chunks")
    p.add_argument("--occlude", action="store_true",
                   help="robustness probe: blank an LV-covering region "
                        "around the last traced frame")
    p.add_argument("--streams", type=int, default=None,
                   help="videos in flight as one batched recurrence "
                        "(serving mode; default eval_stage.streams)")
    p.add_argument("--consistency", action="store_true",
                   help="also report temporal prediction stability "
                        "(fg IoU between consecutive frames, flicker "
                        "rate; single-stream mode only)")
    p.add_argument("--quant-scales", default=None,
                   help="W8A8 scales JSON from `gdkvm quant` — evaluate "
                        "the quantized serving path")
    args = p.parse_args(flags)
    cfg = load_config(args.config, overrides)

    model = GDKVM(cfg=cfg.model)
    ckpt_dir = args.checkpoint or os.path.join(cfg.runtime.run_dir,
                                               "checkpoints")
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        tpl = abstract_train_state(cfg, model, make_optimizer(cfg),
                                   jax.random.PRNGKey(0))
        state = CheckpointManager(ckpt_dir).restore(tpl)
        from gdkvm_tpu.train.loop import eval_params
        # Restored trees are host numpy: pin to device once, or every
        # dispatch re-transfers the whole param tree.
        params = jax.device_put(eval_params(state, cfg))
    else:
        params = init_params(model, jax.random.PRNGKey(0),
                             cfg.data.image_size)
    if args.quant_scales:
        from gdkvm_tpu.ops import quant as _Q
        model = _Q.w8a8_model(model, _Q.load_scales(args.quant_scales))
    out = stream_evaluate(cfg, model, params, num_videos=args.num_videos,
                          video_len=args.video_len,
                          reset_state=args.reset_state,
                          occlude=args.occlude,
                          streams=args.streams if args.streams is not None
                          else cfg.eval_stage.streams,
                          consistency=args.consistency)
    print(json.dumps(out))
    return 0


def cmd_quant(argv) -> int:
    """Calibrate W8A8 activation scales for quantized serving
    (ops/quant.py), optionally with a measured quality check.

    v5e's MXU runs int8 at 2× the bf16 rate; the quantized path pays a
    requant pass per conv.  Encoder-scope measures 1.07-1.10× at every
    shipped serving shape on both arms (BASELINE.md r5.1), but the win is
    shape- and model-dependent — hence calibrate + CHECK, never
    blind-enable.
    """
    import os
    import numpy as np
    import jax
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.io.checkpoint import CheckpointManager
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params
    from gdkvm_tpu.ops import quant as Q

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm quant")
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default=None,
                   help="scales JSON (default <run_dir>/quant_scales.json)")
    p.add_argument("--scope", default="encoder",
                   choices=["encoder", "decoder", "all"],
                   help="which convs to calibrate (encoder = the "
                        "measured-win region)")
    p.add_argument("--calib-clips", type=int, default=4)
    p.add_argument("--method", default="absmax",
                   choices=["absmax", "percentile"],
                   help="activation-range statistic: absmax (exact) or "
                        "percentile (robust to speckle outliers)")
    p.add_argument("--percentile", type=float, default=99.9,
                   help="percentile of |x| when --method percentile")
    p.add_argument("--check", action="store_true",
                   help="run streaming eval full-precision vs w8a8 and "
                        "report the Dice delta + throughput both ways")
    p.add_argument("--num-videos", type=int, default=4)
    p.add_argument("--video-len", type=int, default=64)
    args = p.parse_args(flags)
    cfg = load_config(args.config, overrides)

    model = GDKVM(cfg=cfg.model)
    ckpt_dir = args.checkpoint or os.path.join(cfg.runtime.run_dir,
                                               "checkpoints")
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        from gdkvm_tpu.train.loop import abstract_train_state, \
            eval_params, make_optimizer
        tpl = abstract_train_state(cfg, model, make_optimizer(cfg),
                                   jax.random.PRNGKey(0))
        state = CheckpointManager(ckpt_dir).restore(tpl)
        params = jax.device_put(eval_params(state, cfg))
    else:
        print("warning: no checkpoint — calibrating an UNTRAINED init",
              file=sys.stderr)
        params = init_params(model, jax.random.PRNGKey(0),
                             cfg.data.image_size)

    # Calibration clips: the configured dataset's inference distribution —
    # real val clips when the dataset is mounted, else the synthetic
    # generator (the same source stream_evaluate falls back to).
    s, k = cfg.data.image_size, cfg.model.num_classes
    batches = []
    if cfg.data.dataset != "synthetic":
        try:
            from gdkvm_tpu.data.pipeline import make_dataset
            ds = make_dataset(cfg.data, cfg.data.val_split, k)
            for i in range(min(args.calib_clips, len(ds))):
                frames = ds[i][0]                      # (T,H,W,1) uint8
                batches.append(frames[None].astype(np.float32) / 255.0)
        except Exception as exc:
            print(f"warning: {cfg.data.dataset} calibration clips "
                  f"unavailable ({exc}); falling back to synthetic",
                  file=sys.stderr)
    if not batches:
        from gdkvm_tpu.data import synthetic as _synth
        for i in range(args.calib_clips):
            f, _ = _synth.generate_video(7000 + i, cfg.data.clip_len, s, s,
                                         k, cfg.data.synth_difficulty)
            batches.append(f[None].astype(np.float32) / 255.0)

    scales = Q.calibrate_act_scales(model, params, batches,
                                    scope=args.scope, method=args.method,
                                    percentile=args.percentile)
    out_path = args.out or os.path.join(cfg.runtime.run_dir,
                                        "quant_scales.json")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    Q.save_scales(out_path, scales)
    result = {"scales": out_path, "n_convs": len(scales),
              "scope": args.scope, "method": args.method}

    if args.check:
        from gdkvm_tpu.eval.streaming import stream_evaluate
        qmodel = Q.w8a8_model(model, scales)
        fp = stream_evaluate(cfg, model, params,
                             num_videos=args.num_videos,
                             video_len=args.video_len,
                             streams=cfg.eval_stage.streams)
        q8 = stream_evaluate(cfg, qmodel, params,
                             num_videos=args.num_videos,
                             video_len=args.video_len,
                             streams=cfg.eval_stage.streams)
        result["check"] = {
            "dice_fg_fp": fp.get("dice_fg_mean"),
            "dice_fg_w8a8": q8.get("dice_fg_mean"),
            "dice_fg_delta": (None if "dice_fg_mean" not in fp else
                              q8["dice_fg_mean"] - fp["dice_fg_mean"]),
            "fps_fp": fp.get("stream_frames_per_sec"),
            "fps_w8a8": q8.get("stream_frames_per_sec"),
        }
    print(json.dumps(result))
    return 0


def cmd_scale(argv) -> int:
    """Predictable-Scale calculator (reference tool-page capability)."""
    from gdkvm_tpu.utils.scaling import optimal_bs_lr
    p = argparse.ArgumentParser(prog="gdkvm scale")
    p.add_argument("-N", "--model-params", required=True,
                   help="model size, e.g. 1e8 or 3.5x10^6")
    p.add_argument("-D", "--tokens", required=True,
                   help="training tokens, e.g. 2e10")
    args = p.parse_args(argv)
    try:
        out = optimal_bs_lr(args.model_params, args.tokens)
    except ValueError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    print(json.dumps(out))
    return 0


def cmd_pack(argv) -> int:
    """Convert a clip dataset into the packed (PCK) decode-once format."""
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.data.packed import write_pck
    from gdkvm_tpu.data.pipeline import make_dataset
    import os

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm pack")
    p.add_argument("--config", default=None)
    p.add_argument("--out", required=True, help="output directory for "
                   "<split>.pck files")
    p.add_argument("--splits", default="train,val")
    args = p.parse_args(flags)
    cfg = load_config(args.config, overrides)
    os.makedirs(args.out, exist_ok=True)
    written = {}
    for split in args.splits.split(","):
        ds = make_dataset(cfg.data, split, cfg.model.num_classes)
        path = os.path.join(args.out, f"{split}.pck")
        write_pck(path, ds)
        written[split] = {"path": path, "clips": len(ds),
                          "bytes": os.path.getsize(path)}
    print(json.dumps(written))
    return 0


def cmd_info(argv) -> int:
    """Environment/config diagnostics: platform, devices, versions, and
    the fully-resolved config for a given YAML + overrides."""
    import importlib

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm info")
    p.add_argument("--config", default=None)
    p.add_argument("--probe", action="store_true",
                   help="also run a tiny device round trip (latency ms)")
    args = p.parse_args(flags)

    import gdkvm_tpu
    out = {"gdkvm_tpu": gdkvm_tpu.__version__}
    for mod in ("jax", "flax", "optax", "numpy"):
        try:
            out[mod] = importlib.import_module(mod).__version__
        except Exception:
            out[mod] = None
    import jax
    try:
        devs = jax.devices()
        out["platform"] = devs[0].platform
        out["devices"] = [str(d) for d in devs]
    except Exception as exc:                     # backend init failure
        out["platform"] = f"error: {exc}"
        out["devices"] = []
    out["jit_cache_dir"] = jax.config.jax_compilation_cache_dir
    from gdkvm_tpu.data.packed import _load_native
    out["pck_native_loader"] = _load_native() is not None
    if args.probe and out["devices"]:
        import time
        import jax.numpy as jnp
        x = jax.device_put(jnp.arange(8, dtype=jnp.float32))
        x.block_until_ready()
        t0 = time.perf_counter()
        jax.device_get(x)
        out["device_roundtrip_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 2)
    if args.config or overrides:
        from gdkvm_tpu.config.schema import load_config
        import dataclasses
        cfg = load_config(args.config, overrides)
        out["config"] = dataclasses.asdict(cfg)
    print(json.dumps(out, default=str))
    return 0


def cmd_sweep(argv) -> int:
    """Hydra-multirun equivalent: run the cartesian product of swept
    overrides sequentially, one run dir per combination, and summarize.

    Swept values use hydra's multirun syntax — a comma list in the
    override value: ``gdkvm sweep --config c.yaml learning_rate=1e-4,3e-4
    batch_size=4,8`` runs 4 trainings under <run_dir>/sweep/<combo>/ and
    prints a ranked summary (by eval/dice_fg_mean, then loss).

    Bracketed values are NEVER swept: pass tuple-typed config fields as
    ``model.enc_channels=[16,32,48,64]`` to pin them while sweeping other
    keys.  A combo that raises is recorded with an ``error`` field and the
    sweep continues (multirun semantics).
    """
    import itertools
    import os
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.train.loop import train

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm sweep")
    p.add_argument("--config", default=None)
    p.add_argument("--metric", default="eval/dice_fg_mean",
                   help="ranking metric from the final metrics "
                        "(higher better unless it contains 'loss')")
    args = p.parse_args(flags)

    fixed, swept = [], []
    for ov in overrides:
        key, _, val = ov.partition("=")
        if "," in val and not val.startswith("["):
            swept.append((key, val.split(",")))
        else:
            fixed.append(ov)
    if not swept:
        print("error: no swept overrides (use key=v1,v2,...)",
              file=sys.stderr)
        return 2

    base_cfg = load_config(args.config, fixed)
    base_dir = os.path.join(base_cfg.runtime.run_dir, "sweep")
    results = []
    combos = list(itertools.product(*(vals for _, vals in swept)))
    for ci, combo in enumerate(combos):
        combo_ovs = [f"{key}={val}"
                     for (key, _), val in zip(swept, combo)]
        # Index prefix guarantees unique run dirs even when joined values
        # collide; key names keep the tag readable.
        tag = f"{ci:02d}_" + "_".join(
            f"{key.rsplit('.', 1)[-1]}-{v.replace('/', '-')}"
            for (key, _), v in zip(swept, combo))
        run_dir = os.path.join(base_dir, tag)
        cfg = load_config(args.config,
                          fixed + combo_ovs + [f"runtime.run_dir={run_dir}"])
        try:
            metrics = train(cfg)
        except Exception as exc:     # a diverged combo must not kill the grid
            row = {"overrides": combo_ovs, "run_dir": run_dir,
                   "error": f"{type(exc).__name__}: {exc}"}
            results.append(row)
            print(json.dumps(row), flush=True)
            continue
        row = {"overrides": combo_ovs, "run_dir": run_dir, **{
            k: v for k, v in metrics.items()
            if isinstance(v, (int, float))}}
        results.append(row)
        print(json.dumps(row), flush=True)

    import math
    m = args.metric
    lower_better = "loss" in m
    scored = [r for r in results
              if m in r and not math.isnan(r[m])]
    scored.sort(key=lambda r: r[m], reverse=not lower_better)
    print(json.dumps({"sweep_best": scored[0] if scored else None,
                      "metric": m, "runs": len(results)}))
    return 0


def cmd_infer(argv) -> int:
    """Run a trained model (or exported artifact) on a cine file: AVI/MP4,
    raw CAMUS .mhd, or a directory of PNG frames → masks.npz + overlays."""
    import os
    import jax
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.eval.infer import load_frames, run_inference

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm infer")
    p.add_argument("--config", default=None)
    p.add_argument("--input", required=True,
                   help=".avi/.mp4, .mhd, or a directory of PNG frames")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (defaults to <run_dir>/checkpoints)")
    p.add_argument("--artifact", default=None,
                   help="exported StableHLO artifact dir (replaces "
                        "checkpoint+model)")
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--overlay-every", type=int, default=0,
                   help="write an overlay PNG every N frames (0 = none)")
    p.add_argument("--device-resize", action="store_true",
                   help="decode at native resolution and resize on device "
                        "inside the jitted step (fused matmul preproc) — "
                        "host work becomes decode-only")
    args = p.parse_args(flags)
    cfg = load_config(args.config, overrides)

    if args.artifact:
        # Decode at the size the artifact was exported for, not the
        # config's — the exported program has a fixed input signature.
        from gdkvm_tpu.eval.infer import artifact_image_size
        frames = load_frames(args.input, artifact_image_size(args.artifact))
        summary = run_inference(frames, args.out, artifact=args.artifact,
                                overlay_every=args.overlay_every)
    else:
        from gdkvm_tpu.io.checkpoint import CheckpointManager
        from gdkvm_tpu.models.gdkvm import GDKVM, init_params
        from gdkvm_tpu.train.loop import abstract_train_state, \
            eval_params, make_optimizer
        frames = load_frames(args.input, cfg.data.image_size,
                             host_resize=not args.device_resize)
        model = GDKVM(cfg=cfg.model)
        ckpt_dir = args.checkpoint or os.path.join(cfg.runtime.run_dir,
                                                   "checkpoints")
        if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
            tpl = abstract_train_state(cfg, model, make_optimizer(cfg),
                                       jax.random.PRNGKey(0))
            state = CheckpointManager(ckpt_dir).restore(tpl)
            params = jax.device_put(eval_params(state, cfg))
        else:
            params = init_params(model, jax.random.PRNGKey(0),
                                 cfg.data.image_size)
        summary = run_inference(frames, args.out, model=model,
                                params=params, chunk=args.chunk,
                                overlay_every=args.overlay_every,
                                model_size=(cfg.data.image_size
                                            if args.device_resize else None))
    print(json.dumps(summary))
    return 0


def cmd_export(argv) -> int:
    """Export a trained model as a self-contained StableHLO serving
    artifact (frames-in → logits+state-out, params baked in)."""
    import os
    import jax
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.io.checkpoint import CheckpointManager
    from gdkvm_tpu.io.export import save_artifact
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params
    from gdkvm_tpu.train.loop import abstract_train_state, eval_params, \
        make_optimizer

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm export")
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (defaults to <run_dir>/checkpoints; "
                        "untrained init if absent)")
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--image-size", type=int, default=None,
                   help="default: data.image_size")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. tpu,cpu (needs gdr_impl=chunked)")
    p.add_argument("--quant-scales", default=None,
                   help="W8A8 scales JSON from `gdkvm quant` — bake the "
                        "quantized conv path into the artifact")
    args = p.parse_args(flags)
    cfg = load_config(args.config, overrides)

    model = GDKVM(cfg=cfg.model)
    ckpt_dir = args.checkpoint or os.path.join(cfg.runtime.run_dir,
                                               "checkpoints")
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        tpl = abstract_train_state(cfg, model, make_optimizer(cfg),
                                   jax.random.PRNGKey(0))
        state = CheckpointManager(ckpt_dir).restore(tpl)
        params = eval_params(state, cfg)
    else:
        params = init_params(model, jax.random.PRNGKey(0),
                             cfg.data.image_size)
    if args.quant_scales:
        from gdkvm_tpu.ops import quant as _Q
        model = _Q.w8a8_model(model, _Q.load_scales(args.quant_scales))
    platforms = args.platforms.split(",") if args.platforms else None
    meta = save_artifact(args.out, model, params,
                         image_size=args.image_size or cfg.data.image_size,
                         chunk=args.chunk, batch=args.batch,
                         platforms=platforms)
    print(json.dumps({"out": args.out, "blob_bytes": meta["blob_bytes"],
                      "platforms": meta["platforms"],
                      "signature": meta["signature"]}))
    return 0


def cmd_serve_check(argv) -> int:
    """Load an exported artifact and run a random chunk through it."""
    import time
    import numpy as np
    import jax
    from gdkvm_tpu.io.export import load_artifact

    p = argparse.ArgumentParser(prog="gdkvm serve-check")
    p.add_argument("--artifact", required=True)
    p.add_argument("--chunks", type=int, default=4)
    args = p.parse_args(argv)
    sm = load_artifact(args.artifact)
    sig = sm.meta["signature"]
    rng = np.random.default_rng(0)
    # Stage once explicitly (CLAUDE.md rule 8: never let jit upload numpy).
    frames = jax.device_put(
        rng.integers(0, 255, sig["frames_u8"], np.uint8))
    mem, seen = sm.init_state()
    logits = None
    t0 = time.perf_counter()
    for _ in range(args.chunks):
        logits, mem, seen = sm.step(frames, mem, seen)
    jax.device_get(seen)
    dt = time.perf_counter() - t0
    n_frames = args.chunks * sig["frames_u8"][0] * sig["frames_u8"][1]
    print(json.dumps({
        "ok": bool(np.isfinite(jax.device_get(logits)).all()),
        "logits_shape": list(logits.shape),
        "frames_seen": jax.device_get(seen).tolist(),
        "frames_per_sec_incl_compile": round(n_frames / dt, 1),
    }))
    return 0


def cmd_serve(argv) -> int:
    """Run the multi-stream streaming-segmentation HTTP server
    (gdkvm_tpu/serve.py: session per stream, GDR state held server-side,
    one jitted multi-stream step per tick)."""
    import os
    import jax
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.serve import BatchingEngine, make_server

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm serve")
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--artifact", default=None,
                   help="exported StableHLO artifact dir (must match "
                        "--streams/--chunk)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8477)
    p.add_argument("--streams", type=int, default=None,
                   help="stream slots (default eval_stage.streams)")
    p.add_argument("--chunk", type=int, default=None,
                   help="frames per device call (default "
                        "eval_stage.stream_chunk)")
    p.add_argument("--max-inflight-mb", type=float, default=256.0,
                   help="in-flight request byte budget; beyond it infer "
                        "returns HTTP 429 instead of queueing")
    p.add_argument("--session-ttl", type=float, default=300.0,
                   help="idle-session GC: reclaim a slot whose client "
                        "has been silent this many seconds (0 disables)")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the constructor warmup tick (first request "
                        "then pays the jit compile)")
    p.add_argument("--no-pack", action="store_true",
                   help="disable bit-packed mask fetch (debugging)")
    p.add_argument("--quant-scales", default=None,
                   help="W8A8 scales JSON from `gdkvm quant` — serve the "
                        "quantized conv path (checkpoint path only)")
    p.add_argument("--mesh", default=None,
                   help="shard the slot pool over a device mesh: 'auto' "
                        "(config parallel.{data_axis,model_axis}) or "
                        "'DxM' e.g. 4x1; streams must divide by D "
                        "(checkpoint path only)")
    args = p.parse_args(flags)
    cfg = load_config(args.config, overrides)
    streams = args.streams or max(cfg.eval_stage.streams, 1)
    chunk = args.chunk or cfg.eval_stage.stream_chunk
    ekw = dict(max_inflight_mb=args.max_inflight_mb,
               warmup=not args.no_warmup, pack_masks=not args.no_pack,
               session_ttl=args.session_ttl or None)

    mesh = None
    if args.mesh:
        from gdkvm_tpu.parallel import make_mesh
        if args.mesh == "auto":
            mesh = make_mesh(cfg.parallel.data_axis, cfg.parallel.model_axis)
        else:
            try:
                d, m = (int(x) for x in args.mesh.lower().split("x"))
            except ValueError:
                print(f"error: --mesh must be 'auto' or 'DxM', got "
                      f"{args.mesh!r}", file=sys.stderr)
                return 2
            mesh = make_mesh(d, m)
        ekw["mesh"] = mesh

    if args.artifact:
        if args.quant_scales or mesh is not None:
            print("error: --quant-scales/--mesh apply to the checkpoint "
                  "path; artifacts are already-lowered programs",
                  file=sys.stderr)
            return 2
        engine = BatchingEngine(artifact=args.artifact, streams=streams,
                                chunk=chunk, **ekw)
    else:
        from gdkvm_tpu.io.checkpoint import CheckpointManager
        from gdkvm_tpu.models.gdkvm import GDKVM, init_params
        from gdkvm_tpu.train.loop import abstract_train_state, \
            eval_params, make_optimizer
        model = GDKVM(cfg=cfg.model)
        ckpt_dir = args.checkpoint or os.path.join(cfg.runtime.run_dir,
                                                   "checkpoints")
        if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
            tpl = abstract_train_state(cfg, model, make_optimizer(cfg),
                                       jax.random.PRNGKey(0))
            state = CheckpointManager(ckpt_dir).restore(tpl)
            params = jax.device_put(eval_params(state, cfg))
        else:
            print("warning: no checkpoint — serving an UNTRAINED init",
                  file=sys.stderr)
            params = init_params(model, jax.random.PRNGKey(0),
                                 cfg.data.image_size)
        if args.quant_scales:
            from gdkvm_tpu.ops import quant as _Q
            model = _Q.w8a8_model(model, _Q.load_scales(args.quant_scales))
        engine = BatchingEngine(model=model, params=params, streams=streams,
                                chunk=chunk, image_size=cfg.data.image_size,
                                **ekw)

    srv = make_server(engine, args.host, args.port)
    print(json.dumps({"serving": True,
                      "host": srv.server_address[0],
                      "port": srv.server_address[1],
                      "streams": engine.streams, "chunk": engine.chunk,
                      "image_size": engine.image_size}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.close()
    return 0


def cmd_serve_bench(argv) -> int:
    """Client-side latency/throughput probe against a running gdkvm serve:
    opens N concurrent sessions, streams synthetic videos, reports
    submit→mask latency percentiles per chunk and aggregate frames/sec."""
    import threading
    import time
    import numpy as np
    from gdkvm_tpu.serve import ServeClient

    p = argparse.ArgumentParser(prog="gdkvm serve-bench")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8477)
    p.add_argument("--sessions", type=int, default=4)
    p.add_argument("--frames", type=int, default=256,
                   help="frames streamed per session")
    p.add_argument("--frames-per-request", type=int, default=None,
                   help="frames per HTTP request (default: one chunk — "
                        "the live-scanner pattern; larger requests are "
                        "split server-side and PIPELINE across ticks, "
                        "the offline/cine-upload pattern)")
    args = p.parse_args(argv)

    probe = ServeClient(args.host, args.port)
    info = probe.health()
    chunk, size = info["chunk"], info["image_size"]
    req_frames = args.frames_per_request or chunk
    lat_lock = threading.Lock()
    lats, errors = [], []

    def run_session(i):
        rng = np.random.default_rng(i)
        # Pre-generate the test chunks OUTSIDE the timed loop — per-chunk
        # rng synthesis is probe cost, not serving cost, and everything
        # shares one core on the dev container.
        n_reqs = (args.frames + req_frames - 1) // req_frames
        videos = [rng.integers(0, 255, (req_frames, size, size, 1),
                               np.uint8) for _ in range(min(n_reqs, 8))]
        try:
            c = ServeClient(args.host, args.port)
            c.open()
            done = 0
            j = 0
            while done < args.frames:
                t0 = time.perf_counter()
                masks = c.infer(videos[j % len(videos)])
                dt = time.perf_counter() - t0
                assert masks.shape == (req_frames, size, size)
                with lat_lock:
                    lats.append(dt)
                done += req_frames
                j += 1
            c.close()
        except Exception as exc:
            with lat_lock:
                errors.append(f"{type(exc).__name__}: {exc}")

    threads = [threading.Thread(target=run_session, args=(i,))
               for i in range(args.sessions)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        print(json.dumps({"ok": False, "errors": errors[:3]}))
        return 1
    ms = np.array(lats) * 1e3
    total_frames = args.sessions * args.frames
    print(json.dumps({
        "ok": True,
        "sessions": args.sessions,
        "chunk": chunk,
        "frames_per_request": req_frames,
        "frames_total": total_frames,
        "frames_per_sec": round(total_frames / wall, 1),
        "request_latency_ms_p50": round(float(np.percentile(ms, 50)), 2),
        "request_latency_ms_p95": round(float(np.percentile(ms, 95)), 2),
        "request_latency_ms_p99": round(float(np.percentile(ms, 99)), 2),
        "latency_ms_per_frame_p50": round(
            float(np.percentile(ms, 50)) / req_frames, 3),
    }))
    return 0


def cmd_parity(argv) -> int:
    """Clinical parity protocols: CAMUS official ED/ES per-patient scoring
    (Dice + HD95 per structure/view) or EchoNet EF estimation from
    predicted masks — ready to run unmodified on the real artifacts
    (eval/parity.py docstring has the protocol definitions)."""
    import os
    import jax
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.eval import parity
    from gdkvm_tpu.io.checkpoint import CheckpointManager
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params
    from gdkvm_tpu.train.loop import abstract_train_state, eval_params, \
        make_optimizer

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm parity")
    p.add_argument("--config", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--protocol",
                   choices=("camus", "camus-ef", "echonet-ef", "auto"),
                   default="auto", help="auto = by data.dataset")
    p.add_argument("--split", default=None,
                   help="default: data.val_split (camus) / VAL (echonet)")
    p.add_argument("--num-videos", type=int, default=None,
                   help="echonet-ef: cap videos scored")
    p.add_argument("--max-patients", type=int, default=None,
                   help="camus: cap patients scored")
    p.add_argument("--folds", type=int, default=None,
                   help="camus: k-fold CV aggregation (the CAMUS "
                        "challenge protocol is 10-fold) instead of the "
                        "fixed split — mean ± std of per-fold mean Dice")
    p.add_argument("--no-hd95", action="store_true")
    p.add_argument("--ablate", action="store_true",
                   help="memory-contribution 2x2 study ({clean,occluded} x "
                        "{carry,reset}) on the configured benchmark instead "
                        "of a clinical protocol (parity.memory_ablation)")
    p.add_argument("--ablate-videos", type=int, default=8)
    p.add_argument("--ablate-video-len", type=int, default=64)
    p.add_argument("--quant-scales", default=None,
                   help="W8A8 scales JSON from `gdkvm quant` — score the "
                        "quantized serving path (e.g. --ablate to check "
                        "the robustness mechanism survives quantization)")
    args = p.parse_args(flags)
    cfg = load_config(args.config, overrides)

    model = GDKVM(cfg=cfg.model)
    ckpt_dir = args.checkpoint or os.path.join(cfg.runtime.run_dir,
                                               "checkpoints")
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        tpl = abstract_train_state(cfg, model, make_optimizer(cfg),
                                   jax.random.PRNGKey(0))
        state = CheckpointManager(ckpt_dir).restore(tpl)
        params = jax.device_put(eval_params(state, cfg))
    else:
        print("warning: no checkpoint found — scoring an UNTRAINED init",
              file=sys.stderr)
        params = init_params(model, jax.random.PRNGKey(0),
                             cfg.data.image_size)
    if args.quant_scales:
        from gdkvm_tpu.ops import quant as _Q
        model = _Q.w8a8_model(model, _Q.load_scales(args.quant_scales))

    protocol = args.protocol
    if protocol == "auto":
        protocol = "echonet-ef" if cfg.data.dataset == "echonet" else "camus"
    if args.ablate:
        out = parity.memory_ablation(cfg, model, params,
                                     num_videos=args.ablate_videos,
                                     video_len=args.ablate_video_len)
    elif protocol == "camus" and args.folds:
        out = parity.camus_official_folds(
            cfg, model, params, folds=args.folds,
            split=args.split or cfg.data.val_split,
            with_hd95=not args.no_hd95)
    elif protocol == "camus":
        out = parity.camus_official(
            cfg, model, params, split=args.split or cfg.data.val_split,
            with_hd95=not args.no_hd95, max_patients=args.max_patients)
    elif protocol == "camus-ef":
        out = parity.camus_ef(
            cfg, model, params, split=args.split or cfg.data.val_split,
            max_patients=args.max_patients)
    else:
        out = parity.echonet_ef(cfg, model, params,
                                split=args.split or "VAL",
                                num_videos=args.num_videos)
    table = out.pop("table", None)
    if table:
        print(table, file=sys.stderr)
    print(json.dumps(out))
    return 0


def cmd_validate_data(argv) -> int:
    """Dataset layout health check: counts, geometry, class histogram,
    annotation coverage — run this before pointing a training run at a
    freshly mounted CAMUS/EchoNet artifact."""
    import numpy as np
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.data.pipeline import make_dataset

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm validate-data")
    p.add_argument("--config", default=None)
    p.add_argument("--splits", default=None,
                   help="comma list (default: train_split,val_split)")
    p.add_argument("--sample", type=int, default=4,
                   help="clips to decode per split for the histogram")
    args = p.parse_args(flags)
    cfg = load_config(args.config, overrides)
    splits = (args.splits.split(",") if args.splits
              else [cfg.data.train_split, cfg.data.val_split])

    out = {"dataset": cfg.data.dataset, "data_path": cfg.data.data_path,
           "splits": {}, "warnings": []}
    for split in splits:
        try:
            ds = make_dataset(cfg.data, split, cfg.model.num_classes)
        except Exception as exc:
            out["splits"][split] = {"error": f"{type(exc).__name__}: {exc}"}
            out["warnings"].append(f"split {split!r} failed to open")
            continue
        info = {"clips": len(ds)}
        if len(ds) == 0:
            out["warnings"].append(f"split {split!r} is empty")
        hist = np.zeros(cfg.model.num_classes, np.int64)
        ann_frames = tot_frames = 0
        geoms = set()
        for i in range(min(args.sample, len(ds))):
            frames, masks, valid = ds[i]
            geoms.add(tuple(frames.shape[1:]))
            vals, counts = np.unique(masks[valid > 0], return_counts=True)
            for v, c in zip(vals, counts):
                if v < hist.size:
                    hist[v] += int(c)
                else:
                    out["warnings"].append(
                        f"split {split!r}: mask class {int(v)} ≥ "
                        f"model.num_classes={cfg.model.num_classes}")
            ann_frames += int((valid > 0).sum())
            tot_frames += int(valid.shape[0])
        info["frame_geometry"] = sorted(str(g) for g in geoms)
        info["annotated_frame_fraction"] = (
            round(ann_frames / tot_frames, 3) if tot_frames else None)
        total_px = int(hist.sum())
        info["class_pixel_fractions"] = (
            [round(float(c) / total_px, 4) for c in hist] if total_px
            else None)
        missing = [k for k in range(1, cfg.model.num_classes)
                   if total_px and hist[k] == 0]
        if missing:
            out["warnings"].append(
                f"split {split!r}: foreground classes {missing} absent "
                f"in the sampled clips")
        if cfg.data.dataset == "echonet":
            from gdkvm_tpu.eval.parity import read_ef_labels
            efs = read_ef_labels(cfg.data.data_path)
            info["ef_labels"] = len(efs)
            if not efs:
                out["warnings"].append(
                    "FileList.csv has no EF column — the echonet-ef "
                    "parity protocol will have nothing to score against")
        out["splits"][split] = info
    out["ok"] = not out["warnings"]
    print(json.dumps(out))
    return 0 if out["ok"] else 1


def cmd_convert_camus(argv) -> int:
    """Convert raw CAMUS (MetaImage .mhd) into the processed PNG layout."""
    from gdkvm_tpu.data.camus_raw import convert_raw_camus
    p = argparse.ArgumentParser(prog="gdkvm convert-camus")
    p.add_argument("--raw", required=True, help="raw CAMUS root "
                   "(patientNNNN dirs of .mhd half-sequences)")
    p.add_argument("--out", required=True,
                   help="output root (camus_png256x256_10f layout)")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--clip-len", type=int, default=10)
    p.add_argument("--val-fraction", type=float, default=0.1)
    p.add_argument("--split-mode", choices=("random", "official"),
                   default="random",
                   help="official = fixed CAMUS patient-number split "
                        "(1-400 train / 401-450 val / 451-500 test)")
    args = p.parse_args(argv)
    n = convert_raw_camus(args.raw, args.out, image_size=args.image_size,
                          clip_len=args.clip_len,
                          val_fraction=args.val_fraction,
                          split_mode=args.split_mode)
    print(json.dumps({"clips_written": n, "out": args.out}))
    return 0


_COMMANDS = {
    "train": cmd_train,
    "eval": cmd_eval,
    "bench": cmd_bench,
    "stream-eval": cmd_stream_eval,
    "scale": cmd_scale,
    "quant": cmd_quant,
    "pack": cmd_pack,
    "convert-camus": cmd_convert_camus,
    "validate-data": cmd_validate_data,
    "parity": cmd_parity,
    "serve": cmd_serve,
    "serve-bench": cmd_serve_bench,
    "export": cmd_export,
    "serve-check": cmd_serve_check,
    "infer": cmd_infer,
    "sweep": cmd_sweep,
    "info": cmd_info,
}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m gdkvm_tpu "
              f"{{{'|'.join(_COMMANDS)}}} [--config cfg.yaml] "
              "[key=value ...]")
        return 0 if argv else 2
    cmd, rest = argv[0], argv[1:]
    if cmd in _COMMANDS:
        return _COMMANDS[cmd](rest)
    print(f"unknown command {cmd!r}; expected {'|'.join(_COMMANDS)}",
          file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
