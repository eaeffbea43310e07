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
    from gdkvm_tpu.train.loop import train
    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm train")
    p.add_argument("--config", default=None, help="YAML config path")
    args = p.parse_args(flags)
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
    from gdkvm_tpu.train.loop import TrainState, create_train_state, \
        make_optimizer
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
    state = create_train_state(cfg, model, make_optimizer(cfg),
                               jax.random.PRNGKey(0))
    ckpt_dir = args.checkpoint or os.path.join(cfg.runtime.run_dir,
                                               "checkpoints")
    ckpt = CheckpointManager(ckpt_dir)
    state = ckpt.restore(jax.device_get(state))
    metrics = evaluate(cfg, model, state.params, mesh, step=int(state.step))
    print(json.dumps(metrics))
    return 0


def cmd_bench(argv) -> int:
    import jax
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.eval.throughput import measure_streaming_fps
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params

    flags, overrides = _split_args(argv)
    p = argparse.ArgumentParser(prog="gdkvm bench")
    p.add_argument("--config", default=None)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--image-size", type=int, default=112)
    args = p.parse_args(flags)
    cfg = load_config(args.config, overrides)

    model = GDKVM(cfg=cfg.model)
    params = init_params(model, jax.random.PRNGKey(0), args.image_size)
    result = measure_streaming_fps(
        model, params, image_size=args.image_size,
        chunk=args.chunk, batch=args.batch)
    print(json.dumps(result))
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m gdkvm_tpu {train|eval|bench} "
              "[--config cfg.yaml] [key=value ...]")
        return 0 if argv else 2
    cmd, rest = argv[0], argv[1:]
    if cmd == "train":
        return cmd_train(rest)
    if cmd == "eval":
        return cmd_eval(rest)
    if cmd == "bench":
        return cmd_bench(rest)
    print(f"unknown command {cmd!r}; expected train|eval|bench",
          file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
