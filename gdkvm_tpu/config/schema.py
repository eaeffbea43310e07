"""Dataclass-typed config tree loaded from YAML with dotted-path overrides.

The reference training framework is configured via Hydra YAML
(reference: website/src/content/reprod/en.json:62,67 — config/config_gdkvm_01.yaml,
hydra.run.dir) with documented keys ``data_path``, ``batch_size``,
``learning_rate``, ``num_iterations``, ``eval_stage.{num_vis, wandb_mode}``
(reference: website/src/pages/[lang]/reprod/index.astro:246-252).  We keep the
same key names at the YAML top level so reference recipes translate 1:1, but
implement config as plain dataclasses — no hydra.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import yaml


@dataclass
class ModelConfig:
    """GDKVM model hyperparameters (see gdkvm_tpu/models/gdkvm.py)."""
    in_channels: int = 1
    num_classes: int = 2               # background + LV (binary LV default)
    # Encoder: stem + 3 stages at strides 4/8/16.
    enc_channels: Tuple[int, ...] = (32, 64, 96, 128)
    enc_blocks: Tuple[int, ...] = (1, 2, 2, 2)
    # Stem variant: "s2d" (4×4 space-to-depth patchify — MXU-friendly, the
    # TPU default) or "conv" (two stride-2 convs, the classic CNN stem).
    enc_stem: str = "s2d"
    # LKVA / GDR memory.
    num_heads: int = 4
    head_dim_k: int = 64
    head_dim_v: int = 64
    # Scale at which memory tokens live.  The architecture pins this to
    # the encoder's deepest stride (16) — validated in GDKVM.setup; the
    # field exists so saved run configs stay loadable.
    mem_stride: int = 16
    # KPFF fusion + decoder.
    # KPFF decoder widths from stride 16 downward: 3 entries = head at
    # stride 4 (classic), 2 entries = head at stride 8 with an 8× logits
    # upsample — the lane-aligned TPU head (models/decoder.py docstring).
    kpff_channels: Tuple[int, ...] = (96, 64, 48)   # strides 16, 8, 4
    # Mask conditioning is done by writing the prompted frame into the
    # initial memory state (models/lkva.py prompt_write) — a TPU-first
    # design that keeps the recurrence scan-parallel (PARITY.md §2.2).
    # Numerics.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Kernel selection for the GDR scan: "auto" (DEFAULT — the transpose-
    # free Pallas TPU kernel on accelerators, XLA chunked on CPU; the
    # kernel won or tied XLA at every measured v5e shape, BASELINE.md GDR
    # crossover table), "chunked" (pure JAX sequential scan — required for
    # multi-platform export), "assoc" (pure JAX log-depth associative
    # scan over affine frame transitions), "pallas" (force the kernel),
    # "ref" (token scan, tests).
    gdr_impl: str = "auto"
    # Recurrence variant: "gdn" (classic coupled gated delta rule — the
    # erase and write strengths share one β gate) or "gdn2" (decoupled:
    # a separate learned erase gate η per token/head, GDN-2 lineage,
    # arXiv 2605.22791 — the memory can overwrite without erasing and
    # vice versa).
    gdr_variant: str = "gdn"
    # Quantized serving tag: "none" for the normal bf16 path.  Set ONLY by
    # ops/quant.py::w8a8_model (to "w8a8-<scales digest>") on the wrapped
    # model it returns — the tag's job is to key the repr-keyed jitted-
    # apply caches (eval/streaming.py) so quantized and full-precision
    # traces never collide.  Not a user-settable training option: training
    # is never quantized (int8 has no grad story on v5e).
    quant: str = "none"


@dataclass
class DataConfig:
    dataset: str = "synthetic"         # synthetic | camus | echonet
    data_path: str = ""
    image_size: int = 112
    clip_len: int = 10                 # frames/clip; CAMUS artifact uses 10
    num_workers: int = 4
    prefetch: int = 2
    # CAMUS multi-class uses 4 classes: BG, LV endo, myocardium(epi), LA.
    train_split: str = "train"
    val_split: str = "val"
    augment: bool = True
    # Acoustic-dropout augmentation: probability that a clip gets a window
    # of 1-4 consecutive frames with a blanked region (never frame 0).
    # Teaches the model to read through occlusions from memory — the
    # robustness behavior the reference claims (README.md:16-22 "signal
    # dropout").  Measured: without it, carried-state Dice under occlusion
    # equals reset-state (the memory goes unused).
    occlude_prob: float = 0.0
    seed: int = 0
    # Synthetic-generator difficulty ∈ [0,1]: 0 = easy legacy clips, >0
    # blends in the clinical-artifact bank (shadowing, probe drift, TGC
    # decay, clutter, out-of-plane swings — data/synthetic.py).  The
    # discriminative-benchmark knob: at 0 the synthetic CAMUS benchmark is
    # quality-saturated and cannot rank models.
    synth_difficulty: float = 0.0
    # HBM-resident dataset cache (data/device_cache.py): upload the whole
    # training split once, sample+augment on device — zero per-step host
    # transfer (the host link costs ~55 ms + bytes/60MB/s per batch on the
    # dev setup; the 256² recipe step is 36 ms).  auto = on when the split
    # fits device_cache_max_mb.
    device_cache: str = "auto"         # auto | on | off
    device_cache_max_mb: int = 2048


@dataclass
class TrainConfig:
    batch_size: int = 8                # documented recipe value
    learning_rate: float = 1.0e-4      # documented recipe value
    num_iterations: int = 3000         # documented recipe value
    warmup_iterations: int = 100
    weight_decay: float = 1.0e-4
    grad_clip: float = 1.0
    ce_weight: float = 1.0
    dice_weight: float = 1.0
    # Bootstrapped (top-k hard-pixel) CE — the memory-VOS lineage default
    # (train/losses.py).  ratio < 1 enables it: per valid frame only the
    # hardest ratio·H·W pixels carry CE, annealed in by a λ ramp from
    # start_frac·N to end_frac·N iterations (static k, one compile).
    # 1.0 (default) = plain CE, trace-identical to pre-r5 recipes.
    bootstrap_ratio: float = 1.0
    bootstrap_start: float = 0.2       # fraction of num_iterations
    bootstrap_end: float = 0.6
    seed: int = 0
    log_every: int = 50
    eval_every: int = 500
    checkpoint_every: int = 500
    # First-frame mask prompting probability during training (0 disables).
    prompt_prob: float = 0.5
    remat: bool = False                # jax.checkpoint over the frame scan
    # Polyak/EMA averaging of params (0 disables).  When on, eval and the
    # eval/stream-eval CLIs score the EMA weights (eval_stage.use_ema).
    ema_decay: float = 0.0
    # Gradient accumulation: average grads over k micro-steps before one
    # optimizer update (effective batch = batch_size × accum_steps).
    accum_steps: int = 1


@dataclass
class EvalStageConfig:
    num_vis: int = 4                   # documented key: visualization count
    wandb_mode: str = "offline"        # documented key
    batch_size: int = 1
    stream_chunk: int = 16             # frames per device call in streaming
    streams: int = 1                   # videos in flight (serving mode)
    use_ema: bool = True               # score EMA weights when available
    # Opt-in extra metrics (host-side, eval-only): 95th-pct Hausdorff
    # boundary distance (the standard CAMUS metric alongside Dice).
    hd95: bool = False


@dataclass
class ParallelConfig:
    data_axis: int = -1                # -1 = all remaining devices
    model_axis: int = 1
    # Donate state buffers in the streaming step (aliasing audit: SURVEY §5).
    donate_state: bool = True


@dataclass
class RuntimeConfig:
    run_dir: str = "outputs/run"       # hydra.run.dir equivalent
    resume: bool = False
    # Persistent compilation cache dir; "" = the GDKVM_JIT_CACHE default
    # (~/.cache/gdkvm_tpu/jaxcache, see gdkvm_tpu/__init__.py).
    jit_cache_dir: str = ""
    profile: bool = False
    # Sanitizer tier (SURVEY §5): raise on the first NaN-producing op.
    debug_nans: bool = False


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval_stage: EvalStageConfig = field(default_factory=EvalStageConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    # Reference-documented top-level aliases (reprod/index.astro:246-252).
    # When set in YAML/CLI they override the nested fields in __post_init__.
    data_path: Optional[str] = None
    batch_size: Optional[int] = None
    learning_rate: Optional[float] = None
    num_iterations: Optional[int] = None

    def __post_init__(self):
        if self.data_path is not None:
            self.data.data_path = self.data_path
        if self.batch_size is not None:
            self.train.batch_size = self.batch_size
        if self.learning_rate is not None:
            self.train.learning_rate = self.learning_rate
        if self.num_iterations is not None:
            self.train.num_iterations = self.num_iterations


_LEAF_TYPES = (int, float, str, bool)


def _from_dict(cls, d: Dict[str, Any]):
    """Build a dataclass from a (possibly nested) dict, strictly typed."""
    if d is None:
        return cls()
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in d.items():
        if key not in fields:
            raise KeyError(f"Unknown config key {key!r} for {cls.__name__}; "
                           f"valid keys: {sorted(fields)}")
        f = fields[key]
        if dataclasses.is_dataclass(f.type) or (
                isinstance(f.type, type) and dataclasses.is_dataclass(f.type)):
            kwargs[key] = _from_dict(f.type, value)
        elif isinstance(value, dict):
            # nested dataclass declared via string annotation
            sub = _resolve_dataclass(f)
            kwargs[key] = _from_dict(sub, value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def _resolve_dataclass(f: dataclasses.Field):
    t = f.type
    if isinstance(t, str):
        t = globals().get(t, None)
    if t is None or not dataclasses.is_dataclass(t):
        raise TypeError(f"Field {f.name} is not a dataclass")
    return t


def _coerce(value: str, current: Any) -> Any:
    """Coerce a CLI string to the type of the current value."""
    if isinstance(current, bool) or value in ("true", "false", "True", "False"):
        return value in ("true", "True", "1")
    if isinstance(current, int) and not isinstance(current, bool):
        try:
            return int(value)
        except ValueError:
            return float(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, (tuple, list)):
        items = [x for x in value.strip("[]()").split(",") if x]
        elem = current[0] if len(current) else 0
        return tuple(_coerce(x.strip(), elem) for x in items)
    if current is None:
        # best-effort literal parse
        for cast in (int, float):
            try:
                return cast(value)
            except ValueError:
                pass
        if value in ("true", "false", "True", "False"):
            return value in ("true", "True")
        return value
    return value


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Apply ``a.b.c=value`` dotted-path overrides in place (hydra-style)."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"Override {item!r} must be key=value")
        path, value = item.split("=", 1)
        parts = path.split(".")
        obj = cfg
        for p in parts[:-1]:
            if not hasattr(obj, p):
                raise KeyError(f"Unknown config path {path!r} (at {p!r})")
            obj = getattr(obj, p)
        leaf = parts[-1]
        if not hasattr(obj, leaf):
            raise KeyError(f"Unknown config path {path!r} (at {leaf!r})")
        setattr(obj, leaf, _coerce(value, getattr(obj, leaf)))
    # Re-run alias propagation for documented top-level keys.
    if isinstance(cfg, Config):
        cfg.__post_init__()
    return cfg


def load_config(path: Optional[str] = None,
                overrides: Sequence[str] = ()) -> Config:
    """Load a YAML config file (or defaults) and apply CLI overrides."""
    if path:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        cfg = _from_dict(Config, raw)
    else:
        cfg = Config()
    return apply_overrides(cfg, overrides)


def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)
