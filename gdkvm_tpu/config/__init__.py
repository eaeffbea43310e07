"""Typed configuration tree (hydra-like ergonomics, no hydra dependency)."""

from gdkvm_tpu.config.schema import (  # noqa: F401
    Config,
    DataConfig,
    EvalStageConfig,
    ModelConfig,
    ParallelConfig,
    RuntimeConfig,
    TrainConfig,
    apply_overrides,
    load_config,
)
