"""Data layer: clip datasets (CAMUS, EchoNet-Dynamic, synthetic) + pipeline."""

from gdkvm_tpu.data.pipeline import Batch, make_dataset, prefetch_to_device  # noqa: F401
