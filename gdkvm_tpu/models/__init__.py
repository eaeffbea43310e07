"""GDKVM model family: encoder, LKVA memory, KPFF fusion, decoder."""

from gdkvm_tpu.models.gdkvm import GDKVM, StreamState  # noqa: F401
