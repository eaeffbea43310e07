"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip behavior is tested without a cluster via XLA host-platform device
emulation (SURVEY.md §4.2d).  The dev image's sitecustomize imports jax at
interpreter startup (registering the TPU/axon PJRT plugin), so env vars alone
are too late here — use jax.config.update, which works any time before the
backend is first initialized.
"""

import os

import jax

_platform = os.environ.get("GDKVM_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
