"""Multi-host SPMD initialization.

The reference's distributed story is a single-node 2-GPU DDP launch with a
rendezvous port (reference: website/src/pages/[lang]/reprod/index.astro:
238-239).  The TPU-native multi-host story is jax.distributed: one process
per host, same SPMD program, the mesh spans every host's chips.  On Cloud
TPU pods ``jax.distributed.initialize()`` auto-discovers everything; off
the beaten path the standard env vars are honored.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a multi-process env is detected.

    Triggers on GDKVM_COORDINATOR (host:port) + GDKVM_NUM_PROCESSES +
    GDKVM_PROCESS_ID, or on a TPU-pod environment where
    jax.distributed.initialize() can auto-configure.  No-op (False) for
    single-process runs — the common case on one chip/slice.
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("GDKVM_COORDINATOR")
    nproc = os.environ.get("GDKVM_NUM_PROCESSES")
    pid = os.environ.get("GDKVM_PROCESS_ID")
    # Rendezvous margin: on a loaded host (noisy CI neighbors) the default
    # initialization timeout can expire while peer processes are still
    # starting; GDKVM_DIST_TIMEOUT widens it.
    timeout = int(os.environ.get("GDKVM_DIST_TIMEOUT", "300"))
    try:
        if coord and nproc and pid:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid),
                initialization_timeout=timeout,
            )
            _initialized = True
        elif os.environ.get("GDKVM_AUTO_DISTRIBUTED") == "1":
            jax.distributed.initialize()
            _initialized = True
    except Exception as exc:   # pragma: no cover - depends on cluster env
        raise RuntimeError(
            f"jax.distributed initialization failed: {exc}") from exc
    return _initialized


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align all processes at a named coordination-service barrier.

    Uses the jax.distributed coordination client directly — NO device
    collectives — so it is safe (and cheap) to call BEFORE the comm
    backend's first context initialization.  Why it exists: the CPU Gloo
    backend's context init has a fixed ~30 s key-value timeout; on a
    loaded host, per-process compile-time skew can exceed that at the
    first cross-process collective.  A barrier immediately before each
    first-use collective re-aligns ranks with a generous timeout, leaving
    the 30 s window to cover only the actual handshake.  No-op when
    jax.distributed is not initialized (single-process runs).
    """
    try:
        # jax._src.distributed is a private surface (stable on the pinned
        # jax, unversioned upstream).  If an upgrade moves it, degrade to
        # a loud no-op rather than crashing every rendezvous — the barrier
        # is a HARDENING layer (compile-skew margin), not a correctness
        # requirement: collectives still rendezvous on their own.
        from jax._src import distributed as _dist
        client = getattr(_dist.global_state, "client", None)
    except Exception:  # pragma: no cover - depends on jax version
        import warnings
        warnings.warn(
            "jax coordination-service client unavailable on this jax "
            "version; gdkvm barrier() is a no-op (cross-process compile "
            "skew is no longer absorbed — see parallel/distributed.py)",
            RuntimeWarning, stacklevel=2)
        return
    if client is None:
        return
    client.wait_at_barrier(name, timeout_ms)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
