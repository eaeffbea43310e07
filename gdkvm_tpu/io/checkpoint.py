"""Orbax checkpointing: params + optimizer + step + RNG, keyed by iteration.

The reference saves "weights, visualizations" to the hydra run dir
(reference: website/src/content/reprod/en.json:67) with no documented resume
semantics; we add full resume (SURVEY.md §5 checkpoint/resume): restoring
brings back params, optimizer state, the RNG key, and the iteration counter
(the data pipeline is re-seeded deterministically from the iteration).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for train-state pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self._dir}")
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_template))
        except (KeyError, ValueError) as exc:
            raise ValueError(
                f"checkpoint at {self._dir} step {step} does not match the "
                f"restore template (state tree mismatch). Common causes: "
                f"(a) the run predates a model-config default change (e.g. "
                f"model.enc_stem) — pass the original value explicitly "
                f"(e.g. model.enc_stem=conv); (b) train.ema_decay differs "
                f"from the training run — the EMA shadow is part of the "
                f"checkpoint tree, so scoring/resume must use the same "
                f"train.ema_decay (0 ↔ >0 changes the tree). "
                f"Original error: {exc}"
            ) from exc

    def close(self) -> None:
        self._mgr.close()
