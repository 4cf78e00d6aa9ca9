"""Orbax-based checkpoint/resume of the full train state.

The reference saves bare state dicts with torch.save and a --resume flag
(SURVEY.md section 5 "Checkpoint / resume", reconstructed). Here the whole
TrainState pytree (params, optimizer state, step) is saved with
orbax-checkpoint — async, atomic, multi-host-aware — and restore_latest
resumes from the newest step.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, abstract_state: Any) -> Optional[Any]:
        """Restore the newest checkpoint into the structure of
        ``abstract_state``; returns None if no checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
