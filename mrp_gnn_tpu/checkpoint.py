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
        self._dir = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any,
             data_state: Optional[str] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if data_state is not None:
            # Data-iterator state (e.g. grain's serialized iterator) rides
            # alongside the pytree so resume seeks the stream in O(1)
            # instead of rendering-and-discarding every skipped batch.
            with open(os.path.join(self._dir, f"data_state_{step}.json"),
                      "w") as f:
                f.write(data_state)

    def latest_data_state(self) -> Optional[str]:
        """Serialized data-iterator state saved with the newest step, if any."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        path = os.path.join(self._dir, f"data_state_{step}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return f.read()

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
