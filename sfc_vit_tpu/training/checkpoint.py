"""Orbax checkpointing: best + periodic policies, with real restore.

The reference only ever saves (best-test-acc dict at ``main.py:337-355``;
no load path exists anywhere).  Here both policies run through one Orbax
``CheckpointManager`` and training can resume from the latest step
(SURVEY.md section 5 "failure detection": checkpoint/resume is the
pragmatic recovery story).
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

__all__ = ["Checkpointer"]


class Checkpointer:
    """Manage train-state checkpoints under ``directory``.

    Keeps the ``keep`` most recent periodic checkpoints plus the best one
    by ``metric_name`` (higher is better, matching the reference's
    best-test-accuracy policy).
    """

    def __init__(
        self,
        directory: str | pathlib.Path,
        keep: int = 3,
        metric_name: str = "test_accuracy",
        save_interval_steps: int = 1,
    ) -> None:
        self.directory = pathlib.Path(directory).absolute()
        self.metric_name = metric_name
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            best_fn=lambda m: float(m.get(metric_name, float("-inf"))),
            best_mode="max",
            save_interval_steps=save_interval_steps,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(
        self, step: int, state: Any, metrics: Optional[Dict[str, float]] = None
    ) -> bool:
        saved = self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        return bool(saved)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore the given (or latest) step into the template pytree."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_best(self, state_template: Any) -> Any:
        step = self._mgr.best_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
