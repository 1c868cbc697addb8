"""Orbax checkpointing: best + periodic policies, with real restore.

The reference only ever saves (best-test-acc dict at ``main.py:337-355``;
no load path exists anywhere).  Here two Orbax managers cover both
policies correctly:

* ``latest/`` keeps the ``keep`` most recent checkpoints -- crash
  recovery always resumes from the true latest step;
* ``best/`` keeps the single best checkpoint by ``metric_name`` (the
  reference's best-test-accuracy policy).

(A single manager with ``best_fn`` + ``max_to_keep`` would retain the K
*best* checkpoints and delete newer ones, silently rolling resume back
to the accuracy peak.)
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["Checkpointer"]


class Checkpointer:
    """Manage train-state checkpoints under ``directory``."""

    def __init__(
        self,
        directory: str | pathlib.Path,
        keep: int = 3,
        metric_name: str = "test_accuracy",
        save_interval_steps: int = 1,
    ) -> None:
        self.directory = pathlib.Path(directory).absolute()
        self.metric_name = metric_name
        self._latest = ocp.CheckpointManager(
            self.directory / "latest",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
            # register the handler eagerly so item_metadata works on a
            # fresh manager over an existing directory (resume path)
            item_handlers=ocp.StandardCheckpointHandler(),
        )
        self._best = ocp.CheckpointManager(
            self.directory / "best",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                best_fn=lambda m: float(
                    m.get(metric_name, float("-inf"))
                ),
                best_mode="max",
                create=True,
            ),
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    def save(
        self, step: int, state: Any, metrics: Optional[Dict[str, float]] = None
    ) -> bool:
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        saved = self._latest.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics
        )
        # Write to the best/ manager only on improvement: an
        # unconditional save would serialize the whole TrainState a
        # second time every epoch just for best_fn's GC to delete it.
        # The decision is replica-consistent (metrics are replicated,
        # the sidecar lives on the shared workdir and only changes on
        # improvement), so multi-host Orbax collectives stay aligned.
        if self.metric_name in metrics:
            prev = self.best_metric()
            if prev is None or metrics[self.metric_name] > prev:
                self._best.save(
                    step, args=ocp.args.StandardSave(state), metrics=metrics
                )
                if jax.process_index() == 0:
                    # atomic replace: torn/interleaved writes would make
                    # best_metric() silently reset best tracking to 0
                    tmp = self._best_metric_path().with_suffix(
                        f".tmp.{os.getpid()}"
                    )
                    tmp.write_text(
                        json.dumps({
                            "step": int(step),
                            self.metric_name: metrics[self.metric_name],
                        })
                    )
                    os.replace(tmp, self._best_metric_path())
        return bool(saved)

    def _best_metric_path(self) -> pathlib.Path:
        return self.directory / "best_metric.json"

    def best_metric(self) -> Optional[float]:
        """Best ``metric_name`` value saved so far (None before any
        save) — survives process restarts, so a resumed ``fit()`` does
        not reset its best-accuracy tracking to 0."""
        p = self._best_metric_path()
        if not p.exists():
            return None
        try:
            return float(json.loads(p.read_text())[self.metric_name])
        except Exception:
            return None

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore the given (or latest) step into the template pytree."""
        step = self._latest.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._latest.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_best(self, state_template: Any) -> Any:
        step = self._best.best_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._best.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def params_metadata(
        self, step: Optional[int] = None, which: str = "latest"
    ) -> Any:
        """Saved ``params`` subtree metadata (nested dicts of orbax
        ArrayMetadata, each with ``.shape``) for layout inspection
        before restore — e.g. detecting a pipelined checkpoint's
        ``stages`` layout from a sequential run.  ``which`` selects the
        manager: 'latest' (resume) or 'best' (--eval-only)."""
        mgr = self._best if which == "best" else self._latest
        if step is None:
            step = (
                self._best.best_step() if which == "best"
                else self._latest.latest_step()
            )
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return mgr.item_metadata(step).tree["params"]

    def latest_step(self) -> Optional[int]:
        return self._latest.latest_step()

    def best_step(self) -> Optional[int]:
        return self._best.best_step()

    def wait(self) -> None:
        self._latest.wait_until_finished()
        self._best.wait_until_finished()

    def close(self) -> None:
        self._latest.close()
        self._best.close()
