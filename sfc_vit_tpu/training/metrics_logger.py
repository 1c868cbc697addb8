"""Structured metrics logging: JSONL + CSV + stdout + optional TensorBoard.

Replaces the reference's print/tqdm-only observability
(``main.py:331-335``) with machine-readable per-epoch records including
throughput (images/sec/chip -- the BASELINE.md north-star metric the
reference never measures).  TensorBoard event files are written when a
SummaryWriter implementation is importable (``torch.utils.tensorboard``
on this image; ``tensorboardX`` as fallback) and ``tensorboard=True``
is requested -- opt-in (default off) because importing the torch
SummaryWriter costs seconds of startup nobody asked for, and only
process 0 writes in multi-host runs (every process writing identical
scalars into one directory interleaves the curves).
"""

from __future__ import annotations

import csv
import json
import pathlib
import sys
import time
from typing import Dict, Optional

__all__ = ["MetricsLogger"]


def _summary_writer(logdir):
    """Best-effort SummaryWriter; None when no backend is importable."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        try:
            from tensorboardX import SummaryWriter
        except Exception:
            return None
    try:
        return SummaryWriter(log_dir=str(logdir))
    except Exception:
        return None


class MetricsLogger:
    def __init__(
        self,
        directory: Optional[str | pathlib.Path] = None,
        stdout: bool = True,
        tensorboard: bool = False,
        primary: Optional[bool] = None,
    ) -> None:
        """``primary``: whether this process owns the sinks.  Default
        (None) = ``jax.process_index() == 0`` — in a multi-host run the
        workdir is shared (orbax requires it), and every process
        appending identical rows to one metrics.jsonl/csv corrupts the
        run history.  Metrics are already globally reduced by the mesh
        collectives, so process 0 sees the full picture."""
        if primary is None:
            import jax

            primary = jax.process_index() == 0
        self.stdout = stdout and primary
        self._jsonl = None
        self._csv_path = None
        self._csv_fields = None
        self._tb = None
        self._step = 0
        if directory is not None and primary:
            d = pathlib.Path(directory)
            d.mkdir(parents=True, exist_ok=True)
            self._jsonl = open(d / "metrics.jsonl", "a", buffering=1)
            self._csv_path = d / "metrics.csv"
            if tensorboard:
                self._tb = _summary_writer(d / "tensorboard")
        self._t0 = time.time()

    def log(self, record: Dict) -> None:
        record = dict(record)
        record.setdefault("wall_time", round(time.time() - self._t0, 3))
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(record) + "\n")
        if self._csv_path is not None:
            new = not self._csv_path.exists()
            if self._csv_fields is None:
                if new:
                    self._csv_fields = list(record)
                else:
                    # resumed run: append under the EXISTING header --
                    # freezing columns from this process's first record
                    # would misalign rows when the record shapes differ
                    # (e.g. the fully-resumed eval-only record has no
                    # train_* keys)
                    with open(self._csv_path, newline="") as f:
                        header = next(csv.reader(f), None)
                    self._csv_fields = header or list(record)
            with open(self._csv_path, "a", newline="") as f:
                writer = csv.DictWriter(
                    f, fieldnames=self._csv_fields,
                    extrasaction="ignore", restval="",
                )
                if new:
                    writer.writeheader()
                writer.writerow(record)
        if self._tb is not None:
            # x-axis: the record's own epoch/step if present, else a
            # monotonically increasing log index
            step = record.get("epoch", record.get("step", self._step))
            self._step += 1
            for k, v in record.items():
                if k in ("epoch", "step"):
                    continue
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    self._tb.add_scalar(k, float(v), int(step))
            self._tb.flush()
        if self.stdout:
            parts = [
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
            ]
            print(" ".join(parts), file=sys.stderr)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
