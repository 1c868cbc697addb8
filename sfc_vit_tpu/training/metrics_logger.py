"""Structured metrics logging: JSONL + CSV + stdout.

Replaces the reference's print/tqdm-only observability
(``main.py:331-335``) with machine-readable per-epoch records including
throughput (images/sec/chip -- the BASELINE.md north-star metric the
reference never measures).
"""

from __future__ import annotations

import csv
import json
import pathlib
import sys
import time
from typing import Dict, Optional

__all__ = ["MetricsLogger"]


class MetricsLogger:
    def __init__(
        self,
        directory: Optional[str | pathlib.Path] = None,
        stdout: bool = True,
    ) -> None:
        self.stdout = stdout
        self._jsonl = None
        self._csv_path = None
        self._csv_fields = None
        if directory is not None:
            d = pathlib.Path(directory)
            d.mkdir(parents=True, exist_ok=True)
            self._jsonl = open(d / "metrics.jsonl", "a", buffering=1)
            self._csv_path = d / "metrics.csv"
        self._t0 = time.time()

    def log(self, record: Dict) -> None:
        record = dict(record)
        record.setdefault("wall_time", round(time.time() - self._t0, 3))
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(record) + "\n")
        if self._csv_path is not None:
            new = not self._csv_path.exists()
            if self._csv_fields is None:
                self._csv_fields = list(record)
            with open(self._csv_path, "a", newline="") as f:
                writer = csv.DictWriter(
                    f, fieldnames=self._csv_fields, extrasaction="ignore"
                )
                if new:
                    writer.writeheader()
                writer.writerow(record)
        if self.stdout:
            parts = [
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
            ]
            print(" ".join(parts), file=sys.stderr)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
