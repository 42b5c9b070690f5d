"""Metric logging — JSONL replacement for the reference's dvclive usage.

The reference logs four series through ``dvclive.Live``
(train.py:160-178): train/loss/inverse, val/loss/inverse,
val/metric/durations, val/metric/iterations, stepped per epoch.  We write
the same series as append-only JSON lines plus a ``metrics.json`` summary
of the latest step (the artifact dvc.yaml:39-40 registers).
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsLogger:
    """Append-only JSONL metric logger with a latest-values summary."""

    def __init__(self, directory: Path | str) -> None:
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self._file = (self.directory / "metrics.jsonl").open("a")
        self.step = 0
        self._latest: dict = {}

    def log_metric(self, name: str, value: float) -> None:
        record = {
            "step": self.step,
            "name": name,
            "value": float(value),
            "time": time.time(),
        }
        self._file.write(json.dumps(record) + "\n")
        self._latest[name] = float(value)

    def next_step(self) -> None:
        self._file.flush()
        (self.directory / "metrics.json").write_text(
            json.dumps({"step": self.step, **self._latest}, indent=2)
        )
        self.step += 1

    def close(self) -> None:
        self._file.close()
