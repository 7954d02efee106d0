"""Structured metrics logging (JSONL + console).

The reference logs through a tqdm postfix dict and prints (SURVEY §5.5,
train.py:405,577-584). This logger keeps that console ergonomics and adds a
machine-readable JSONL stream for dashboards/regression tracking.
"""

from __future__ import annotations

import json
import os
import sys
import time


class MetricsLogger:
    """Append-only JSONL metrics + compact console lines."""

    def __init__(self, log_dir: str | None = None, name: str = "train",
                 stream=None):
        self.stream = stream if stream is not None else sys.stdout
        self._file = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(
                os.path.join(log_dir, f"{name}_metrics.jsonl"), "a"
            )
        self._t0 = time.time()

    def log(self, step: int, **metrics) -> None:
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        parts = [f"step {rec['step']:>7}"]
        for k, v in rec.items():
            if k in ("step", "t"):
                continue
            parts.append(
                f"{k} {v:.5f}" if isinstance(v, float) else f"{k} {v}"
            )
        print("  ".join(parts), file=self.stream)

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
