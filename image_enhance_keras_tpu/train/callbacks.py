"""Training observability — HistoryCheckpoint equivalent.

The reference persists the Keras history dict as ``str(dict)`` to a text file
every epoch (advanced.py:9-46, re-read via ``ast.literal_eval``).  We write
JSON (machine-readable, append-safe) with the same per-epoch cadence.
"""

from __future__ import annotations

import json
import os

__all__ = ["HistoryLogger"]


class HistoryLogger:
    def __init__(self, path: str):
        self.path = path
        self.history: dict[str, list] = {}
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    self.history = json.load(f)
            except (json.JSONDecodeError, OSError):
                self.history = {}

    def log_epoch(self, epoch: int, metrics: dict[str, float]) -> None:
        self.history.setdefault("epoch", []).append(epoch)
        for k, v in metrics.items():
            self.history.setdefault(k, []).append(v)
        with open(self.path, "w") as f:
            json.dump(self.history, f, indent=2)

    def as_dict(self) -> dict:
        return dict(self.history)
