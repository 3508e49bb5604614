"""Profiling/tracing — replaces the reference's wall-clock prints
(models.py:1546,1611-1612; img_utils.py:93,116) with jax.profiler traces and
structured stage timers."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["StageTimer", "trace", "mpix_per_s"]


class StageTimer:
    """Accumulating wall-clock stage timer.

    >>> t = StageTimer()
    >>> with t("decode"): ...
    >>> t.report()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[stage] += time.perf_counter() - t0
            self.counts[stage] += 1

    def report(self) -> str:
        lines = [
            f"{k}: {self.totals[k]:.3f}s / {self.counts[k]}x "
            f"({1e3 * self.totals[k] / max(self.counts[k], 1):.1f} ms avg)"
            for k in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/iek_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def mpix_per_s(n_pixels: int, seconds: float) -> float:
    return n_pixels / seconds / 1e6
