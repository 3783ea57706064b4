"""Phase timers and solver telemetry.

The reference's only progress reporting is a tqdm bar around the cell loop
(``hmm.py:310``) and error-level logs on solver failure (``hmm.py:427-430,
485-488``).  Here: lightweight wall-clock phase timers plus an optional
jax.profiler trace context for TPU-level analysis.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict

logger = logging.getLogger("hommx_tpu")

__all__ = ["PhaseTimer", "trace"]


class PhaseTimer:
    """Accumulates wall-clock per named phase; prints a summary table."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [
            f"  {name:<24s} {dt:8.3f}s  {100 * dt / total:5.1f}%"
            for name, dt in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(dirname: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
