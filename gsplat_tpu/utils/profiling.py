"""Tracing / profiling hooks (capability extension — the reference has none
beyond a wall-clock progress bar, SURVEY §5)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimers:
    """Per-stage wall-clock accumulation with block-until-ready semantics."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(
                f"{name:24s} {tot:8.3f}s total  {1e3 * tot / max(n, 1):8.2f}ms/call  x{n}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace wrapper: view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
