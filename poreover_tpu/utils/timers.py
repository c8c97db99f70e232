"""Per-stage wall-clock timers and throughput counters.

The reference has no profiling subsystem at all (SURVEY §5: its only
instrumentation is the accuracy `benchmark` subcommand); the TPU build
commits to per-stage timers plus cells/s counters so decode throughput is
observable in every run. Drivers accumulate into a module-level registry
and log one summary line per run; `jax.profiler` traces are handled by the
CLI `--profile` flag (cli.py).
"""
from __future__ import annotations

import logging
import time
from collections import defaultdict
from contextlib import contextmanager

log = logging.getLogger("poreover_tpu")


class StageTimers:
    """Accumulating named wall-clock timers with optional work counters."""

    def __init__(self):
        self.seconds: dict[str, float] = defaultdict(float)
        self.counts: dict[str, float] = defaultdict(float)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0

    def add_work(self, name: str, amount: float) -> None:
        """Record work units (e.g. envelope cells) attributed to a stage."""
        self.counts[name] += amount

    def reset(self) -> None:
        self.seconds.clear()
        self.counts.clear()

    def summary(self) -> str:
        parts = []
        for name in self.seconds:
            s = self.seconds[name]
            part = f"{name}={s:.2f}s"
            if self.counts.get(name):
                rate = self.counts[name] / max(s, 1e-9)
                if rate >= 1e6:
                    part += f" ({rate / 1e6:.2f}M cells/s)"
                else:
                    part += f" ({rate:.0f} cells/s)"
            parts.append(part)
        return " ".join(parts) if parts else "(no stages timed)"

    def log_summary(self, prefix: str = "stage timers") -> None:
        log.info("%s: %s", prefix, self.summary())


# module-level registry used by the decode/pair-decode drivers
timers = StageTimers()
