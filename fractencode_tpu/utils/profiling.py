"""Timing and tracing.

The reference has a wall-clock ``Frac::Timer`` around encode/decode
(``/root/reference/utils/timer.h:7-21``, printed by ``main.cpp:164-178``) and
nothing else.  Here: a phase-timing struct for structured per-stage numbers
plus a ``jax.profiler`` trace context for real device profiles.
"""
from __future__ import annotations

import contextlib
import time

__all__ = ["PhaseTimer", "device_trace"]


class PhaseTimer:
    """Accumulates named wall-clock phases; call ``block_until_ready`` on the
    phase's outputs before exiting the context for honest device timings."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{k}: {v * 1e3:.2f} ms" for k, v in self.phases.items()]
        lines.append(f"total: {total * 1e3:.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """``jax.profiler`` trace capture (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
