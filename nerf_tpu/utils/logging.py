"""Logging + timing + profiling utilities.

Reference parity: tinylogger timestamped info/warning lines
(include/nerf-cuda/common.h:19, used throughout nerf_render.cu) and the
`clock()` per-frame wall timing of src/main.cu:159-164, upgraded with
structured per-phase timers and optional `jax.profiler` traces — the
observability layer the reference lacks (SURVEY.md section 5).
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

_log = logging.getLogger("nerf_tpu")
if not _log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s  %(levelname)-7s %(name)s: %(message)s",
        datefmt="%H:%M:%S"))
    _log.addHandler(_h)
    _log.setLevel(logging.INFO)


def info(msg: str, *args) -> None:
    _log.info(msg, *args)


def warning(msg: str, *args) -> None:
    _log.warning(msg, *args)


class PhaseTimers:
    """Accumulating named wall-clock timers (blocks on device results)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"{name}: {total * 1000:.1f} ms total, "
                         f"{total / n * 1000:.2f} ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace wrapper; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
