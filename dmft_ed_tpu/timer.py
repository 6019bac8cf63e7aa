"""Wall-clock phase timers (SF_TIMER equivalent: start_timer/stop_timer/eta
used around every expensive phase, e.g. ED_DIAG.f90:64,250)."""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, Optional


class Timers:
    """Accumulating named timers + optional progress 'eta' lines."""

    def __init__(self, log=None):
        self.log = log
        self.acc: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def __call__(self, name: str, announce: bool = False):
        if announce and self.log:
            self.log(f"{name} ...")
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.acc[name] = self.acc.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            if announce and self.log:
                self.log(f"{name} done in {dt:.3f}s")

    def snapshot(self) -> Dict[str, float]:
        """Copy of the accumulated seconds per stage (for per-iteration
        deltas in benches — bench_e2e.py's stage table)."""
        return dict(self.acc)

    def eta(self, i: int, n: int, t_start: float) -> str:
        """Progress line like SF_TIMER's eta (ED_DIAG.f90:131)."""
        el = time.time() - t_start
        rem = el / max(i, 1) * (n - i)
        return f"{i}/{n} elapsed {el:.1f}s eta {rem:.1f}s"

    def report(self) -> str:
        lines = ["timing summary:"]
        for k in sorted(self.acc, key=lambda k: -self.acc[k]):
            lines.append(f"  {k:<28s} {self.acc[k]:9.3f}s "
                         f"({self.counts[k]} calls)")
        return "\n".join(lines)
