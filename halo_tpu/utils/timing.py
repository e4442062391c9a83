"""Per-phase prover timing (the reference's round-breakdown observability).

The reference logs each prover round's wall-clock and a percentage
breakdown via log::debug (crates/plonk/src/plonk/protocol.rs:74,108-109,
117-118,164-165,267-268,332-352); the thesis derived its bottleneck
analysis from that report.  This is the equivalent: wrap phases in
`with timer.round("name"):` and one DEBUG line is emitted per round plus a
summary with phase fractions.

Enabled when the HALO_TPU_TIMING env var is truthy or the
`halo_tpu.timing` logger is at DEBUG; otherwise near-zero overhead.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager

logger = logging.getLogger("halo_tpu.timing")


def _enabled() -> bool:
    return bool(os.environ.get("HALO_TPU_TIMING")) or logger.isEnabledFor(logging.DEBUG)


class RoundTimer:
    """Accumulates named phase durations; logs one line per round and a
    fraction summary at report()."""

    def __init__(self, label: str):
        self.label = label
        self.enabled = _enabled()
        self.rounds: list[tuple[str, float]] = []
        self._t0 = time.perf_counter()

    @contextmanager
    def round(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.rounds.append((name, dt))
            self._log(f"{self.label}: {name}: {dt:.3f}s")

    def mark(self, name: str) -> None:
        """Record the time since the previous mark (or construction) as
        phase `name` — for straight-line code where a with-block per round
        would obscure the protocol structure."""
        if not self.enabled:
            return
        now = time.perf_counter()
        prev = self._t0 + sum(dt for _, dt in self.rounds)
        self.rounds.append((name, now - prev))
        self._log(f"{self.label}: {name}: {self.rounds[-1][1]:.3f}s")

    def report(self) -> str:
        if not self.enabled:
            return ""
        total = time.perf_counter() - self._t0
        parts = ", ".join(
            f"{name} {dt:.2f}s ({100 * dt / total:.0f}%)" for name, dt in self.rounds
        )
        line = f"{self.label}: total {total:.3f}s [{parts}]"
        self._log(line)
        return line

    def _log(self, line: str) -> None:
        if os.environ.get("HALO_TPU_TIMING"):
            print(f"[timing] {line}", flush=True)
        logger.debug(line)
