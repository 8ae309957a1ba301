"""Diagnostic wall timers between stage boundaries.

Printed only when SPARK_GRAFT_STAGE_TIMERS=1 — perf triage on a noisy
shared host: attributes pipeline wall time to the docs-materialize
action vs the eager linking/CC work inside graph construction.
Off by default; zero overhead beyond one getenv per mark.
"""

from __future__ import annotations

import os
import time

_STAGE_T0: list[float] = [0.0]


def stage_mark(label: str | None) -> None:
    """Print seconds since the previous mark; ``None`` resets."""
    if os.environ.get("SPARK_GRAFT_STAGE_TIMERS") != "1":
        return
    now = time.perf_counter()
    if label is not None:
        print(f"[stage-timer] {label}: {now - _STAGE_T0[0]:.2f}s",
              flush=True)
    _STAGE_T0[0] = now
