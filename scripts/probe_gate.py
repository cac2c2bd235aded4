"""Shared throttle gate for the scale-probe scripts.

VERDICT r04 "What's wrong" §3: probe rows recorded across throttle
epochs are internally inconsistent (a corpus-only pass timed SLOWER
than the composed superset run) and a reader cannot distinguish that
from a plan problem. The graded bench already runs every measurement
behind bench.ThrottleGate; the probes reuse the SAME gate so their
rows carry the same clean-slot discipline, and each probe row records
the accumulated gate wait (``gate_wait_sec``) so residual noise is
self-identifying instead of silent.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ThrottleGate


def make_gate(budget_s: float = 2400.0, procs: int = 16) -> ThrottleGate:
    """One gate per probe run; budget bounds total time spent waiting
    for clean slots (measurements, not probes, are the product)."""
    return ThrottleGate(probe_procs=procs, budget_s=budget_s, t_start=time.time())


def gated(gate: ThrottleGate, fn):
    """Wait for a clean measurement slot, run ``fn``, return
    (result, seconds). The gate only delays; it never changes what is
    measured."""
    gate.wait_clean_slot(max_wait=120.0)
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)
