"""Host-interference instrumentation for timing harnesses.

Wall-clock on a shared host cannot distinguish a real regression from
co-tenant CPU theft: three r13 scaling-probe points and five r13 driver-bench
deltas burned manual adjudication on exactly that. The counters here let
every timing artifact carry its own noise bound — the per-attempt co-tenant
steal share (/proc/stat field 8 delta over the attempt) and the 1-min
loadavg at attempt start.

An attempt whose steal share exceeds ``STEAL_MAX_PCT`` is *dirty*: harnesses
re-run it (bounded) and never report a dirty minimum while a clean attempt
exists. Our own Spark work inflates loadavg (local[32] legitimately drives
it past 8) but never the steal counter, so steal is the gate and loadavg is
context.
"""

from __future__ import annotations

import os
import time

# an attempt is contaminated when co-tenants stole > this share of the
# machine's CPU time during it
STEAL_MAX_PCT = 1.0


def steal_total() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat; (0, 1) when the file
    is unavailable (non-Linux), which renders every attempt clean."""
    try:
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 1


def loadavg1() -> float:
    try:
        return os.getloadavg()[0]
    except OSError:
        return 0.0


def timed_attempts(run, base_attempts: int = 2, max_attempts: int = 4) -> dict:
    """min-of-N-CLEAN harness: run ``run()`` ``base_attempts`` times (more,
    up to ``max_attempts``, while fewer than 2 attempts are clean). Returns
    {"t": best_clean_or_overall_seconds, "steal_pct", "load1" (of the best
    attempt), "dirty": no-clean-attempt, "n_attempts"}."""
    attempts = []
    while len(attempts) < max_attempts:
        load1 = loadavg1()
        s0, j0 = steal_total()
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        s1, j1 = steal_total()
        attempts.append(
            {
                "t": dt,
                "steal_pct": 100.0 * (s1 - s0) / max(1, j1 - j0),
                "load1": load1,
            }
        )
        clean = [a for a in attempts if a["steal_pct"] <= STEAL_MAX_PCT]
        if len(attempts) >= base_attempts and len(clean) >= min(2, base_attempts):
            break
    clean = [a for a in attempts if a["steal_pct"] <= STEAL_MAX_PCT]
    pool = clean or attempts
    best = min(pool, key=lambda a: a["t"])
    return {
        "t": best["t"],
        "steal_pct": round(best["steal_pct"], 2),
        "load1": round(best["load1"], 2),
        "dirty": not clean,
        "n_attempts": len(attempts),
    }
