"""Session-scoped persist slots for operators that return lazy frames built
over an expensive intermediate.

An operator that branches over the same intermediate (both sides of a
self-join, a filter split whose halves are unioned back) must persist that
intermediate or every branch recomputes it — but the operator returns a lazy
frame, so it cannot unpersist before returning (the cache would be evicted
before the first action). The discipline used here (originally for the
packed-doc table of the bitmap similarity join): each named slot holds at most
one persisted frame per session; a new frame with identical semantics reuses
the warm cache, a different one evicts the predecessor. Storage accumulation
is bounded to one frame per slot.
"""

from __future__ import annotations

import logging

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)

_SLOTS: dict[str, DataFrame] = {}

# Pool membership is EXPLICIT (pool name -> {semantic_hash: frame}), never
# key-prefix matching: a pool whose name prefixes another ('training' vs
# 'training_corpus') must not scan or evict the other pool's pins, and named
# keep_persisted slots must never be counted against a pool's LRU budget.
_POOLS: dict[str, dict[int, DataFrame]] = {}


def keep_persisted(df: DataFrame, slot: str) -> DataFrame:
    """Persist ``df`` under ``slot``, reusing the previous persist when the
    plan is semantically identical (warm repeats) and evicting it when not."""
    prev = _SLOTS.get(slot)
    if prev is not None:
        try:
            if df.sameSemantics(prev):
                return prev
            prev.unpersist(blocking=False)
        except Exception:  # noqa: BLE001, S110 — prior session may be gone
            pass
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _SLOTS[slot] = df
    return df


def keep_persisted_pooled(
    df: DataFrame, pool: str, max_slots: int = 8, warn_on_evict: bool = False
) -> DataFrame:
    """:func:`keep_persisted` for slots keyed by PLAN (one slot per distinct
    semantic hash, e.g. the enumerate_rows ranged pins): a long session can
    enumerate many distinct frames, and unbounded per-plan slots would
    accumulate MEMORY_AND_DISK relations forever. The pool keeps at most
    ``max_slots`` frames per pool, LRU: reusing a slot refreshes it,
    inserting past the cap unpersists (non-blocking) and drops the
    least-recently-used one. Distinct frames enumerated concurrently within
    one operator call still each get their own pin (max_slots >= the operator
    fan-out), so the resample-desync protection is preserved; callers whose
    correctness DEPENDS on a pin staying alive until a deferred action runs
    (enumerate_rows_scalable) plumb their own ``max_slots`` sized to the
    number of frames they may hold open, and every eviction is logged so a
    desync would be diagnosable rather than silent."""
    slots = _POOLS.setdefault(pool, {})
    key = df.semanticHash()
    prev = slots.get(key)
    if prev is not None:
        try:
            if df.sameSemantics(prev):
                # refresh LRU position (dict preserves insertion order)
                slots[key] = slots.pop(key)
                return prev
            prev.unpersist(blocking=False)
        except Exception:  # noqa: BLE001, S110 — prior session may be gone
            pass
        slots.pop(key, None)
    while len(slots) >= max_slots:
        victim = next(iter(slots))  # least-recently-used
        evicted = slots.pop(victim)
        # routine LRU churn logs at DEBUG; callers whose correctness depends
        # on a pin outliving a deferred action (enumerate_rows_scalable's
        # range-boundary pins) pass warn_on_evict=True so THEIR evictions
        # stand out instead of drowning in benign pool turnover
        _log.log(
            logging.WARNING if warn_on_evict else logging.DEBUG,
            "session_cache pool %r evicting LRU pin %s (pool at cap %d)%s",
            pool, victim, max_slots,
            "; deferred actions on that frame will recompute un-pinned"
            if warn_on_evict else "",
        )
        try:
            evicted.unpersist(blocking=False)
        except Exception:  # noqa: BLE001, S110
            pass
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    slots[key] = df
    return df
