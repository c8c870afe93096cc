"""Bounded session caching for lazy query functions.

Query-registry functions return LAZY DataFrames — the consuming action
belongs to the caller (driver, bench, a user), so a function that
persists an intermediate cannot unpersist it in a ``finally`` the way a
streaming job does. Left alone, those persists accumulate across a
multi-query session (the r8 ADVICE leak: every span query pinned a new
posting relation).

``one_slot_persist`` bounds that growth by construction: each named
slot holds AT MOST ONE persisted relation, and persisting into a slot
releases its predecessor first. Session-wide cache held by this module
is therefore bounded by the number of slots (a small static set of
call sites), not by the number of queries run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}


def one_slot_persist(df: DataFrame, slot: str = "default") -> DataFrame:
    """Persist ``df``, releasing whatever the named slot held before."""
    prev = _SLOTS.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # a stopped session must not fail the new query
    out = df.persist()
    _SLOTS[slot] = out
    return out
