"""Session-scoped registry for operator-persisted hub frames.

Several operators persist a slim intermediate ("hub") frame that the
RETURNED plan consumes through more than one branch (a census aggregate
plus its join-back probe, a pair frame read by three scorers, …). The
cache must stay alive until the CALLER's action on the returned frame
completes — Spark offers no consumption callback, so the operator
cannot unpersist before returning, and an unregistered ``persist()``
would otherwise live until ``clearCache()`` or session end (round-14
verdict: ``rank_fusion`` alone stacks N+1 cached frames per call).

This registry bounds that lifetime without changing any plan:

* operators persist through :func:`scoped_persist` (identical to
  ``DataFrame.persist()`` — same storage level, same plan — plus a
  bookkeeping entry keyed weakly by the owning SparkSession);
* callers that consume an operator's result in a long-lived session
  call :func:`release_operator_caches` to unpersist every registered
  frame at once (correctness is unaffected — an unpersisted frame
  recomputes through its lineage);
* benches/harnesses that already call ``spark.catalog.clearCache()``
  between queries need nothing: the registry is then just stale
  bookkeeping, and releasing is a no-op ``unpersist`` per frame.

The registry holds strong references to the registered DataFrames only
until released; the session key is weak, so a discarded session drops
its whole entry.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_REGISTRY: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + register the frame for later release.

    Returns the same DataFrame; plan and storage level are exactly what
    a bare ``persist()`` would produce (default MEMORY_AND_DISK_DESER).
    """
    out = df.persist() if storage_level is None else df.persist(storage_level)
    try:
        _REGISTRY.setdefault(df.sparkSession, []).append(out)
    except TypeError:
        # a session that cannot be weak-referenced (mock/test double):
        # fall back to plain persist semantics
        pass
    return out


def release_operator_caches(spark) -> int:
    """Unpersist every operator-registered frame for ``spark``.

    Call AFTER consuming the operator results (an action on a released
    frame silently recomputes — correct, just uncached). Returns the
    number of frames released. Safe to call any time, including after
    ``spark.catalog.clearCache()`` (unpersist of an uncached frame is a
    no-op).
    """
    frames = _REGISTRY.pop(spark, [])
    n = 0
    for f in frames:
        try:
            f.unpersist()
            n += 1
        except Exception:
            pass
    return n
