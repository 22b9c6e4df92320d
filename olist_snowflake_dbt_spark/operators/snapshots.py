"""SCD-2 snapshots (SURVEY.md §2 B2): ``timestamp`` and ``check`` strategies.

Semantics ported from dbt's snapshot materialization (global macros/
materializations/snapshots/strategies.sql:53 ``timestamp``, :142 ``check``):
maintain a slowly-changing-dimension type-2 history table with
``dbt_valid_from`` / ``dbt_valid_to`` (NULL = current) and a change id.

Implementation is the classic hash-diff + union rewrite:
1. open rows  = snapshot WHERE valid_to IS NULL
2. changed    = source ⋈ open rows where the strategy says "row changed"
                (timestamp: source.updated_at > open.updated_at;
                 check: any tracked column differs, NULL-safe)
3. new keys   = source ANTI JOIN open rows
4. result     = closed-history ∪ (open rows, closing changed ones with
                valid_to = source's new valid_from) ∪ inserts

All joins are key-equi joins → one shuffle by key (AQE broadcast when the
source batch is small). No driver-side state; scales with the snapshot
size. ``snapshot_time`` is an explicit parameter — determinism over
wall-clock, and what a backfill pipeline needs anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META = ("dbt_scd_id", "dbt_valid_from", "dbt_valid_to")


def _scd_id(key_cols: Sequence[str], valid_from_col, prefix: str = "") -> F.Column:
    return F.md5(
        F.concat_ws("|", *[F.col(f"{prefix}{k}").cast("string") for k in key_cols],
                    valid_from_col.cast("string"))
    )


def snapshot_init(source: DataFrame, key: Sequence[str], valid_from) -> DataFrame:
    """First snapshot: every source row becomes an open SCD-2 row."""
    vf = F.col(valid_from) if isinstance(valid_from, str) else valid_from
    return source.select(
        "*",
        _scd_id(key, vf).alias("dbt_scd_id"),
        vf.cast("timestamp").alias("dbt_valid_from"),
        F.lit(None).cast("timestamp").alias("dbt_valid_to"),
    )


def snapshot_apply(
    snap: DataFrame,
    source: DataFrame,
    key: Sequence[str],
    strategy: str = "timestamp",
    updated_at: str | None = None,
    check_cols: Sequence[str] | None = None,
    snapshot_time=None,
    hard_deletes: str = "ignore",
) -> DataFrame:
    """Advance an SCD-2 snapshot with a new source batch.

    ``timestamp`` strategy requires ``updated_at`` (change detected when the
    source row's timestamp is newer); ``check`` requires ``check_cols``
    (change when any tracked column differs, NULL-safe) and uses
    ``snapshot_time`` (or ``updated_at``) as the new valid_from.

    ``hard_deletes`` mirrors dbt's snapshot config (dbt 1.9
    ``hard_deletes:``; legacy ``invalidate_hard_deletes=True`` ==
    ``invalidate``): keys that vanished from the source are

    - ``ignore`` (default): left open — a missing key is not evidence of
      deletion (dbt's historical default);
    - ``invalidate``: their open row is CLOSED with ``dbt_valid_to =
      snapshot_time`` (requires ``snapshot_time``);
    - ``new_record``: closed as above PLUS a tombstone version inserted
      with ``dbt_is_deleted = true`` and an open validity window, so
      downstream as-of joins resolve post-deletion facts to an explicit
      deleted marker instead of the stale last version. The output gains
      a ``dbt_is_deleted`` boolean column (false for every live row).

    Deletion detection adds NO extra join or shuffle — it is one more
    filter branch over the same full-outer join the strategies already
    share, so the plan shape (one key-equi shuffle, AQE-broadcastable)
    is unchanged at any scale.
    """
    if hard_deletes not in ("ignore", "invalidate", "new_record"):
        raise ValueError(f"unknown hard_deletes mode: {hard_deletes!r}")
    if hard_deletes != "ignore" and snapshot_time is None:
        raise ValueError(f"hard_deletes={hard_deletes!r} requires snapshot_time")
    if strategy == "timestamp":
        if updated_at is None:
            raise ValueError("timestamp strategy requires updated_at")
        new_vf = F.col(f"src.{updated_at}")
    elif strategy == "check":
        if not check_cols:
            raise ValueError("check strategy requires check_cols")
        if snapshot_time is None and updated_at is None:
            raise ValueError("check strategy requires snapshot_time or updated_at")
        new_vf = (
            F.col(f"src.{updated_at}") if updated_at else F.lit(snapshot_time).cast("timestamp")
        )
    else:
        raise ValueError(f"unknown snapshot strategy: {strategy!r}")

    data_cols = [c for c in snap.columns if c not in META]
    closed = snap.filter(F.col("dbt_valid_to").isNotNull())
    open_rows = snap.filter(F.col("dbt_valid_to").isNull())

    src = source.alias("src")
    cur = open_rows.alias("cur")
    key_cond = [F.col(f"src.{k}").eqNullSafe(F.col(f"cur.{k}")) for k in key]
    joined = src.join(cur, on=key_cond, how="full_outer")

    in_src = F.col(f"src.{key[0]}").isNotNull()
    in_cur = F.col(f"cur.{key[0]}").isNotNull()
    if strategy == "timestamp":
        # coalesce to False: a NULL timestamp on either side would make
        # the comparison NULL, and a NULL row_changed drops the key from
        # BOTH the surviving and inserts branches below — silent data
        # loss. NULL-timestamped rows are treated as "not changed",
        # matching dbt's conservative behavior.
        row_changed = F.coalesce(
            F.col(f"src.{updated_at}") > F.col(f"cur.{updated_at}"), F.lit(False)
        )
    else:
        row_changed = ~F.expr(
            " AND ".join(f"src.{c} <=> cur.{c}" for c in check_cols)
        )

    # keys gone from the source: only a "deletion" when configured; an
    # already-tombstoned open row (dbt_is_deleted) is not deleted AGAIN
    # on later runs, and a key that REAPPEARS always closes its tombstone
    # and inserts a fresh live version (revive), even if the payload is
    # byte-identical to the pre-deletion one.
    cur_tomb = (
        F.coalesce(F.col("cur.dbt_is_deleted"), F.lit(False))
        if "dbt_is_deleted" in snap.columns
        else F.lit(False)
    )
    if hard_deletes != "ignore":
        is_deleted = in_cur & ~in_src & ~cur_tomb
        row_changed = row_changed | (in_src & cur_tomb)
    else:
        is_deleted = F.lit(False)

    # open rows that close this round (changed) keep cur.* but gain valid_to
    closing = joined.filter(in_src & in_cur & row_changed).select(
        *[F.col(f"cur.{c}").alias(c) for c in data_cols],
        F.col("cur.dbt_scd_id").alias("dbt_scd_id"),
        F.col("cur.dbt_valid_from").alias("dbt_valid_from"),
        new_vf.cast("timestamp").alias("dbt_valid_to"),
    )
    # open rows that survive unchanged (or whose key left the source —
    # dbt keeps them open unless hard-deletes are configured)
    surviving = joined.filter(in_cur & ~(in_src & row_changed) & ~is_deleted).select(
        *[F.col(f"cur.{c}").alias(c) for c in data_cols],
        F.col("cur.dbt_scd_id").alias("dbt_scd_id"),
        F.col("cur.dbt_valid_from").alias("dbt_valid_from"),
        F.col("cur.dbt_valid_to").alias("dbt_valid_to"),
    )
    # inserts: brand-new keys + the new version of changed rows. A
    # live source batch has no dbt_is_deleted column even when the
    # snapshot already carries one (new_record mode) — fresh versions
    # are live by definition.
    def _src_col(c):
        if c == "dbt_is_deleted" and c not in source.columns:
            return F.lit(False).alias(c)
        return F.col(f"src.{c}").alias(c)

    inserts = joined.filter(in_src & (~in_cur | row_changed)).select(
        *[_src_col(c) for c in data_cols],
        _scd_id(key, new_vf, prefix="src.").alias("dbt_scd_id"),
        new_vf.cast("timestamp").alias("dbt_valid_from"),
        F.lit(None).cast("timestamp").alias("dbt_valid_to"),
    )
    out = closed.unionByName(closing).unionByName(surviving).unionByName(inserts)
    if hard_deletes == "ignore":
        return out
    del_vt = F.lit(snapshot_time).cast("timestamp")
    invalidated = joined.filter(is_deleted).select(
        *[F.col(f"cur.{c}").alias(c) for c in data_cols],
        F.col("cur.dbt_scd_id").alias("dbt_scd_id"),
        F.col("cur.dbt_valid_from").alias("dbt_valid_from"),
        del_vt.alias("dbt_valid_to"),
    )
    out = out.unionByName(invalidated)
    if hard_deletes == "invalidate":
        return out
    # new_record: also insert an OPEN tombstone version carrying the last
    # payload, flagged dbt_is_deleted — the whole table gains the flag.
    had_flag = "dbt_is_deleted" in data_cols
    if not had_flag:
        out = out.withColumn("dbt_is_deleted", F.lit(False))
    tombstones = joined.filter(is_deleted).select(
        *[F.col(f"cur.{c}").alias(c) for c in data_cols],
        _scd_id(key, del_vt, prefix="cur.").alias("dbt_scd_id"),
        del_vt.alias("dbt_valid_from"),
        F.lit(None).cast("timestamp").alias("dbt_valid_to"),
    )
    tombstones = tombstones.withColumn("dbt_is_deleted", F.lit(True))
    return out.unionByName(tombstones)


def scd2_resolve_asof(
    facts: DataFrame,
    snap: DataFrame,
    key: Sequence[str],
    fact_ts: str,
    payload_cols: Sequence[str],
    dim_order: str | None = None,
) -> DataFrame:
    """Resolve each fact row to the SCD-2 dimension version valid at the
    fact's event time — the consumption side of the snapshot operators
    (dbt builds snapshots; every mart that joins one does THIS).

    Semantically ``facts LEFT JOIN snap ON key AND fact_ts >=
    dbt_valid_from AND (fact_ts < dbt_valid_to OR dbt_valid_to IS
    NULL)`` — half-open ``[valid_from, next valid_from)`` intervals, so
    a fact landing exactly on a version boundary matches ONLY the newer
    version (an inclusive BETWEEN would double-match it). Executed as
    the union-then-window AS-OF plan (tag dim versions and facts, one window per key
    ordered by (ts, side), carry the last version struct forward): ONE
    shuffle on the key, where the inequality join would either fall to
    a broadcast-nested-loop or explode hot keys quadratically. Facts
    before the key's first version resolve to NULLs (left semantics).

    Assumes contiguous version history (each ``dbt_valid_to`` equals
    the next version's ``dbt_valid_from``; NULL = current) — which the
    snapshot_apply/snapshot_init operators guarantee; ``dim_order``
    breaks ties when two versions share a valid_from (the later one
    under that ordering wins, matching the interval join which excludes
    the zero-width version).

    Fact columns pass through untouched; the resolved version arrives
    as ``dbt_valid_from`` plus ``payload_cols``.
    """
    pk = list(key)
    dim_payload = F.struct(
        F.col("dbt_valid_from").alias("dbt_valid_from"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    tie = (
        F.col(dim_order).cast("long") if dim_order else F.lit(0).cast("long")
    )
    dim = snap.select(
        *pk,
        F.col("dbt_valid_from").alias("__ts"),
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        dim_payload.alias("__dim"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{f.name}`:{f.dataType.simpleString()}"
                for f in facts.schema.fields
            ) + ">"
        ).alias("__fact"),
    )
    dim_type = dim.schema["__dim"].dataType
    fct = facts.select(
        *pk,
        F.col(fact_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(dim_type).alias("__dim"),
        F.struct(*[F.col(c) for c in facts.columns]).alias("__fact"),
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*pk)
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    resolved = (
        dim.unionByName(fct)
        .withColumn("__dim", F.last("__dim", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return resolved.select(
        *[F.col(f"__fact.{c}").alias(c) for c in facts.columns],
        F.col("__dim.dbt_valid_from").alias("dbt_valid_from"),
        *[F.col(f"__dim.{c}").alias(c) for c in payload_cols],
    )
