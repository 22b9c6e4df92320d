"""Snowflake→Spark migration SQL surface: the ordered/positional
aggregation idioms every warehouse migration hits on day one and that
neither the reference project nor the earlier breadth modules cover.

The reference executes on Snowflake (`$DBT/dbt_snowflake-1.11.2.dist-info`),
so a migrating user's model SQL is written in the Snowflake dialect.
Four staples with no literal Spark builtin are re-expressed here as
Catalyst-native plans (no UDF, no driver loop):

- ``LISTAGG(x, sep) WITHIN GROUP (ORDER BY k)`` → sort-struct collect +
  ``array_join`` (one hash-aggregate exchange; the ordering happens
  inside the aggregate buffer, never as a global sort).
- ``QUALIFY row_number() = 1`` (keep-latest dedup) → window + filter.
  Spark has no QUALIFY clause; the rewrite is the documented migration
  path and plans identically (one key-partitioned window, no extra
  exchange).
- ``LATERAL FLATTEN(input => arr)`` with ``INDEX`` → ``posexplode``.
  Executor-side fan-out: row count multiplies AFTER the scan, so the
  exchange (if any downstream) sees exploded rows but the scan stays
  columnar and pruned.
- deterministic discrete median / mode (``PERCENTILE_DISC`` /
  ``MODE``) → rank-against-count windows with a TOTAL tie-break order,
  because both engines' native ``mode()`` pick ties arbitrarily — an
  oracle-hash trap this module sidesteps by construction.

100-TB notes: listagg groups are bounded by order size (≤7 lineitems),
so no group buffer can blow up; qualify/median/mode windows partition by
the grouping key — per-partition state is O(group), and AQE handles key
skew. FLATTEN multiplies rows 5× at most here; at scale, cap the slice
(as done) or explode-then-filter never the reverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .queries import _t, query


@query(
    "listagg_within_group",
    """
    SELECT l_orderkey,
           string_agg(l_returnflag, ',' ORDER BY l_linenumber, l_returnflag)
               AS flags_csv,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_orderkey % 8 = 0
    GROUP BY l_orderkey
    """,
)
def q_listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake ``LISTAGG(...) WITHIN GROUP (ORDER BY ...)``.

    Spark has no ordered string aggregate; the idiomatic plan is
    collect_list of (order-key, value) structs, ``array_sort`` (struct
    comparison orders lexicographically by (l_linenumber, value) — the
    value tie-break makes the order TOTAL even where the synthetic data
    repeats a linenumber within an order; the oracle orders by the same
    pair), then project+join. Everything runs inside one hash
    aggregate; no global sort, no window.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 8 == 0)
    pair = F.struct(
        F.col("l_linenumber").alias("o"), F.col("l_returnflag").alias("v")
    )
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(pair)), lambda s: s["v"]
            ),
            ",",
        ).alias("flags_csv"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "qualify_keep_latest",
    """
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_event_type,
           value AS last_value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q_qualify_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake/DuckDB ``QUALIFY row_number() = 1`` — the keep-latest
    dedup every CDC/staging model uses. Spark lacks QUALIFY; the
    standard rewrite is window + filter, which Catalyst plans as ONE
    exchange on user_id + an in-partition sort (the same physical plan
    QUALIFY compiles to). Tie-break is total (ts, then unique event_id),
    so the survivor is deterministic across partitionings.
    """
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


@query(
    "flatten_with_ordinality",
    """
    SELECT doc_id, i AS pos, arr[i] AS word
    FROM (
        SELECT doc_id, string_split(text, ' ') AS arr FROM documents
        WHERE doc_id % 16 = 0
    ) t, LATERAL (SELECT unnest(range(1, least(len(arr), 5) + 1)) AS i)
    """,
)
def q_flatten_with_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake ``LATERAL FLATTEN(input => arr)`` with its ``INDEX``
    column → ``posexplode``. The fan-out happens executor-side after a
    pruned scan (ReadSchema: doc_id, text only); the slice cap (first 5
    words) bounds the multiplier, the pattern a 100-TB tokenization
    fan-out needs to state explicitly. 1-based pos matches FLATTEN's
    INDEX+1 convention used by the DuckDB twin's list indexing.
    """
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 16 == 0)
    arr = F.slice(F.split(F.col("text"), " "), 1, 5)
    return d.select(
        "doc_id", F.posexplode(arr).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")


@query(
    "median_mode_disc",
    """
    WITH ranked AS (
        SELECT event_type, value, event_id,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    pct AS (
        SELECT event_type,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN value END)
                   AS median_value,
               MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN value END)
                   AS p90_value
        FROM ranked GROUP BY event_type
    ),
    freq AS (
        SELECT event_type, value, COUNT(*) AS cnt
        FROM events GROUP BY event_type, value
    ),
    md AS (
        SELECT event_type, value AS mode_value
        FROM freq
        QUALIFY row_number() OVER (
            PARTITION BY event_type ORDER BY cnt DESC, value ASC) = 1
    )
    SELECT pct.event_type, pct.median_value, pct.p90_value, md.mode_value
    FROM pct JOIN md USING (event_type)
    """,
)
def q_median_mode_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ``PERCENTILE_DISC(0.5/0.9)`` and ``MODE()``.

    Native ``mode()`` on BOTH engines breaks ties arbitrarily and
    ``quantile_disc`` definitions differ at even counts — so the
    discrete statistics are pinned by construction: rank every row with
    a TOTAL order (value, then unique event_id) and pick the
    lower-median rank (n+1)//2 and rank ceil(0.9n); mode = highest
    count, ties to the smallest value. Identical formulas both sides ⇒
    hash-exact. Plan shape (audited): the percentile branch is ONE
    ranked window pass folded by a conditional aggregate — no
    med/p90 self-joins (the filter-then-join formulation costs two
    extra exchanges; this is the plan you'd want at 100x); the mode
    branch is a pre-aggregated (event_type,value) rollup — tiny.
    """
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    wn = W.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pct = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == ((F.col("n") + 1) / 2).cast("bigint"),
                F.col("value"),
            )
        ).alias("median_value"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.9) * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("p90_value"),
    )
    freq = e.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("cnt"))
    wm = W.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("value").asc()
    )
    md = (
        freq.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("value").alias("mode_value"))
    )
    return pct.join(md, "event_type")


@query(
    "incremental_merge_update_columns",
    """
    WITH existing AS (
        SELECT user_id, value, first_seen FROM (
            SELECT user_id, value,
                   MIN(ts) OVER (PARTITION BY user_id) AS first_seen,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '2024-06-01'
        ) WHERE rn = 1
    ),
    batch AS (
        SELECT user_id, value, first_seen FROM (
            SELECT user_id, value,
                   MIN(ts) OVER (PARTITION BY user_id) AS first_seen,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '2024-06-01'
        ) WHERE rn = 1
    )
    SELECT e.user_id,
           CASE WHEN b.user_id IS NOT NULL THEN b.value ELSE e.value END
               AS value,
           e.first_seen
    FROM existing e LEFT JOIN batch b ON e.user_id = b.user_id
    UNION ALL
    SELECT b.user_id, b.value, b.first_seen
    FROM batch b
    WHERE b.user_id NOT IN (SELECT user_id FROM existing)
    """,
)
def q_incremental_merge_update_columns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dbt ``merge_update_columns`` (dbt-adapters get_merge_update_columns
    / merge.sql WHEN MATCHED column list): the per-user latest-state
    table upserted with a newer batch where MATCHED rows update ONLY
    ``value`` — the audit column ``first_seen`` keeps its original
    (pre-cutoff) timestamp, the canonical created_at-preservation shape.
    New users insert all columns. The oracle replays the matched/
    unmatched split with an explicit match flag, so an accidental
    full-row replace (first_seen drift) cannot hash-match."""
    from .operators.incremental import incremental_merge

    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    cutoff = F.lit("2024-06-01").cast("timestamp")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest_state(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("first_seen", F.min("ts").over(W.partitionBy("user_id")))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("user_id", "value", "first_seen")
        )

    existing = latest_state(e.filter(F.col("ts") < cutoff))
    batch = latest_state(e.filter(F.col("ts") >= cutoff))
    return incremental_merge(
        existing, batch, ["user_id"], merge_update_columns=["value"]
    )


@query(
    "object_agg_canonical",
    """
    WITH cnts AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           '{' || string_agg('"' || o_orderstatus || '":' || CAST(cnt AS VARCHAR),
                             ',' ORDER BY o_orderstatus) || '}'
               AS status_counts_json,
           COUNT(*) AS n_statuses
    FROM cnts GROUP BY 1
    """,
)
def q_object_agg_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake ``OBJECT_AGG(key, value)`` — per-group key→value maps.

    Spark CAN build a MapType (map_from_entries), but map cells are
    unhashable through the driver's pandas compare and map key order is
    engine-defined — so the canonical form here (and the documented
    contract for parity) is the SORTED-KEY JSON string, built with the
    same concat/sort pipeline on both engines. Construction is a
    two-level aggregate: count to (group, key) grain first (map-side
    combinable), then fold the small per-group key set into the object —
    the grain that keeps aggregate buffers bounded by key cardinality,
    not row count."""
    o = _t(spark, sf_dir, "orders")
    cnts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    kv = F.struct(
        F.col("o_orderstatus").alias("k"),
        F.concat(
            F.lit('"'), F.col("o_orderstatus"), F.lit('":'),
            F.col("cnt").cast("string"),
        ).alias("s"),
    )
    return cnts.groupBy("o_orderpriority").agg(
        F.concat(
            F.lit("{"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kv)), lambda e: e["s"]),
                ",",
            ),
            F.lit("}"),
        ).alias("status_counts_json"),
        F.count(F.lit(1)).alias("n_statuses"),
    )


@query(
    "dbt_utils_surrogate_key",
    """
    SELECT o_orderkey,
           md5(concat_ws('-',
               coalesce(CAST(o_custkey AS VARCHAR),
                        '_dbt_utils_surrogate_key_null_'),
               coalesce(NULLIF(o_orderstatus, 'F'),
                        '_dbt_utils_surrogate_key_null_'),
               coalesce(CAST(o_orderdate AS VARCHAR),
                        '_dbt_utils_surrogate_key_null_')))
               AS surrogate_key
    FROM orders
    WHERE o_orderkey % 4 = 0
    """,
)
def q_dbt_utils_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-utils ``generate_surrogate_key`` (functions/dbt_utils.py):
    md5 over '-'-joined stringified columns with the dbt-utils NULL
    sentinel — byte-compatible with keys minted by real dbt-utils
    projects (the NULLIF branch exercises the sentinel path on both
    engines). Map-only, codegen'd, zero shuffle."""
    from .functions.dbt_utils import generate_surrogate_key

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 4 == 0)
    return o.select(
        "o_orderkey",
        generate_surrogate_key(
            [
                F.col("o_custkey"),
                F.expr("nullif(o_orderstatus, 'F')"),
                F.col("o_orderdate"),
            ]
        ).alias("surrogate_key"),
    )


@query(
    "string_predicates_breadth",
    """
    SELECT o_orderkey,
           split_part(o_orderpriority, '-', 1) AS prio_code,
           split_part(o_orderpriority, '-', 2) AS prio_name,
           (o_orderpriority ILIKE '%urgent%') AS is_urgent_ilike,
           translate(o_orderstatus, 'OFP', 'ofp') AS status_translated,
           lpad(CAST(o_custkey AS VARCHAR), 10, '0') AS custkey_padded,
           repeat(o_orderstatus, 3) AS status_x3
    FROM orders
    WHERE o_orderkey % 16 = 0
    """,
)
def q_string_predicates_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake string-function parity in one row: ``SPLIT_PART``
    (1-based, Spark 3.5+ builtin), ``ILIKE`` (case-insensitive LIKE),
    ``TRANSLATE``, ``LPAD``, ``REPEAT`` — the rename-level functions a
    migration hits constantly. All map-only codegen expressions; the
    value is the pinned cross-engine semantics (1-based part indexing,
    ILIKE on mixed-case input, translate's char-for-char map)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 16 == 0)
    return o.select(
        "o_orderkey",
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1)).alias(
            "prio_code"
        ),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(2)).alias(
            "prio_name"
        ),
        F.expr("o_orderpriority ILIKE '%urgent%'").alias("is_urgent_ilike"),
        F.translate(F.col("o_orderstatus"), "OFP", "ofp").alias(
            "status_translated"
        ),
        F.lpad(F.col("o_custkey").cast("string"), 10, "0").alias(
            "custkey_padded"
        ),
        F.repeat(F.col("o_orderstatus"), 3).alias("status_x3"),
    )


@query(
    "groupby_all_exclude",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS DOUBLE) AS total_price
    FROM (SELECT * EXCLUDE (o_orderkey, o_custkey, o_orderdate)
          FROM orders)
    GROUP BY ALL
    """,
)
def q_groupby_all_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake/DuckDB ``GROUP BY ALL`` + ``SELECT * EXCLUDE`` — the
    two ergonomic SQL idioms every warehouse migration hits first.
    Spark 4 spells them ``GROUP BY ALL`` (identical: group on every
    non-aggregate select item) and ``SELECT * EXCEPT (...)`` (DuckDB's
    EXCLUDE); the projection narrowing happens in the analyzer, so the
    scan still prunes to the 3 surviving columns — the idiom costs
    nothing at 100 TB. Exact DECIMAL money math on both engines."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__gba_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS DOUBLE) AS total_price
        FROM (SELECT * EXCEPT (o_orderkey, o_custkey, o_orderdate)
              FROM __gba_orders)
        GROUP BY ALL
        """
    )


# ---------------------------------------------------------------------
# MATCH_RECOGNIZE (row-pattern matching) — Snowflake/ISO SQL:2016
# ---------------------------------------------------------------------

_MATCH_RECOGNIZE_ORACLE = """
-- Replays PATTERN (S C+ P) / AFTER MATCH SKIP PAST LAST ROW with
-- gaps-and-islands SQL. Sound here BECAUSE the defines are mutually
-- exclusive event types: every candidate (signup, maximal click run,
-- purchase right after it) is a realized greedy match, matches start
-- at signup rows which can never sit inside another match, so the
-- candidate set IS the non-overlapping leftmost match set.
WITH e AS (
    SELECT user_id, event_type, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
),
click_runs AS (
    SELECT user_id, MIN(rn) AS run_start, MAX(rn) AS run_end,
           COUNT(*) AS n_clicks,
           SUM(CAST(value AS DECIMAL(18,2))) AS click_sum
    FROM (
        SELECT user_id, rn, value,
               rn - ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY rn) AS grp
        FROM e WHERE event_type = 'click'
    )
    GROUP BY user_id, grp
),
matches AS (
    SELECT s.user_id, s.rn AS s_rn,
           r.n_clicks, r.click_sum,
           s.event_id AS signup_event_id,
           p.event_id AS purchase_event_id
    FROM e s
    JOIN click_runs r
      ON r.user_id = s.user_id AND r.run_start = s.rn + 1
    JOIN e p
      ON p.user_id = s.user_id AND p.rn = r.run_end + 1
     AND p.event_type = 'purchase'
    WHERE s.event_type = 'signup'
)
SELECT user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY s_rn)
            AS BIGINT) AS match_num,
       CAST(n_clicks + 2 AS BIGINT) AS n_rows,
       CAST(n_clicks AS BIGINT) AS n_clicks,
       signup_event_id, purchase_event_id,
       CAST(click_sum AS DOUBLE) AS click_value_sum
FROM matches
"""


@query("match_recognize_funnel", _MATCH_RECOGNIZE_ORACLE)
def q_match_recognize_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake ``MATCH_RECOGNIZE`` subset: strictly-CONSECUTIVE
    funnel sessions ``PATTERN (S C+ P)`` per user over the event
    sequence — signup, one-or-more clicks with nothing between, then a
    purchase — with SKIP PAST LAST ROW and measures (click count,
    bounding event ids, exact decimal click-value sum, presented as
    DOUBLE). Consecutiveness is what the window-based funnel_conversion
    query CANNOT express — this is the row-pattern operator's native
    ground (operators/match_recognize.py: classification bitmask in
    Catalyst, per-user NFA scan in one Arrow kernel, ONE shuffle).

    The SQL oracle replays the same matches with gaps-and-islands
    (valid because the defines are mutually exclusive — argument in the
    oracle header); the operator itself is strictly more general
    (overlapping DEFINEs + backtracking, pinned in
    tests/test_match_recognize.py)."""
    from .operators.match_recognize import match_recognize

    ev = _t(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = match_recognize(
        ev,
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern="S C+ P",
        define={
            "S": F.col("event_type") == "signup",
            "C": F.col("event_type") == "click",
            "P": F.col("event_type") == "purchase",
        },
        measures=[
            ("count", "C", "", "n_clicks"),
            ("first", "S", "event_id", "signup_event_id"),
            ("last", "P", "event_id", "purchase_event_id"),
            ("sum", "C", "value_dec", "click_value_sum"),
        ],
    )
    return out.select(
        "user_id",
        F.col("match_num").cast("long").alias("match_num"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_clicks").cast("long").alias("n_clicks"),
        "signup_event_id",
        "purchase_event_id",
        F.col("click_value_sum").cast("double").alias("click_value_sum"),
    )


_VSHAPE_ORACLE = """
-- Replays PATTERN (D+ U+) over the per-user value series (D: value <
-- PREV, U: value > PREV; ties classify as neither and break runs).
-- Sound for the same reason as the funnel oracle: D and U are mutually
-- exclusive, so greedy matches are exactly (maximal D run)(immediately
-- adjacent maximal U run) and can never overlap.
WITH e AS (
    SELECT user_id, value,
           ROW_NUMBER() OVER w AS rn,
           LAG(value) OVER w AS pv
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
c AS (
    SELECT user_id, rn, value,
           CASE WHEN pv IS NOT NULL AND value < pv THEN 'D'
                WHEN pv IS NOT NULL AND value > pv THEN 'U' END AS k
    FROM e
),
runs AS (
    SELECT user_id, k, MIN(rn) AS rs, MAX(rn) AS re,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS vmin, ARG_MAX(value, rn) AS vlast
    FROM (
        SELECT user_id, rn, value, k,
               rn - ROW_NUMBER() OVER (PARTITION BY user_id, k
                                       ORDER BY rn) AS grp
        FROM c WHERE k IS NOT NULL
    )
    GROUP BY user_id, k, grp
)
SELECT d.user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY d.user_id ORDER BY d.rs)
            AS BIGINT) AS match_num,
       d.n + u.n AS n_rows,
       d.n AS n_down, u.n AS n_up,
       LEAST(d.vmin, u.vmin) AS trough_value,
       u.vlast AS end_value
FROM runs d
JOIN runs u
  ON u.user_id = d.user_id AND u.k = 'U' AND u.rs = d.re + 1
WHERE d.k = 'D'
"""


@query("match_recognize_vshape", _VSHAPE_ORACLE)
def q_match_recognize_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER canonical MATCH_RECOGNIZE shape (Snowflake's own docs
    example): V-shaped excursions ``PATTERN (D+ U+)`` where DEFINE
    navigates with PREV — expressed the documented way, a window ``lag``
    column computed BEFORE the operator (same one-shuffle plan: the lag
    window and the match partition share the user_id hash). Strict
    down-run then up-run; ties break runs. Measures: leg lengths, the
    trough, and the recovery value — comparisons only, no float
    arithmetic, so doubles hash identically on both engines."""
    from .operators.match_recognize import match_recognize

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events").withColumn("pv", F.lag("value").over(w))
    out = match_recognize(
        ev,
        partition_by="user_id",
        order_by=["ts", "event_id"],
        pattern="D+ U+",
        define={
            "D": F.col("pv").isNotNull() & (F.col("value") < F.col("pv")),
            "U": F.col("pv").isNotNull() & (F.col("value") > F.col("pv")),
        },
        measures=[
            ("count", "D", "", "n_down"),
            ("count", "U", "", "n_up"),
            ("min", "*", "value", "trough_value"),
            ("last", "*", "value", "end_value"),
        ],
    )
    return out.select(
        "user_id",
        F.col("match_num").cast("long").alias("match_num"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_down").cast("long").alias("n_down"),
        F.col("n_up").cast("long").alias("n_up"),
        "trough_value",
        "end_value",
    )


_COND_EVENTS_ORACLE = """
-- CONDITIONAL_TRUE_EVENT / CONDITIONAL_CHANGE_EVENT / RATIO_TO_REPORT
-- re-expressed with ANSI windows. The ratio is published in integer
-- parts-per-million over exact cents (values are non-negative here, so
-- floor-div semantics agree across engines; double division would
-- drift in the last ulp).
WITH e AS (
    SELECT user_id, event_id, event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           LAG(event_type) OVER w AS prev_type,
           ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            OVER wr AS BIGINT) AS cond_true_events,
       CAST(SUM(CASE WHEN prev_type IS NOT NULL
                      AND event_type <> prev_type THEN 1 ELSE 0 END)
            OVER wr AS BIGINT) AS cond_change_events,
       CAST((cents * 1000000) // (SUM(cents) OVER wp) AS BIGINT) AS value_ppm
FROM e
WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       wp AS (PARTITION BY user_id)
"""


@query("window_conditional_events", _COND_EVENTS_ORACLE)
def q_window_conditional_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake's conditional-event window trio, re-expressed as ANSI
    running windows Catalyst plans natively:

    - ``CONDITIONAL_TRUE_EVENT(e)`` → running SUM of the predicate;
    - ``CONDITIONAL_CHANGE_EVENT(e)`` → running SUM over a lag-derived
      change flag (first row of a partition counts 0, per Snowflake);
    - ``RATIO_TO_REPORT(v)`` → share of the partition total, published
      as integer parts-per-million over exact cents so both engines
      hash bit-identically (a double ratio would drift; the events
      table's strictly-positive values make the partition total
      non-zero and the floor-div engine-identical — stated
      precondition).

    ONE exchange: the lag window, both running sums and the partition
    total all share the user_id hash partitioning (the running windows
    and lag also share the sort), so Catalyst plans a single shuffle —
    the shape that survives 100 TB of events. Non-negative values are
    a stated precondition for the floor-div ppm (holds for the events
    table; Spark `div` truncates where DuckDB `//` floors on
    negatives)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    wp = W.partitionBy("user_id")
    staged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return staged.select(
        "user_id",
        "event_id",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(wr).cast("long").alias("cond_true_events"),
        F.sum(
            F.when(
                F.col("prev_type").isNotNull()
                & (F.col("event_type") != F.col("prev_type")),
                1,
            ).otherwise(0)
        ).over(wr).cast("long").alias("cond_change_events"),
        F.expr(
            "cents * 1000000 div sum(cents) over (partition by user_id)"
        ).alias("value_ppm"),
    )
