"""Web-corpus curation: URL canonicalization + host-level rollups.

Crawl-scale corpora (C4, RefinedWeb, FineWeb) dedup and filter BY URL
before touching any text: the same page is fetched under scheme/www/
tracking-param/fragment variants, and host-level statistics drive
blocklists and per-domain caps. The reference has none of this
(SURVEY.md §2.C); the north-star extension set calls for it.

Everything here is PURE CATALYST string/array expressions — no UDF, no
regex backtracking (only anchored LIKE prefixes and fixed-separator
splits), so canonicalization runs inside whole-stage codegen and an
oracle engine can replay it token-for-token. At 100 TB the operator is
a map-only projection (zero shuffle); the host rollup is one hash
aggregate on the canonical host — the natural partitioning key for
per-domain caps downstream.

Canonical form (documented contract, in order):
1. strip scheme (``://`` split) and ``#fragment``;
2. split ``?query`` off the path;
3. host = lowercased authority up to the first ``/``; a single leading
   ``www.`` label is dropped;
4. tracking params removed (``utm_*``, ``fbclid``, ``gclid``), the
   REST SORTED lexicographically (order never carries meaning for
   dedup identity) and re-joined;
5. one trailing ``/`` stripped from a non-root path.

``domain`` is the last two host labels — a deliberate approximation of
the registrable domain (a Public-Suffix-List lookup is a broadcast-dim
join away and out of scope; documented, not hidden).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def canonicalize_url(url: Column | str) -> Column:
    """Return a struct column ``(canonical, host, domain, path, params)``
    per the module-header contract. NULL-safe: a NULL url yields a
    struct of NULLs (struct itself non-null, so downstream group keys
    stay well-defined)."""
    u = F.col(url) if isinstance(url, str) else url
    # 1. scheme + fragment
    no_scheme = F.when(
        u.contains("://"), F.element_at(F.split(u, "://", 2), 2)
    ).otherwise(u)
    no_frag = F.element_at(F.split(no_scheme, "#", 2), 1)
    # 2. query split
    base = F.element_at(F.split(no_frag, r"\?", 2), 1)
    query = F.when(
        no_frag.contains("?"), F.element_at(F.split(no_frag, r"\?", 2), 2)
    ).otherwise(F.lit(""))
    # 3. host / path
    slash = F.instr(base, "/")
    host_raw = F.lower(
        F.when(slash > 0, F.substring(base, F.lit(1), slash - 1)).otherwise(base)
    )
    host = F.when(
        host_raw.startswith("www."), host_raw.substr(F.lit(5), F.length(host_raw))
    ).otherwise(host_raw)
    path_raw = F.when(slash > 0, base.substr(slash, F.length(base))).otherwise(
        F.lit("")
    )
    # 4. params: drop tracking, sort the rest
    import functools
    import operator as _op

    parts = F.split(query, "&")

    def _keep(p: Column) -> Column:
        is_tracking = functools.reduce(
            _op.or_, [p.startswith(pref) for pref in _TRACKING_PREFIXES]
        )
        return (F.length(p) > 0) & ~is_tracking

    kept = F.filter(parts, _keep)
    params = F.array_join(F.array_sort(kept), "&")
    # 5. trailing slash on a non-root path
    path = F.when(
        (F.length(path_raw) > 1) & path_raw.endswith("/"),
        path_raw.substr(F.lit(1), F.length(path_raw) - 1),
    ).otherwise(path_raw)
    canonical = F.concat(
        host, path, F.when(F.length(params) > 0, F.concat(F.lit("?"), params)).otherwise(F.lit(""))
    )
    labels = F.split(host, r"\.")
    domain = F.when(
        F.size(labels) >= 2,
        F.concat(
            F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)
        ),
    ).otherwise(host)
    return F.struct(
        canonical.alias("canonical"),
        host.alias("host"),
        domain.alias("domain"),
        path.alias("path"),
        params.alias("params"),
    )


def host_url_stats(
    df: DataFrame, url_col: str = "url", exact: bool = True
) -> DataFrame:
    """Host-level URL rollup: per (host, domain) — page count, distinct
    canonical URLs (the URL-dedup denominator), and the lexicographic
    min canonical as a stable exemplar. One map-side canonicalization +
    TWO exchanges measured (`.explain`): the COUNT(DISTINCT canonical)
    denominator pays the standard distinct-Expand second pass on top of
    the host aggregate — inherent to an exact distinct count; swap in
    approx_count_distinct to drop back to one. At crawl scale this IS
    the per-domain cap/blocklist input table, ~6 orders of magnitude
    smaller than the corpus."""
    c = canonicalize_url(url_col)
    ndv = (
        F.countDistinct("canonical")
        if exact
        # production path at crawl scale: HLL keeps the rollup to ONE
        # exchange (no distinct-Expand second pass); the denominator is
        # an estimate, which per-domain caps and blocklists tolerate
        else F.approx_count_distinct("canonical")
    )
    return (
        df.select(c.alias("u"))
        .select("u.host", "u.domain", "u.canonical")
        .groupBy("host", "domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            ndv.alias("n_canonical"),
            F.min("canonical").alias("sample_canonical"),
        )
    )


def cap_per_host(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    cap: int = 100,
    salt: str = "caphost",
    level: str = "host",
) -> DataFrame:
    """Per-domain document cap (RefinedWeb/FineWeb recipe): keep at most
    ``cap`` documents per canonical HOST, selected by a deterministic
    salted-md5 rank — an unbiased per-host sample that is stable across
    partitionings and reruns (no RNG, no first-seen order dependence).

    Hot hosts are exactly the skew case: one window partitioned by host
    does the job, and AQE skew-split handles a host holding 1% of a
    100 TB crawl. Rank order is ``(md5(salt‖canonical‖id), id)`` — total
    even when two docs share a canonical URL. Returns the input columns
    + ``host`` + ``host_rank`` for the survivors.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    if level not in ("host", "domain"):
        raise ValueError(f"level must be 'host' or 'domain', got {level!r}")
    from pyspark.sql import Window

    u = canonicalize_url(url_col)
    with_host = df.withColumn(level, u[level]).withColumn(
        "__cap_key",
        F.md5(
            F.concat(
                F.lit(salt), u["canonical"], F.col(id_col).cast("string")
            )
        ),
    )
    w = Window.partitionBy(level).orderBy(
        F.col("__cap_key").asc(), F.col(id_col).asc()
    )
    return (
        with_host.withColumn(f"{level}_rank", F.row_number().over(w))
        .filter(F.col(f"{level}_rank") <= cap)
        .drop("__cap_key")
    )
