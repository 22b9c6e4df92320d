"""Driver query for the web-curation surface (operators/web.py): URL
canonicalization + host-level rollup.

The documents table has no URL column, so the harness SYNTHESIZES a
deterministic messy URL per doc from (doc_id, source) — scheme variants,
optional mixed-case ``www.``, mixed-case hosts, tracking params in both
positions, fragments, trailing slashes — with the IDENTICAL expression
on both engines. The Spark side then canonicalizes via the operator
(pure Catalyst) while the oracle replays each canonicalization step in
SQL, so a drift in any step (wrong www strip, unsorted params, kept
fragment) breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.web import cap_per_host, host_url_stats
from .queries import _t, query

_SYNTH_AND_CANON = """
WITH urls AS (
    SELECT doc_id,
           (CASE WHEN doc_id % 3 = 0 THEN 'https://' ELSE 'http://' END)
        || (CASE WHEN doc_id % 4 = 0 THEN 'WWW.'
                 WHEN doc_id % 4 = 1 THEN 'www.' ELSE '' END)
        || (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END)
        || (CASE WHEN doc_id % 2 = 0 THEN '.Example.COM' ELSE '.example.com' END)
        || '/docs/' || CAST(doc_id // 10 AS VARCHAR)
        || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
        || (CASE WHEN doc_id % 6 = 0
                 THEN '?utm_source=feed&ref=' || CAST(doc_id % 3 AS VARCHAR)
                 WHEN doc_id % 6 = 3
                 THEN '?ref=' || CAST(doc_id % 3 AS VARCHAR) || '&utm_campaign=x'
                 ELSE '' END)
        || (CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END)
        || (CASE WHEN doc_id % 11 = 0
                 THEN '?next=https://t.example.net/a?b=1' ELSE '' END) AS url
    FROM documents
),
-- each split below keeps the FULL remainder after the FIRST separator
-- (substr from the first match), replaying Spark's limit-2 split —
-- string_split(...)[2] would drop everything after a SECOND '://' or
-- '?' (URLs embedding URLs, e.g. redirect links), silently diverging
c1 AS (
    SELECT doc_id,
           CASE WHEN position('://' IN url) > 0
                THEN substr(url, position('://' IN url) + 3) ELSE url END AS ns
    FROM urls
),
c2 AS (SELECT doc_id, string_split(ns, '#')[1] AS nf FROM c1),
c3 AS (
    SELECT doc_id,
           string_split(nf, '?')[1] AS base,
           CASE WHEN position('?' IN nf) > 0
                THEN substr(nf, position('?' IN nf) + 1) ELSE '' END AS query
    FROM c2
),
c4 AS (
    SELECT doc_id, query,
           CASE WHEN position('/' IN base) > 0
                THEN lower(substr(base, 1, position('/' IN base) - 1))
                ELSE lower(base) END AS host_raw,
           CASE WHEN position('/' IN base) > 0
                THEN substr(base, position('/' IN base)) ELSE '' END AS path_raw
    FROM c3
),
c5 AS (
    SELECT doc_id, query, path_raw,
           CASE WHEN starts_with(host_raw, 'www.')
                THEN substr(host_raw, 5) ELSE host_raw END AS host
    FROM c4
),
c6 AS (
    SELECT doc_id, host,
           CASE WHEN length(path_raw) > 1 AND ends_with(path_raw, '/')
                THEN substr(path_raw, 1, length(path_raw) - 1)
                ELSE path_raw END AS path,
           array_to_string(
               list_sort(list_filter(string_split(query, '&'),
                   p -> length(p) > 0
                        AND NOT (starts_with(p, 'utm_')
                                 OR starts_with(p, 'fbclid=')
                                 OR starts_with(p, 'gclid=')))), '&') AS params
    FROM c5
),
c7 AS (
    SELECT doc_id, host,
           host || path
                || (CASE WHEN length(params) > 0 THEN '?' || params ELSE '' END)
               AS canonical,
           CASE WHEN len(string_split(host, '.')) >= 2
                THEN string_split(host, '.')[-2] || '.'
                     || string_split(host, '.')[-1]
                ELSE host END AS domain
    FROM c6
)
"""

_URL_ORACLE = (
    _SYNTH_AND_CANON
    + """
SELECT host, domain,
       COUNT(*) AS n_urls,
       COUNT(DISTINCT canonical) AS n_canonical,
       MIN(canonical) AS sample_canonical
FROM c7 GROUP BY 1, 2
"""
)


def synth_urls(df: DataFrame) -> DataFrame:
    """The deterministic messy-URL synthesizer shared by query + tests."""
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    # integer division must match DuckDB's `//` exactly — use `div`
    url = F.concat(
        F.when(did % 3 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(did % 4 == 0, F.lit("WWW."))
        .when(did % 4 == 1, F.lit("www."))
        .otherwise(F.lit("")),
        F.when(did % 2 == 0, F.upper("source")).otherwise(F.col("source")),
        F.when(did % 2 == 0, F.lit(".Example.COM")).otherwise(
            F.lit(".example.com")
        ),
        F.lit("/docs/"),
        s(F.expr("doc_id div 10")),
        F.when(did % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 6 == 0, F.concat(F.lit("?utm_source=feed&ref="), s(did % 3)))
        .when(did % 6 == 3, F.concat(F.lit("?ref="), s(did % 3), F.lit("&utm_campaign=x")))
        .otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit("#sec")).otherwise(F.lit("")),
        # nested-URL case: a redirect-style param embedding a second
        # scheme and a second '?' — exercises the limit-2 split contract
        # (everything after the FIRST '://' / '?' is kept intact)
        F.when(
            did % 11 == 0, F.lit("?next=https://t.example.net/a?b=1")
        ).otherwise(F.lit("")),
    )
    return df.select("doc_id", url.alias("url"))


@query("web_host_url_stats", _URL_ORACLE)
def q_web_host_url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + host rollup (operators/web.py): messy
    synthetic URLs → canonical identity (scheme/www/fragment/tracking
    stripped, params sorted, trailing slash removed) → per-(host,
    domain) counts with the distinct-canonical dedup denominator. The
    oracle replays every canonicalization step in SQL — a wrong step
    anywhere cannot hash-match."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return host_url_stats(synth_urls(docs), "url")


_CAP_ORACLE = (
    _SYNTH_AND_CANON
    + """
SELECT host, doc_id, host_rank FROM (
    SELECT host, doc_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY host
               ORDER BY md5('caphost' || canonical || CAST(doc_id AS VARCHAR)),
                        doc_id) AS INT) AS host_rank
    FROM c7
) WHERE host_rank <= 3
"""
)


@query("web_cap_per_host", _CAP_ORACLE)
def q_web_cap_per_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (operators/web.cap_per_host): keep ≤3 docs per
    canonical host via a deterministic salted-md5 rank. The oracle
    replays canonicalization AND the exact md5 rank order, so the
    surviving set (not just its size) is pinned — a biased or
    order-dependent sample cannot hash-match."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    kept = cap_per_host(synth_urls(docs), "url", "doc_id", cap=3)
    return kept.select(
        "host", "doc_id", F.col("host_rank").cast("int").alias("host_rank")
    )


_PREP_ORACLE = (
    _SYNTH_AND_CANON
    + """
, capped AS (
    SELECT host, doc_id, canonical FROM (
        SELECT host, doc_id, canonical,
               ROW_NUMBER() OVER (
                   PARTITION BY host
                   ORDER BY md5('caphost' || canonical
                                || CAST(doc_id AS VARCHAR)), doc_id)
                   AS host_rank
        FROM c7
    ) WHERE host_rank <= 20
),
dedup AS (
    SELECT host, canonical, MIN(doc_id) AS doc_id
    FROM capped GROUP BY 1, 2
),
gated AS (
    SELECT d.host, d.doc_id, docs.n_chars
    FROM dedup d JOIN documents docs ON docs.doc_id = d.doc_id
    WHERE docs.n_chars >= 100
),
a AS (SELECT host, COUNT(*) AS n_after_cap FROM capped GROUP BY 1),
b AS (SELECT host, COUNT(*) AS n_after_dedup FROM dedup GROUP BY 1),
g AS (
    SELECT host, COUNT(*) AS n_final,
           CAST(SUM(n_chars) AS BIGINT) AS total_kept_chars
    FROM gated GROUP BY 1
)
SELECT a.host, a.n_after_cap, b.n_after_dedup,
       COALESCE(g.n_final, 0) AS n_final,
       COALESCE(g.total_kept_chars, 0) AS total_kept_chars
FROM a JOIN b ON a.host = b.host
LEFT JOIN g ON g.host = a.host
"""
)


@query("web_corpus_prep", _PREP_ORACLE)
def q_web_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end web curation as ONE declarative plan (the crawl-side
    sibling of corpus_prep_pipeline): canonicalize synthetic messy URLs
    -> per-host cap (<=20, deterministic md5 rank) -> URL-level exact
    dedup (keep min doc_id per canonical) -> length quality gate
    (n_chars >= 100, the cheap-filter stand-in) -> per-host funnel
    audit. Every stage's survivor count is pinned per host, so a drift
    anywhere in the funnel (wrong cap order, dedup key, gate predicate)
    cannot hash-match. Plan shape: map-only canonicalization feeding one
    host window, one (host, canonical) aggregate, one id join to the
    quality column, three per-host aggregates sharing the host
    partitioning."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    capped = cap_per_host(
        synth_urls(docs.select("doc_id", "source")), "url", "doc_id", cap=20
    )
    from .operators.web import canonicalize_url

    capped = capped.withColumn("canonical", canonicalize_url("url")["canonical"])
    dedup = capped.groupBy("host", "canonical").agg(
        F.min("doc_id").alias("doc_id")
    )
    gated = dedup.join(docs.select("doc_id", "n_chars"), "doc_id").filter(
        F.col("n_chars") >= 100
    )
    a = capped.groupBy("host").agg(F.count(F.lit(1)).alias("n_after_cap"))
    b = dedup.groupBy("host").agg(F.count(F.lit(1)).alias("n_after_dedup"))
    g = gated.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum("n_chars").cast("bigint").alias("total_kept_chars"),
    )
    return (
        a.join(b, "host")
        .join(g, "host", "left")
        .select(
            "host",
            "n_after_cap",
            "n_after_dedup",
            F.coalesce(F.col("n_final"), F.lit(0)).alias("n_final"),
            F.coalesce(F.col("total_kept_chars"), F.lit(0)).cast("bigint")
            .alias("total_kept_chars"),
        )
    )
