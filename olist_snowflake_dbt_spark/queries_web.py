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
        || (CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END) AS url
    FROM documents
),
c1 AS (
    SELECT doc_id,
           CASE WHEN position('://' IN url) > 0
                THEN string_split(url, '://')[2] ELSE url END AS ns
    FROM urls
),
c2 AS (SELECT doc_id, string_split(ns, '#')[1] AS nf FROM c1),
c3 AS (
    SELECT doc_id,
           string_split(nf, '?')[1] AS base,
           CASE WHEN position('?' IN nf) > 0
                THEN string_split(nf, '?')[2] ELSE '' END AS query
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
