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
from .functions.local_frame import arrow_local_df

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
    SELECT doc_id, host, path,
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


@query("web_cap_prefilter", _CAP_ORACLE)
def q_web_cap_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-host PREFILTERED per-domain cap (operators/web.cap_per_host
    with ``prefilter_factor=8``): per host, only rows whose uniform
    32-bit md5 prefix falls under factor·cap/|host| of the key space
    reach the exact rank window — expected survivors ≈ factor·cap per
    host whatever the host size, so a 1%-of-crawl host no longer
    serializes its full row set through one window task. The ORACLE IS
    THE UNFILTERED WINDOW RESULT (same SQL as web_cap_per_host):
    exactness of the prefiltered output is the operator's checked
    claim — the window ranks by the same md5 the filter thresholds,
    and the built-in verifier hard-fails on any host that delivers
    fewer than min(cap, |host|) survivors rather than letting the
    filter silently cut into the true top-cap."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    kept = cap_per_host(
        synth_urls(docs), "url", "doc_id", cap=3, prefilter_factor=8
    )
    return kept.select(
        "host", "doc_id", F.col("host_rank").cast("int").alias("host_rank")
    )


@query("web_cap_two_phase", _CAP_ORACLE)
def q_web_cap_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted TWO-PHASE per-domain cap (operators/web.cap_per_host with
    ``salt_buckets=8`` — round 13's unconditionally-exact scale path):
    stage 1 ranks within (host, xxhash64(doc_id) % 8) so a hot host
    sorts in 8 parallel tasks, keeping ≤ cap per bucket; stage 2
    re-ranks the ≤ 8·cap survivors per host exactly. The ORACLE IS THE
    PLAIN WINDOW RESULT (same SQL as web_cap_per_host): two-phase
    top-k is exact by construction — any global top-cap row ranks
    ≤ cap inside its own bucket, so stage 1 can never drop a row the
    final answer needs."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    kept = cap_per_host(
        synth_urls(docs), "url", "doc_id", cap=3, salt_buckets=8
    )
    return kept.select(
        "host", "doc_id", F.col("host_rank").cast("int").alias("host_rank")
    )


@query("web_cap_auto", _CAP_ORACLE)
def q_web_cap_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTO-selected per-domain cap (operators/web.cap_per_host with
    ``salt_buckets="auto"`` — round 14): a key_skew_stats pre-flight
    (one map-side host census, 1-row collect) reads the hottest host's
    row count and picks the plain window below the measured crossover
    threshold, the salted two-phase path above it (buckets sized to
    ~250k-row sorts). ``auto_hot_threshold=2`` here forces the
    two-phase branch so the driver exercises pre-flight + dynamic
    bucket sizing end-to-end; the ORACLE IS THE PLAIN WINDOW RESULT
    (same SQL as web_cap_per_host) — all strategies are
    output-identical, auto only ever moves wall."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    kept = cap_per_host(
        synth_urls(docs),
        "url",
        "doc_id",
        cap=3,
        salt_buckets="auto",
        auto_hot_threshold=2,
    )
    return kept.select(
        "host", "doc_id", F.col("host_rank").cast("int").alias("host_rank")
    )


_PREP_ORACLE = (
    _SYNTH_AND_CANON
    + """
, capped AS (
    SELECT host, doc_id, canonical, domain, path FROM (
        SELECT host, doc_id, canonical, domain, path,
               ROW_NUMBER() OVER (
                   PARTITION BY host
                   ORDER BY md5('caphost' || canonical
                                || CAST(doc_id AS VARCHAR)), doc_id)
                   AS host_rank
        FROM c7
    ) WHERE host_rank <= 20
),
blocked AS (
    -- blocklist anti-join replay (domain + path-prefix rule): every
    -- synthesized host is src*.example.com with no multi-label PSL
    -- match, so the registrable domain falls back to the last-2-label
    -- wildcard rule — exactly c7.domain
    SELECT host, doc_id, canonical FROM capped
    WHERE NOT (domain = 'example.com' AND starts_with(path, '/docs/3'))
),
dedup AS (
    SELECT host, canonical, MIN(doc_id) AS doc_id
    FROM blocked GROUP BY 1, 2
),
gated AS (
    SELECT d.host, d.doc_id, docs.n_chars
    FROM dedup d JOIN documents docs ON docs.doc_id = d.doc_id
    WHERE docs.n_chars >= 100
),
a AS (SELECT host, COUNT(*) AS n_after_cap FROM capped GROUP BY 1),
nb AS (SELECT host, COUNT(*) AS n_after_block FROM blocked GROUP BY 1),
b AS (SELECT host, COUNT(*) AS n_after_dedup FROM dedup GROUP BY 1),
g AS (
    SELECT host, COUNT(*) AS n_final,
           CAST(SUM(n_chars) AS BIGINT) AS total_kept_chars
    FROM gated GROUP BY 1
)
SELECT a.host, a.n_after_cap,
       COALESCE(nb.n_after_block, 0) AS n_after_block,
       COALESCE(b.n_after_dedup, 0) AS n_after_dedup,
       COALESCE(g.n_final, 0) AS n_final,
       COALESCE(g.total_kept_chars, 0) AS total_kept_chars
FROM a
LEFT JOIN nb ON nb.host = a.host
LEFT JOIN b ON b.host = a.host
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
    anywhere in the funnel (wrong cap order, dedup key, gate predicate,
    blocklist rule) cannot hash-match. Plan shape: map-only
    canonicalization feeding one host window; the blocklist stage is a
    BROADCAST anti-join (map-only, incl. its PSL registrable-domain
    lookup); one (host, canonical) aggregate, one id join to the
    quality column, four per-host audit aggregates sharing the host
    partitioning."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    # salt_buckets: the round-13 two-phase cap — output IDENTICAL to the
    # plain window (oracle unchanged), but the hot-host rank no longer
    # serializes through one task (zipf lane: 11.5 vs 28.6 s at 10M hot
    # rows), which is what the funnel needs at crawl scale
    capped = cap_per_host(
        synth_urls(docs.select("doc_id", "source")), "url", "doc_id",
        cap=20, salt_buckets=8,
    )
    from .operators.web import apply_blocklist, canonicalize_url

    # PERSIST the two funnel frames every audit aggregate fans out
    # from: both are CAP-BOUNDED (≤ cap rows per host — dimension-
    # scale, spill-safe at any corpus size), and without the persist
    # the four host-level audits each re-run the scan + canonicalize +
    # two cap windows (4 identical subtrees pre-AQE; measured 9.0 →
    # 7.0 s at sf0.1 from these two lines)
    capped = capped.withColumn(
        "canonical", canonicalize_url("url")["canonical"]
    ).persist()
    blocklist = arrow_local_df(
        spark, [("example.com", "/docs/3")], "domain string, path_prefix string"
    )
    blocked = apply_blocklist(capped, blocklist, "url").persist()
    dedup = blocked.groupBy("host", "canonical").agg(
        F.min("doc_id").alias("doc_id")
    )
    gated = dedup.join(docs.select("doc_id", "n_chars"), "doc_id").filter(
        F.col("n_chars") >= 100
    )
    a = capped.groupBy("host").agg(F.count(F.lit(1)).alias("n_after_cap"))
    nb = blocked.groupBy("host").agg(F.count(F.lit(1)).alias("n_after_block"))
    b = dedup.groupBy("host").agg(F.count(F.lit(1)).alias("n_after_dedup"))
    g = gated.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum("n_chars").cast("bigint").alias("total_kept_chars"),
    )
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).alias(c)  # noqa: E731
    return (
        a.join(nb, "host", "left")
        .join(b, "host", "left")
        .join(g, "host", "left")
        .select(
            "host",
            "n_after_cap",
            zero("n_after_block"),
            zero("n_after_dedup"),
            zero("n_final"),
            F.coalesce(F.col("total_kept_chars"), F.lit(0)).cast("bigint")
            .alias("total_kept_chars"),
        )
    )


# -- PSL registrable domain (eTLD+1) ----------------------------------

from .operators.web import PUBLIC_SUFFIXES, _classify_rules  # noqa: E402

# the same checked-in snapshot rules, classified by the same loader and
# rendered as an inline (suffix, width, kind) dim for the oracle — one
# source of truth (a drifted copy could not hash-match). Wildcard rows
# carry the fixed TAIL ('*.ck' → 'ck'); exceptions their full suffix.
_PSL_VALUES = ",\n        ".join(
    f"('{s}', {k}, '{kind}')"
    for s, k, kind in _classify_rules(PUBLIC_SUFFIXES)
)

# ccTLD-diverse synthetic hosts exercising every rule kind: multi-label
# exact suffixes (co.uk / org.uk / github.io / s3.amazonaws.com) where
# "last two labels" pools a whole country into one domain, a plain .com
# fallback, `*.ck` / `*.nagoya.jp` wildcard rules, and the `!www.ck` /
# `!city.nagoya.jp` exceptions (which POOL across sources — the proof
# the exception path fires).
_PSL_SYNTH = """
    SELECT doc_id,
           'http://'
        || (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END)
        || (CASE doc_id % 10
            WHEN 0 THEN '.Shop.CO.UK'
            WHEN 1 THEN '.example.com'
            WHEN 2 THEN '.news.org.uk'
            WHEN 3 THEN '.pages.github.io'
            WHEN 4 THEN '.bucket.s3.amazonaws.com'
            WHEN 5 THEN '.foo.CK'
            WHEN 6 THEN '.WWW.ck'
            WHEN 7 THEN '.city.Nagoya.JP'
            WHEN 8 THEN '.naka.nagoya.jp'
            ELSE '.pref.aichi.jp' END)
        || '/p/' || CAST(doc_id % 20 AS VARCHAR) AS url
    FROM documents
"""

_PSL_ORACLE = f"""
    WITH psl(sfx, k, kind) AS (VALUES
        {_PSL_VALUES}
    ),
    urls AS ({_PSL_SYNTH}),
    canon AS (  -- scheme strip, lowercase host, www strip, host||path
        SELECT doc_id, host,
               host || substr(ns, position('/' IN ns)) AS canonical
        FROM (
            SELECT doc_id, ns,
                   CASE WHEN starts_with(lower(substr(ns, 1, position('/' IN ns) - 1)), 'www.')
                        THEN substr(lower(substr(ns, 1, position('/' IN ns) - 1)), 5)
                        ELSE lower(substr(ns, 1, position('/' IN ns) - 1)) END AS host
            FROM (SELECT doc_id, substr(url, position('://' IN url) + 3) AS ns
                  FROM urls)
        )
    ),
    h AS (
        SELECT doc_id, host, canonical,
               string_split(host, '.') AS ls,
               len(string_split(host, '.')) AS nl
        FROM canon
    ),
    sel AS (  -- full PSL algorithm: exception width / best effective
              -- suffix width (wildcards count their * label); NULL mk
              -- falls to the implicit * rule
        SELECT h.*,
               (SELECT MAX(p.k) FROM psl p
                 WHERE p.kind = 'exception' AND h.nl >= p.k
                   AND array_to_string(h.ls[h.nl - p.k + 1 : h.nl], '.') = p.sfx
               ) AS ek,
               (SELECT MAX(CASE WHEN p.kind = 'rule' THEN p.k
                                ELSE p.k + 1 END) FROM psl p
                 WHERE (p.kind = 'rule' AND h.nl >= p.k + 1
                        AND array_to_string(h.ls[h.nl - p.k + 1 : h.nl], '.') = p.sfx)
                    OR (p.kind = 'wildcard' AND h.nl >= p.k + 2
                        AND array_to_string(h.ls[h.nl - p.k + 1 : h.nl], '.') = p.sfx)
               ) AS mk
        FROM h
    ),
    reg AS (
        SELECT doc_id, canonical,
               CASE WHEN ek IS NOT NULL
                    THEN array_to_string(ls[nl - ek + 1 : nl], '.')
                    WHEN mk IS NOT NULL
                    THEN array_to_string(ls[nl - mk : nl], '.')
                    WHEN nl >= 2 THEN array_to_string(ls[nl - 1 : nl], '.')
                    ELSE host END AS registrable
        FROM sel
    )
    SELECT registrable, doc_id, registrable_rank FROM (
        SELECT registrable, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY registrable
                   ORDER BY md5('caphost' || canonical
                                || CAST(doc_id AS VARCHAR)), doc_id)
                    AS INT) AS registrable_rank
        FROM reg
    ) WHERE registrable_rank <= 3
"""


def synth_psl_urls(df: DataFrame) -> DataFrame:
    """The _PSL_SYNTH expression, Spark-side (identical tokens)."""
    did = F.col("doc_id")
    url = F.concat(
        F.lit("http://"),
        F.when(did % 2 == 0, F.upper("source")).otherwise(F.col("source")),
        F.when(did % 10 == 0, F.lit(".Shop.CO.UK"))
        .when(did % 10 == 1, F.lit(".example.com"))
        .when(did % 10 == 2, F.lit(".news.org.uk"))
        .when(did % 10 == 3, F.lit(".pages.github.io"))
        .when(did % 10 == 4, F.lit(".bucket.s3.amazonaws.com"))
        .when(did % 10 == 5, F.lit(".foo.CK"))
        .when(did % 10 == 6, F.lit(".WWW.ck"))
        .when(did % 10 == 7, F.lit(".city.Nagoya.JP"))
        .when(did % 10 == 8, F.lit(".naka.nagoya.jp"))
        .otherwise(F.lit(".pref.aichi.jp")),
        F.lit("/p/"),
        (did % 20).cast("string"),
    )
    return df.select("doc_id", url.alias("url"))


@query("web_domain_psl", _PSL_ORACLE)
def q_web_domain_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public-Suffix-List registrable domain (eTLD+1) feeding the
    per-domain cap (operators/web.with_registrable_domain +
    cap_per_host(level='registrable')): the FULL PSL algorithm over the
    official-format snapshot — exact longest-match (src0.shop.co.uk and
    src1.shop.co.uk group under shop.co.uk, NOT a bogus country-wide
    'co.uk'), `*.ck` / `*.nagoya.jp` wildcard rules, and the `!www.ck`
    / `!city.nagoya.jp` exceptions (whose hosts POOL across sources —
    the proof the exception branch fires). The oracle replays
    canonicalization, the rule-kind priority, the implicit-* fallback,
    and the exact md5 cap order, so both the grouping and the surviving
    doc set are pinned."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    kept = cap_per_host(
        synth_psl_urls(docs), "url", "doc_id", cap=3, level="registrable"
    )
    return kept.select(
        "registrable", "doc_id",
        F.col("registrable_rank").cast("int").alias("registrable_rank"),
    )


_ROBOTS_RULES = [
    ("src1.example.com", "/docs", False),
    ("src1.example.com", "/docs/1", True),
    ("src2.example.com", "", False),
    ("src3.example.com", "/docs/2", False),
    ("src3.example.com", "/docs/22", True),
    ("src4.example.com", "/docs/4", False),
    ("src4.example.com", "/docs/4", True),
]

_ROBOTS_ORACLE = (
    _SYNTH_AND_CANON
    + ", rules(host, pfx, allow) AS (VALUES "
    + ", ".join(
        f"('{h}', '{p}', {str(a).upper()})" for h, p, a in _ROBOTS_RULES
    )
    + """
),
m AS (
    SELECT c7.doc_id, r.allow,
           ROW_NUMBER() OVER (
               PARTITION BY c7.doc_id
               ORDER BY length(r.pfx) DESC, r.allow DESC) AS rk
    FROM c7 JOIN rules r
      ON c7.host = r.host AND starts_with(c7.path, r.pfx)
)
SELECT c7.doc_id, c7.host,
       COALESCE(b.allow, TRUE) AS robots_allowed
FROM c7 LEFT JOIN (SELECT doc_id, allow FROM m WHERE rk = 1) b
  ON c7.doc_id = b.doc_id
"""
)


@query("web_robots_gate", _ROBOTS_ORACLE)
def q_web_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots Exclusion Protocol verdict (operators/web.robots_gate,
    round 14 — RFC 9309 path-rule subset): per URL, the host's
    longest-prefix-match directive decides, allow winning length ties,
    absent rules defaulting to allowed. The fixture covers nested
    prefixes (disallow /docs + allow /docs/1), a whole-host block
    (empty prefix), longest-wins (/docs/2 vs /docs/22) and the exact
    tie (allow beats disallow at equal length). One host join + one
    max(struct) aggregate — the oracle replays the verdict with a
    rank window over the same (length, allow) order."""
    from .operators.web import robots_gate

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    rules = arrow_local_df(
        spark, _ROBOTS_RULES, "host string, path_prefix string, allow boolean"
    )
    out = robots_gate(synth_urls(docs), rules, "url", "doc_id")
    return out.select("doc_id", "host", "robots_allowed")
