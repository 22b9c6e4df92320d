"""Driver queries for the governance layer (operators/governance.py):
dynamic data masking and row access policies, evaluated under two roles
in one deterministic result so the oracle proves BOTH the cleartext and
the enforced view."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.governance import apply_masking, apply_row_access, mask_expr
from .queries import _t, query

# The same customer slice projected under an admin role (cleartext) and
# an analyst role (name partially revealed, account balance NULLed,
# segment tokenized to md5) — unioned with the session role as a column.
_MASK_ORACLE = """
WITH base AS (
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer WHERE c_custkey % 10 = 0
)
SELECT 'admin' AS session_role, c_custkey, c_name, c_mktsegment, c_acctbal
FROM base
UNION ALL
SELECT 'analyst', c_custkey,
       substr(c_name, 1, 9) || '****',
       md5(c_mktsegment),
       NULL
FROM base
"""


@query("governance_masked_view", _MASK_ORACLE)
def q_governance_masked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic data masking (operators/governance.apply_masking): the
    Snowflake MASKING POLICY enforcement point re-expressed as pure
    Catalyst CASE projections — partial reveal on c_name (first 9 chars,
    the ``Customer#`` prefix), deterministic md5 tokenization on
    c_mktsegment (joinable/groupable without exposure), NULL-out on
    c_acctbal. The admin and analyst projections of the SAME slice are
    unioned under a session_role column, so the oracle row-hash proves
    cleartext passthrough for the privileged role AND every mask style
    for the unprivileged one. Zero shuffle, zero Python — masking rides
    the scan projection."""
    base = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    base = base.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    policies = {
        "c_name": (["admin"], mask_expr("c_name", "partial", keep=9)),
        "c_mktsegment": (["admin"], mask_expr("c_mktsegment", "token")),
        "c_acctbal": (["admin"], mask_expr("c_acctbal", "null")),
    }
    views = [
        apply_masking(base, role, policies).select(
            F.lit(role).alias("session_role"), "*"
        )
        for role in ("admin", "analyst")
    ]
    return views[0].unionByName(views[1])


# Role->nation grants derived from the region table: emea_analyst sees
# EUROPE+MIDDLE EAST+AFRICA nations, apac_analyst sees ASIA; an
# unlisted role sees nothing (deny by default -> absent from output).
_ROW_ACCESS_ORACLE = """
WITH grants AS (
    SELECT 'emea_analyst' AS role, n.n_nationkey
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('EUROPE', 'MIDDLE EAST', 'AFRICA')
    UNION ALL
    SELECT 'apac_analyst', n.n_nationkey
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
),
roles AS (
    SELECT unnest(['emea_analyst', 'apac_analyst', 'intern']) AS session_role
)
SELECT ro.session_role, c.c_nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM roles ro
JOIN grants g ON g.role = ro.session_role
JOIN customer c ON c.c_nationkey = g.n_nationkey
GROUP BY ro.session_role, c.c_nationkey
"""


@query("governance_row_access", _ROW_ACCESS_ORACLE)
def q_governance_row_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row access policy with a mapping table (operators/governance.
    apply_row_access): grants (role → nationkey) are derived from the
    region dimension, the session role's grants are filtered FIRST and
    broadcast into a LEFT SEMI join against the customer scan — so
    enforcement is map-side and the fact table never shuffles, at 100 TB
    as at sf0.01. Three roles are evaluated: two with disjoint regional
    grants and one unlisted ('intern'), which contributes zero rows —
    deny by default. Output is the per-role nation rollup (exact DECIMAL
    balance sums presented as DOUBLE)."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust = _t(spark, sf_dir, "customer")

    nk = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "r_name")
    grants = nk.filter(
        F.col("r_name").isin("EUROPE", "MIDDLE EAST", "AFRICA")
    ).select(F.lit("emea_analyst").alias("role"), F.col("n_nationkey")).unionByName(
        nk.filter(F.col("r_name") == "ASIA").select(
            F.lit("apac_analyst").alias("role"), F.col("n_nationkey")
        )
    )

    outs = []
    for role in ("emea_analyst", "apac_analyst", "intern"):
        visible = apply_row_access(
            cust.withColumnRenamed("c_nationkey", "n_nationkey"),
            role,
            grants,
            on=["n_nationkey"],
        )
        outs.append(
            visible.groupBy("n_nationkey")
            .agg(
                F.count("*").alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_acctbal"),
            )
            .select(
                F.lit(role).alias("session_role"),
                F.col("n_nationkey").alias("c_nationkey"),
                "n_customers",
                "sum_acctbal",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# GDPR art. 17 cascade: subjects = every 97th customer. The identity
# table drops their rows; the fact table keeps every row but swaps the
# key for its md5 surrogate and NULLs the clerk column. The audit row
# per table carries the compliance counts, including n_residual_links
# RECOMPUTED from the transformed output (must be 0).
_ERASURE_ORACLE = """
WITH subjects AS (
    SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 97 = 0
),
cust_stats AS (
    SELECT COUNT(*) FILTER (WHERE c_custkey IN (SELECT c_custkey FROM subjects))
               AS n_affected,
           COUNT(*) FILTER (WHERE c_custkey NOT IN (SELECT c_custkey FROM subjects))
               AS n_kept
    FROM customer
),
ord_stats AS (
    SELECT COUNT(*) FILTER (WHERE o_custkey IN (SELECT c_custkey FROM subjects))
               AS n_affected,
           COUNT(*) AS n_kept,
           COUNT(DISTINCT o_custkey)
               FILTER (WHERE o_custkey IN (SELECT c_custkey FROM subjects))
               AS n_surr
    FROM orders
)
SELECT 'customer' AS table_name, 'delete' AS action,
       CAST(n_affected AS BIGINT) AS n_affected,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(0 AS BIGINT) AS n_distinct_surrogates,
       CAST(0 AS BIGINT) AS n_residual_links
FROM cust_stats
UNION ALL
SELECT 'orders', 'pseudonymize',
       CAST(n_affected AS BIGINT), CAST(n_kept AS BIGINT),
       CAST(n_surr AS BIGINT), CAST(0 AS BIGINT)
FROM ord_stats
"""


@query("governance_erasure_cascade", _ERASURE_ORACLE)
def q_governance_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR right-to-be-forgotten CASCADE (operators/governance.
    erasure_cascade): one erasure batch applied across the referencing
    tables — DELETE on the identity table (broadcast anti-join),
    PSEUDONYMIZE on the fact table (broadcast left join + conditional
    projection: md5 surrogate key + clerk NULLed; analytics survive,
    identity link does not). The returned audit is the compliance
    artifact: per-table affected/kept counts, surrogates minted, and
    residual cleartext links RECOMPUTED from the transformed frames —
    the oracle pins them to 0, so a leaky cascade can never hash-match.
    Both joins broadcast the (tiny) erasure batch; each table rewrites
    in one map-side pass at any corpus size."""
    from .operators.governance import erasure_cascade

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    subjects = customer.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    _, audit = erasure_cascade(
        subjects,
        "c_custkey",
        {
            "customer": {"df": customer, "key": "c_custkey", "action": "delete"},
            "orders": {
                "df": orders,
                "key": "o_custkey",
                "action": "pseudonymize",
                "redact_cols": ["o_clerk"],
            },
        },
    )
    return audit


_KANON_ORACLE = """
SELECT n.n_name AS nation, c.c_mktsegment AS segment,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT c.c_acctbal) AS n_sensitive,
       COUNT(*) < 25 AS k_violation,
       COUNT(DISTINCT c.c_acctbal) < 3 AS l_violation
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, c.c_mktsegment
"""


@query("governance_k_anonymity", _KANON_ORACLE)
def q_governance_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (operators/governance.
    k_anonymity_audit): every (nation, market segment) quasi-identifier
    group must hide ≥ 25 customers AND show ≥ 3 distinct account
    balances — the re-identification risk readout a dataset release
    gates on (violating groups get suppressed or generalized; the
    transforms are apply_masking / erase_subjects). ONE fused
    count + count-distinct aggregate; QI-cardinality rows through the
    exchange."""
    from .operators.governance import k_anonymity_audit

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("n_name").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        "c_acctbal",
    )
    return k_anonymity_audit(
        joined, ["nation", "segment"], "c_acctbal", k=25, l=3
    )
