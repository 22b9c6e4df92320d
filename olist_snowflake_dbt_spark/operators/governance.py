"""Column masking + row access policies (Snowflake governance surface).

The reference project's warehouse applies dynamic data masking and row
access policies at query time (Snowflake ``CREATE MASKING POLICY`` /
``CREATE ROW ACCESS POLICY``; dbt projects attach them via post-hooks).
An engine replacing that warehouse needs the same enforcement point:
given the ROLE a consumer runs under, the same logical table yields
masked columns and a filtered row set.

Spark-first design: policies compile to pure Catalyst expressions —

- a masking policy is one ``CASE WHEN role IN (...) THEN col ELSE
  mask(col)`` projection per governed column: zero shuffle, zero Python,
  fully codegen'd, and column-pruning still works because the CASE
  references only the governed column;
- a row access policy backed by a mapping table (role → allowed key,
  the standard Snowflake pattern) is a LEFT SEMI join against the
  mapping filtered to the session role — the mapping is tiny and
  broadcast, so enforcement is map-side at any fact-table size, and
  Catalyst pushes the surviving conjuncts into the scan.

Masking styles follow Snowflake's common policy bodies: full redaction,
partial reveal (leading chars kept), deterministic tokenization (md5 —
joinable across tables without revealing the value), and NULL-out for
numerics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..functions.local_frame import arrow_local_df


def mask_expr(col: str | Column, style: str = "redact", keep: int = 0) -> Column:
    """The masked form of ``col`` under a policy ``style``:

    - ``redact``   → the literal ``'***MASKED***'``
    - ``partial``  → first ``keep`` chars + ``'****'`` (phone/email style)
    - ``token``    → ``md5(col)`` — deterministic tokenization, preserves
      joinability and GROUP BY cardinality without exposing the value
    - ``null``     → typed NULL (numeric/timestamp columns)
    """
    c = F.col(col) if isinstance(col, str) else col
    if style == "redact":
        return F.lit("***MASKED***")
    if style == "partial":
        return F.concat(F.substring(c.cast("string"), 1, keep), F.lit("****"))
    if style == "token":
        return F.md5(c.cast("string"))
    if style == "null":
        return F.lit(None)
    raise ValueError(f"unknown mask style: {style!r}")


def apply_masking(
    df: DataFrame,
    role: str,
    policies: dict[str, tuple[Sequence[str], Column]],
) -> DataFrame:
    """Project ``df`` as seen by ``role`` under column masking policies.

    ``policies`` maps column name → (roles allowed to see cleartext,
    masked expression). Ungoverned columns pass through untouched; the
    masked expression is cast back to the column's original type when
    possible so the governed view keeps a stable schema (Snowflake
    requires the policy body to return the column's type).
    """
    out = []
    for name in df.columns:
        if name in policies:
            allowed, masked = policies[name]
            dtype = dict(df.dtypes)[name]
            if role in allowed:
                out.append(F.col(name))
            else:
                out.append(masked.cast(dtype).alias(name))
        else:
            out.append(F.col(name))
    return df.select(*out)


def apply_row_access(
    df: DataFrame,
    role: str,
    mapping: DataFrame,
    on: Sequence[str],
    role_col: str = "role",
    unlisted_role_sees_nothing: bool = True,
) -> DataFrame:
    """Filter ``df`` to the rows ``role`` may see, per a mapping table of
    ``(role, *on)`` grants — the Snowflake row-access-policy-with-
    mapping-table pattern.

    The mapping is filtered to the session role FIRST (so only that
    role's grants ship) and broadcast into a LEFT SEMI join on ``on`` —
    enforcement is map-side against the fact scan; no fact-table
    shuffle. An unlisted role sees nothing (deny-by-default, as a
    Snowflake policy body returning false does).
    """
    grants = mapping.filter(F.col(role_col) == role).select(*on).dropDuplicates()
    if not unlisted_role_sees_nothing:
        raise NotImplementedError(
            "allow-by-default row access is deliberately unsupported: "
            "governance policies must fail closed"
        )
    return df.join(F.broadcast(grants), on=list(on), how="left_semi")


def erase_subjects(
    df: DataFrame,
    subjects: DataFrame,
    key: str,
    subject_key: str,
    action: str = "delete",
    redact_cols: Sequence[str] = (),
) -> DataFrame:
    """One table's share of a right-to-be-forgotten request (GDPR art. 17
    — the erasure workflow a Snowflake shop scripts around ``DELETE`` +
    UPDATE-to-tokenize; dbt projects run it as an operation).

    ``subjects`` holds the erasure requests (column ``subject_key``).
    Two policy actions, the standard split between identity tables and
    fact tables:

    - ``delete``: drop the subject's rows outright (the identity/dim
      table case) — a broadcast LEFT ANTI join, map-side at any size;
    - ``pseudonymize``: KEEP the rows (aggregate analytics must survive)
      but break the link to the person: the key column is replaced by
      its md5 surrogate (deterministic, so the subject's facts still
      join to EACH OTHER, but to nothing outside), and ``redact_cols``
      are NULLed. A broadcast LEFT JOIN + conditional projection —
      zero shuffle on the fact side.

    At 100 TB the erasure batch is tiny relative to the corpus (it is
    broadcast); each table is rewritten in ONE distributed pass with the
    predicate pushed to the scan of the standing table's partitions.
    """
    marks = subjects.select(F.col(subject_key).alias("__erase_key")).dropDuplicates()
    if action == "delete":
        return df.join(
            F.broadcast(marks), df[key] == marks["__erase_key"], "left_anti"
        )
    if action != "pseudonymize":
        raise ValueError(f"unknown erasure action: {action!r}")
    hit = F.col("__erase_key").isNotNull()
    joined = df.join(F.broadcast(marks), df[key] == marks["__erase_key"], "left")
    out = []
    for name in df.columns:
        dtype = dict(df.dtypes)[name]
        if name == key:
            out.append(
                F.when(hit, F.md5(F.col(name).cast("string")))
                .otherwise(F.col(name).cast("string"))
                .alias(name)
            )
        elif name in redact_cols:
            out.append(F.when(hit, F.lit(None).cast(dtype)).otherwise(F.col(name)).alias(name))
        else:
            out.append(F.col(name))
    return joined.select(*out)


def erasure_cascade(
    subjects: DataFrame,
    subject_key: str,
    tables: dict[str, dict],
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Apply one erasure request across every table that references the
    subject, returning ``(transformed_tables, audit)``.

    ``tables`` maps table name → ``{"df": frame, "key": col,
    "action": "delete"|"pseudonymize", "redact_cols": [...]}``. The
    audit has one row per table — affected/kept counts, distinct
    surrogates minted, and ``n_residual_links``: rows in the TRANSFORMED
    output still carrying an erased key in cleartext, recomputed from
    the output itself (the compliance proof, not an assumption). A
    correct cascade has 0 residuals everywhere.
    """
    marks = subjects.select(F.col(subject_key).alias("__erase_key")).dropDuplicates()
    transformed: dict[str, DataFrame] = {}
    audits = []
    for name, spec in tables.items():
        df, key, action = spec["df"], spec["key"], spec.get("action", "delete")
        out = erase_subjects(
            df, subjects, key, subject_key, action, spec.get("redact_cols", ())
        )
        transformed[name] = out
        affected = df.join(
            F.broadcast(marks), df[key] == marks["__erase_key"], "left_semi"
        )
        n_affected = affected.count()
        n_kept = out.count()
        if action == "pseudonymize":
            n_surr = affected.select(F.countDistinct(key).alias("n")).first()["n"]
        else:
            n_surr = 0
        residual = out.join(
            F.broadcast(marks),
            out[key].cast("string") == marks["__erase_key"].cast("string"),
            "left_semi",
        )
        audits.append((name, action, n_affected, n_kept, n_surr, residual.count()))
    spark = subjects.sparkSession
    audit = arrow_local_df(
        spark,
        audits,
        "table_name string, action string, n_affected bigint, n_kept bigint, "
        "n_distinct_surrogates bigint, n_residual_links bigint",
    )
    return transformed, audit


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier
    combination — the re-identification risk check run BEFORE a
    dataset ships (Sweeney's k-anonymity: every quasi-identifier group
    must hide ≥ k individuals; Machanavajjhala's l-diversity: and show
    ≥ l distinct sensitive values, or a k-large group still leaks when
    everyone in it shares the secret).

    Returns one row per quasi-identifier group: ``(quasi_cols…,
    n_rows, n_sensitive, k_violation, l_violation)``. Publishing
    guidance: suppress or generalize the violating groups — this audit
    is the decision input, not the transform (pair with apply_masking
    / erase_subjects for the fix).

    Plan: ONE aggregate keyed on the quasi-identifier (count +
    count_distinct fused); groups through the exchange are the QI
    cardinality, not the row count.
    """
    if k <= 0 or l <= 0:
        raise ValueError(f"k and l must be positive (got k={k}, l={l})")
    if not quasi_cols:
        raise ValueError("k_anonymity_audit requires quasi-identifier columns")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
    ).select(
        *quasi_cols,
        "n_rows",
        "n_sensitive",
        (F.col("n_rows") < k).alias("k_violation"),
        (F.col("n_sensitive") < l).alias("l_violation"),
    )
