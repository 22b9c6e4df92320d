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
