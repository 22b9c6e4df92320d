"""MATCH_RECOGNIZE subset: row-pattern matching over ordered partitions.

Snowflake (and ISO SQL:2016) ``MATCH_RECOGNIZE`` finds regex-shaped
patterns over row sequences — sessions, funnels, V-shapes — something
Spark SQL has no native operator for. The reference's warehouse dialect
ships it (Snowflake docs, "MATCH_RECOGNIZE"); the migration surface here
re-expresses the common subset Spark-first:

- ``PARTITION BY``/``ORDER BY``: each partition is matched independently
  — embarrassingly parallel, ONE shuffle total (the groupBy), identical
  scale shape to sessionization.
- ``DEFINE``: every pattern variable is a **Catalyst boolean column** —
  row classification is evaluated JVM-side inside whole-stage codegen
  BEFORE anything reaches Python; the Arrow kernel only ever sees a
  small int bitmask per row, never re-evaluates predicates. (Snowflake's
  ``PREV``/``NEXT`` navigation in DEFINE is expressible by passing a
  window ``lag``/``lead`` column into the predicate — same power, same
  one-shuffle plan, documented rather than re-implemented.)
- ``PATTERN``: a regex over the variable names supporting ``()``,
  ``|``, ``*``, ``+``, ``?`` and ``{m,n}`` with TRUE NFA semantics
  including backtracking — a row satisfying several DEFINEs can be
  claimed by different variables depending on pattern position. This
  works because classification is encoded as a per-row BITMASK
  character (one private-use codepoint per mask value) and each
  variable becomes the character class of all masks containing its bit,
  so Python's leftmost-greedy ``re`` engine IS the row-pattern automaton
  (greedy quantifiers + leftmost match = ISO default semantics).
- ``ONE ROW PER MATCH`` + ``AFTER MATCH SKIP PAST LAST ROW``: exactly
  ``re.finditer``'s non-overlapping scan. Zero-length matches (a
  pattern like ``A*`` on a non-A row) are skipped, mirroring
  Snowflake's refusal of empty matches.
- ``MEASURES``: ``count``/``first``/``last``/``min``/``max``/``sum``
  over a variable's rows (or ``'*'`` = all rows of the match) plus the
  implicit ``MATCH_NUMBER()`` (``match_num``) and match width
  (``n_rows``). Variable attribution for measures uses DEFINE-truth
  within the matched span — identical to pattern-position attribution
  whenever the DEFINEs are mutually exclusive (the overwhelmingly
  common event-type case), documented as the subset contract.

At 100 TB: the only data movement is one hash partition by the match
key; per-partition sequences stream through an Arrow batch; the regex
state machine is O(sequence) per partition with no cross-partition
state. Skewed keys (one user with 1% of all events) are the same story
as sessionize/windowed aggs — AQE skew-split on the exchange, and the
kernel never holds more than one partition's rows.

Greenfield vs the reference ($REF has no row-pattern surface;
SURVEY.md §2.C migration extension set).
"""

from __future__ import annotations

import re
from decimal import Decimal
from typing import Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MASK_BASE = 0x2200  # private block for mask chars; no regex metachars here

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_ALLOWED_PUNCT = set("()|*+?{},0123456789 ")


def _compile_pattern(pattern: str, variables: list[str]) -> re.Pattern:
    """Translate a row-pattern regex over variable names into a char
    regex over bitmask codepoints."""
    nvars = len(variables)
    classes = {}
    for i, v in enumerate(variables):
        chars = "".join(
            re.escape(chr(_MASK_BASE + m))
            for m in range(1 << nvars)
            if (m >> i) & 1
        )
        classes[v] = f"[{chars}]"

    out = []
    pos = 0
    while pos < len(pattern):
        m = _IDENT.match(pattern, pos)
        if m:
            name = m.group(0)
            if name not in classes:
                raise ValueError(
                    f"pattern variable {name!r} has no DEFINE entry "
                    f"(defined: {variables})"
                )
            out.append(classes[name])
            pos = m.end()
        elif pattern[pos] in _ALLOWED_PUNCT:
            if pattern[pos] != " ":
                out.append(pattern[pos])
            pos += 1
        else:
            raise ValueError(
                f"unsupported pattern character {pattern[pos]!r} "
                f"(supported: variables, '()|*+?{{m,n}}')"
            )
    return re.compile("".join(out))


def match_recognize(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: str | list[str],
    pattern: str,
    define: dict[str, Column],
    measures: Iterable[tuple[str, str, str, str]] = (),
    rows_per_match: str = "one",
) -> DataFrame:
    """Row-pattern matching (module docstring has the full subset
    contract).

    ``measures`` entries are ``(agg, var, col, alias)`` with ``agg`` in
    ``count | first | last | min | max | sum`` and ``var`` a DEFINE
    name or ``'*'``. ``first``/``last`` follow the partition's ORDER BY.
    ``sum`` requires an integral, decimal or double column (decimal
    recommended — exact and order-independent; kernel sums are
    sequential over the deterministic row order either way). Output for
    ``rows_per_match='one'`` (default): partition cols + ``match_num``
    (1-based per partition, in start order) + ``n_rows`` + one column
    per measure alias.

    ``rows_per_match='all'`` is Snowflake's ``ALL ROWS PER MATCH``:
    every matched row comes back with the partition cols, the ORDER BY
    cols, ``match_num``, ``row_num`` (1-based within the match) and
    ``classifier`` — the DEFINE variable the row satisfies, resolved by
    define-truth in declaration order (exact pattern-position
    attribution whenever the DEFINEs are mutually exclusive — the same
    subset contract as measure attribution; measures are not emitted in
    this mode). Unmatched rows are omitted, matching Snowflake's
    default. Include a unique tie-break column in ``order_by`` for
    fully deterministic results."""
    if rows_per_match not in ("one", "all"):
        raise ValueError(
            f"rows_per_match must be 'one' or 'all', got {rows_per_match!r}"
        )
    part_cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    variables = list(define)
    if not variables:
        raise ValueError("define must name at least one pattern variable")
    if len(variables) > 8:
        raise ValueError(
            f"at most 8 pattern variables supported, got {len(variables)} "
            "(bitmask alphabet grows 2^n)"
        )
    measures = list(measures)
    if rows_per_match == "all" and measures:
        raise ValueError(
            "measures are emitted only with rows_per_match='one' "
            "(ALL ROWS PER MATCH returns the rows themselves)"
        )
    regex = _compile_pattern(pattern, variables)

    # classification runs JVM-side: one small-int bitmask per row
    mask = F.lit(0)
    for i, v in enumerate(variables):
        mask = mask + F.when(define[v], F.lit(1 << i)).otherwise(F.lit(0))

    schema_by_name = {f.name: f for f in df.schema.fields}
    carried = set(part_cols) | set(order_cols)
    meas_cols = sorted(
        {c for _, _, c, _ in measures if c in schema_by_name} - carried
    )
    for agg, var, col, alias in measures:
        if agg not in ("count", "first", "last", "min", "max", "sum"):
            raise ValueError(f"unsupported measure agg {agg!r}")
        if var != "*" and var not in define:
            raise ValueError(f"measure variable {var!r} has no DEFINE entry")
        if agg != "count" and col not in schema_by_name:
            raise ValueError(f"measure column {col!r} not in input")

    carry = list(dict.fromkeys([*part_cols, *order_cols, *meas_cols]))
    proj = df.select(*carry, mask.alias("__mask"))

    if rows_per_match == "all":
        out_fields = [schema_by_name[c] for c in part_cols]
        out_fields += [schema_by_name[c] for c in order_cols]
        out_fields.append(StructField("match_num", LongType()))
        out_fields.append(StructField("row_num", LongType()))
        out_fields.append(StructField("classifier", StringType()))
        out_schema = StructType(out_fields)

        def all_rows_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(
                drop=True
            )
            encoded = "".join(
                chr(_MASK_BASE + int(m)) for m in pdf["__mask"]
            )
            masks = pdf["__mask"].to_numpy()
            key = tuple(pdf.iloc[0][c] for c in part_cols)
            rows: list[tuple] = []
            match_num = 0
            for m in regex.finditer(encoded):
                lo, hi = m.span()
                if hi == lo:
                    continue
                match_num += 1
                for rn, i in enumerate(range(lo, hi), start=1):
                    mk = int(masks[i])
                    classifier = next(
                        (v for b, v in enumerate(variables) if (mk >> b) & 1),
                        None,
                    )
                    rows.append(
                        key
                        + tuple(pdf.at[i, c] for c in order_cols)
                        + (match_num, rn, classifier)
                    )
            return pd.DataFrame(
                rows, columns=[f.name for f in out_fields]
            )

        return proj.groupBy(*part_cols).applyInPandas(
            all_rows_kernel, out_schema
        )

    out_fields = [schema_by_name[c] for c in part_cols]
    out_fields.append(StructField("match_num", LongType()))
    out_fields.append(StructField("n_rows", LongType()))
    for agg, _, col, alias in measures:
        if agg == "count":
            out_fields.append(StructField(alias, LongType()))
        elif agg == "sum":
            src = schema_by_name[col].dataType
            if isinstance(src, DecimalType):
                out_fields.append(
                    StructField(alias, DecimalType(38, src.scale))
                )
            elif isinstance(src, DoubleType):
                out_fields.append(StructField(alias, DoubleType()))
            else:
                out_fields.append(StructField(alias, LongType()))
        else:
            out_fields.append(StructField(alias, schema_by_name[col].dataType))
    out_schema = StructType(out_fields)

    var_bit = {v: i for i, v in enumerate(variables)}
    var_bit["*"] = None

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        encoded = "".join(chr(_MASK_BASE + int(m)) for m in pdf["__mask"])
        rows: list[tuple] = []
        match_num = 0
        key = tuple(pdf.iloc[0][c] for c in part_cols)
        masks = pdf["__mask"].to_numpy()
        for m in regex.finditer(encoded):
            lo, hi = m.span()
            if hi == lo:
                continue  # empty match — not a row match
            match_num += 1
            row: list = list(key) + [match_num, hi - lo]
            for agg, var, col, _ in measures:
                bit = var_bit[var]
                if bit is None:
                    idx = range(lo, hi)
                else:
                    idx = [i for i in range(lo, hi) if (int(masks[i]) >> bit) & 1]
                if agg == "count":
                    row.append(len(list(idx)))
                    continue
                vals = [pdf.at[i, col] for i in idx]
                vals = [v for v in vals if v is not None and v == v]
                if not vals:
                    row.append(None)
                elif agg == "first":
                    row.append(vals[0])
                elif agg == "last":
                    row.append(vals[-1])
                elif agg == "min":
                    row.append(min(vals))
                elif agg == "max":
                    row.append(max(vals))
                else:  # sum
                    acc = sum(vals[1:], start=vals[0])
                    if isinstance(acc, Decimal):
                        row.append(acc)
                    elif isinstance(vals[0], float):
                        row.append(float(acc))
                    else:
                        row.append(int(acc))
            rows.append(tuple(row))
        return pd.DataFrame(rows, columns=[f.name for f in out_fields])

    return proj.groupBy(*part_cols).applyInPandas(kernel, out_schema)
