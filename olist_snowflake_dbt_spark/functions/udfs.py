"""The Python UDF surface: scalar Pandas UDF, grouped-agg Pandas UDF,
and a Python UDTF — one production-shaped example of each, completing
the UDF/UDAF/UDTF family alongside the mapInPandas (multimodal/media),
applyInPandas (similarity.group_vector_sums) and
applyInPandasWithState (streaming/events) operators.

UDFs are the slow path by design (guide rule): everything here either
genuinely needs Python (zlib) or exists to keep the surface exercised
with an oracle twin. All are Arrow-batched — never row-at-a-time
pickling.

The reference has NO UDF surface at all (its `macros/` dir is empty —
`$REF/macros/.gitkeep`); this module is an engine extension.
"""

from __future__ import annotations

import decimal
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# return types are DataType OBJECTS, not DDL strings: string return
# types are parsed through the active SparkContext, which does not
# exist yet when this module is imported by the query registry


@pandas_udf(T.DoubleType())
def compression_ratio(text: pd.Series) -> pd.Series:
    """deflate(level 6) bytes / raw bytes — a cheap entropy proxy used
    as a training-data quality signal (boilerplate and template spam
    compress far below prose). Needs Python's zlib, so this is a REAL
    pandas-UDF use case, not a built-in in disguise; Arrow ships the
    batch, one C call per document. Deterministic: zlib output is fully
    specified by (input, level)."""
    def ratio(t: str | None) -> float | None:
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return None
        return len(zlib.compress(raw, 6)) / len(raw)

    return text.map(ratio)


@pandas_udf(T.DecimalType(38, 2))
def decimal_sum_agg(values: pd.Series) -> decimal.Decimal:
    """Grouped-aggregate Pandas UDF: exact decimal sum of a double
    column, entering each double as its shortest decimal repr (matches
    any engine's float→string; see operators/similarity.
    group_vector_sums for the full parity argument). Spark plans this
    as a real AggregateInPandas over the group shuffle — the UDAF
    surface, verified against a plain SQL SUM oracle."""
    q2 = decimal.Decimal("0.01")
    total = decimal.Decimal(0)
    for v in values:
        if v is not None and v == v:  # skip None/NaN like SQL SUM
            total += decimal.Decimal(repr(float(v))).quantize(
                q2, rounding=decimal.ROUND_HALF_UP
            )
    return total.quantize(q2)


class ChunkWords:
    """Python UDTF: explode a document into fixed-size word chunks with
    1-based positions — the table-function surface
    (`spark.udtf.register` + LATERAL join), in the shape a
    context-window packer uses (N-token pseudo-sentences). The naive
    word split is the point: it has an exact SQL twin
    (string_split + list slices), so the UDTF plumbing itself — row
    fan-out, ordering, NULL handling — is what the oracle checks.
    NULL text yields no rows, like UNNEST(NULL)."""

    WIDTH = 8

    def eval(self, text: str | None) -> Iterator[tuple[int, str, int]]:
        if text is None:
            return
        ws = text.split(" ")
        for i in range(0, len(ws), self.WIDTH):
            chunk = ws[i : i + self.WIDTH]
            yield i // self.WIDTH + 1, " ".join(chunk), len(chunk)


def register_udfs(spark) -> None:
    """Register the SQL-callable members (idempotent)."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "chunk_words",
        udtf(ChunkWords, returnType="chunk_idx int, chunk string, n_words int"),
    )
    # polymorphic UDTF: NO returnType — the schema comes from analyze()
    spark.udtf.register("parse_delimited", udtf(ParseDelimited))


class ParseDelimited:
    """POLYMORPHIC Python UDTF (PySpark 4 ``analyze()`` API): splits a
    delimited string into named columns where the OUTPUT SCHEMA is
    derived at plan time from the constant ``fields`` argument —
    ``parse_delimited(col, '-', 'code,name')`` yields columns
    ``(code string, name string)``; a different fields spec compiles to
    a different schema with no code change. This is the dynamic-schema
    table-function surface (Spark's AnalyzeResult contract): analyze()
    runs ONCE on the driver with the literal arguments, eval() streams
    rows on executors. Missing parts yield NULL; NULL input yields no
    row (UNNEST(NULL) convention, same as ChunkWords)."""

    @staticmethod
    def analyze(*args):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import StringType, StructType

        if len(args) != 3 or args[2].value is None:
            raise ValueError(
                "parse_delimited(text, delim, fields) needs a constant "
                "fields argument"
            )
        schema = StructType()
        for name in str(args[2].value).split(","):
            schema = schema.add(name.strip(), StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text, delim, fields):
        if text is None:
            return
        names = str(fields).split(",")
        parts = str(text).split(str(delim))
        row = tuple(
            parts[i] if i < len(parts) else None for i in range(len(names))
        )
        yield row
