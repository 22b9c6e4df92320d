"""Plan-keyed query result cache (Snowflake result-cache analogue).

Snowflake serves a repeated query from its result cache when the query
text matches and the underlying tables are unchanged. This module is
the Spark-native version of that contract for a warehouse whose tables
are published immutably (every materialization in this repo is an
atomic-swap or generation publish — a table's content only changes by
REPLACING it, never in place):

- the cache key is the ANALYZED-PLAN fingerprint
  (``DataFrame.semanticHash``) plus a schema digest — two logically
  equal queries (alias changes, reordered projections Catalyst
  normalizes away) share an entry, while any change to source paths,
  filters, or literals produces a new key;
- a hit is a parquet read of the stored result — no recompute, no
  shuffle, plan cost O(result);
- a miss computes once and publishes via tmp-dir + atomic rename, so
  concurrent misses of the same key race benignly (last rename wins,
  both serve correct data) and a crash mid-write caches nothing.

Staleness contract (stated, not guessed): semanticHash covers the
SOURCE PATHS, not file contents. With generation-style publishes
(plans/timetravel.VersionedTable) a new version is a NEW path → new
key, so caching is automatically correct. With in-place swap publishes
(materialize_table) the path survives republish; callers on that
surface must ``invalidate()`` after publishing, exactly like any
path-keyed cache (dbt's adapter cache has the same rule).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ResultCache:
    def __init__(self, spark: SparkSession, cache_dir: str):
        self.spark = spark
        self.root = cache_dir
        os.makedirs(self.root, exist_ok=True)

    def _key(self, df: DataFrame) -> str:
        schema_digest = hashlib.md5(
            df.schema.json().encode()
        ).hexdigest()[:16]
        return f"{df.semanticHash() & 0xFFFFFFFF:08x}-{schema_digest}"

    def _entry(self, key: str) -> str:
        return os.path.join(self.root, key)

    def lookup(self, df: DataFrame) -> DataFrame | None:
        """The cached result for this plan, or None. A hit preserves the
        exact result schema (parquet read with the recorded schema)."""
        path = self._entry(self._key(df))
        if not os.path.exists(os.path.join(path, "_manifest.json")):
            return None
        return self.spark.read.schema(df.schema).parquet(path)

    def get_or_compute(self, df: DataFrame) -> tuple[DataFrame, bool]:
        """Serve from cache or compute-and-publish. Returns
        ``(result, was_hit)``."""
        hit = self.lookup(df)
        if hit is not None:
            return hit, True
        key = self._key(df)
        final = self._entry(key)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            json.dump({"key": key, "created_at": time.time()}, f)
        if os.path.exists(final):  # benign race: an equal result landed
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            os.rename(tmp, final)
        return self.spark.read.schema(df.schema).parquet(final), False

    def invalidate(self, df: DataFrame | None = None) -> int:
        """Drop one plan's entry (or everything with ``None``) — the
        hook an in-place republish must call. Returns entries removed."""
        if df is not None:
            path = self._entry(self._key(df))
            if os.path.exists(path):
                shutil.rmtree(path)
                return 1
            return 0
        n = 0
        for entry in os.listdir(self.root):
            p = os.path.join(self.root, entry)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                n += 1
        return n
