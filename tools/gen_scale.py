"""Generate a LOCAL sf1 dataset by replicating the driver's sf0.1 tables
10x with FK-consistent key offsets (VERDICT r06 #1: the scale-proof lane
needs a data point beyond sf0.1, and /root/testdata is read-only, so sf1
lives under the repo at benchdata/sf1 — gitignored, regenerated on
demand).

Replication scheme (deterministic, seed-free):

- ``region``/``nation`` copy verbatim (fixed dimensions, as in TPC-H
  scaling: SF grows fact rows and key populations, never the 25 nations).
- keyed tables replicate 10x with ``key + replica * OFFSET`` on every
  pk/fk column using ONE offset (10M) — FK integrity holds within each
  replica, so joins scale like real TPC-H: 10x distinct keys, unchanged
  per-key group sizes, same date/status distributions.
- ``documents.text`` gets every token prefixed with the replica tag for
  replicas > 0: replicas share NO shingles, so the corpus keeps sf0.1's
  internal dup-rate instead of turning into a 10-way exact-dup corpus
  (which would measure the dedup operators on a pathological input, not
  a scaled one).
- ``embeddings.embedding`` is rotated by ``replica`` positions — norm
  preserved, direction changed — so replicas aren't cosine-identical
  and ANN candidate structure scales instead of collapsing into
  10-cliques.

Usage: python tools/gen_scale.py [target_dir] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OFFSET = 10_000_000
SRC = "/root/testdata/sf0.1"

COPY_TABLES = ("region", "nation")
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("target", nargs="?", default=os.path.join(REPO, "benchdata", "sf1"))
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default=SRC)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from olist_snowflake_dbt_spark.session import get_spark

    spark = get_spark("gen_scale")
    os.makedirs(args.target, exist_ok=True)

    for t in COPY_TABLES:
        df = spark.read.parquet(f"{args.src}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{args.target}/{t}.parquet")
        print(f"{t}: copied {df.count()} rows")

    # one replica column via explode keeps this a single distributed
    # plan per table (no driver-side union loop over 10 reads)
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(args.replicas - 1))
    ).alias("__rep")
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{args.src}/{t}.parquet").select("*", reps)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__rep").cast("long") * OFFSET)
        if t == "documents":
            # replica tag into every token -> disjoint shingle universes
            df = df.withColumn(
                "text",
                F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                    F.regexp_replace(
                        "text", r"(\S+)", F.concat(F.lit("r"), F.col("__rep"), F.lit("$1"))
                    )
                ),
            ).withColumn("n_chars", F.length("text"))
        if t == "embeddings":
            n = F.size("embedding")
            df = df.withColumn(
                "embedding",
                F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.slice("embedding", F.col("__rep") % n + 1, n),
                        F.slice("embedding", F.lit(1), F.col("__rep") % n),
                    )
                ),
            ).withColumn(
                # block-key cardinality must scale WITH the corpus (the
                # operators' documented design: semantic clusters with
                # k ∝ n, SemDeDup-style). Keeping the 10 sf0.1 labels at
                # 10x rows would make every label-blocked operator
                # measure the fixed-cardinality-blocking anti-pattern
                # (10x block size -> 100x pairs), not its scaling.
                "label",
                F.col("label") + F.col("__rep") * F.lit(100),
            )
        if t == "part":
            # tag the name's FIRST word per replica: replicated-verbatim
            # names would make sf1 a table with 10 exact copies of every
            # entity — a worst-case duplicate pile where fuzzy matching
            # legitimately returns 100x the pairs. Real growth adds NEW
            # entities. Prefixing (not replacing) keeps every substring,
            # so TPC-H LIKE '%...%' predicates (Q9 et al.) match the
            # same rows.
            df = df.withColumn(
                "p_name",
                F.when(F.col("__rep") == 0, F.col("p_name")).otherwise(
                    F.concat(F.lit("r"), F.col("__rep"), F.col("p_name"))
                ),
            )
        if t == "events":
            # nudge timestamps per replica so event-time windows don't
            # see 10 exact-duplicate streams (same second, 10x rows)
            df = df.withColumn(
                "ts", F.col("ts") + F.make_dt_interval(secs=F.col("__rep"))
            )
        out = df.drop("__rep")
        out.write.mode("overwrite").parquet(f"{args.target}/{t}.parquet")
        print(f"{t}: {out.count()} rows")

    print(f"done -> {args.target}")


if __name__ == "__main__":
    main()
