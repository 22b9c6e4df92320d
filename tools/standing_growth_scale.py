"""Standing-state growth lane for the incremental dedup operators
(VERDICT r12 #4): the 100-TB story of ``incremental_dedup`` /
``incremental_minhash_dedup`` is a STANDING index that grows round
over round while each admitted batch stays epoch-sized — but the
two-decade lane scales the BATCH. This lane holds the batch fixed
(the sf0.1 ``documents`` table) and grows the standing side
1x/10x/100x, measuring admission wall per standing size.

Standing-side construction: the standing index is just a column of
keys (band strings / fingerprints) — its provenance doesn't affect
admission cost — so the lane synthesizes it directly instead of
re-minhashing a 100x corpus (which is exactly what the operators
exist to avoid): a PLANTED slice (2% of the batch's own keys — the
rejected set, identical at every scale so the admitted count is a
cross-scale invariant the lane asserts) plus uniform md5 filler keys
that collide with nothing.

Reading it: ``wall`` should track the standing-side scan — linear in
standing rows with full parallelism, so the wall RATIO per decade of
standing growth stays far under 10 while the batch-side signing cost
(constant) dominates at small standing sizes. ``admitted`` must be
byte-identical across scales.

Results merge into SCALING.json under
``queries.<name>.standing_growth``.

Usage: python tools/standing_growth_scale.py [--scales 1,10,100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import local_env  # noqa: E402,F401

SF_DIR = "/root/testdata/sf0.1"
PLANT_MOD = 50  # every 50th batch key is planted into standing (2%)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,100")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from olist_snowflake_dbt_spark.operators.dedup import (
        incremental_dedup,
        incremental_minhash_dedup,
        minhash_banded,
    )
    from olist_snowflake_dbt_spark.functions.text import fingerprint
    from olist_snowflake_dbt_spark.session import get_spark

    spark = get_spark("standing_growth")
    spark.range(1).count()

    batch = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint()
    )

    # the batch's own key populations, used for the planted slice and to
    # size the filler so "scale 1" means "standing ~= one prior batch"
    batch_bands = (
        minhash_banded(batch, "text", "doc_id", 3, 64, 16)
        .select(F.col("__band").alias("band"))
        .localCheckpoint()
    )
    batch_fps = (
        batch.select(fingerprint("text").alias("doc_fingerprint"))
        .localCheckpoint()
    )
    n_bands = batch_bands.count()
    n_fps = batch_fps.count()

    def planted(df, col):
        # deterministic 2% slice: md5 of the key itself picks the rows,
        # so the same keys are planted at every scale
        return df.filter(
            F.abs(F.hash(F.col(col))) % PLANT_MOD == 0
        )

    def filler(n_rows, col, tag):
        # uniform md5 strings collide with nothing real (the key spaces
        # are md5/band-structured; a raw md5 hex string matches neither
        # a band's "i|h|h|h|h" shape nor any real text fingerprint
        # except with ~2^-128 odds)
        return spark.range(n_rows).select(
            F.md5(F.concat(F.lit(tag), F.col("id").cast("string"))).alias(col)
        )

    def wall_of(make_df) -> float:
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            make_df().write.format("noop").mode("overwrite").save()
            e = time.perf_counter() - t0
            best = e if best is None else min(best, e)
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        return round(best, 2)

    lanes = {
        "dedup_incremental_minhash": {
            "base_rows": n_bands,
            "planted": planted(batch_bands, "band"),
            "col": "band",
            "run": lambda standing: incremental_minhash_dedup(
                batch, standing, "text", "doc_id", 3, 64, 16
            ),
        },
        "dedup_incremental_corpus": {
            "base_rows": n_fps,
            "planted": planted(batch_fps, "doc_fingerprint"),
            "col": "doc_fingerprint",
            "run": lambda standing: incremental_dedup(
                batch, standing, "text", "doc_id"
            ),
        },
    }

    results: dict[str, dict] = {}
    for name, lane in lanes.items():
        out: dict[str, dict] = {"batch_rows": batch.count()}
        admitted_counts = []
        for scale in scales:
            n_fill = lane["base_rows"] * scale
            standing = lane["planted"].unionByName(
                filler(n_fill, lane["col"], f"{name}-fill")
            ).localCheckpoint()
            standing_rows = standing.count()
            admitted = lane["run"](standing).count()
            admitted_counts.append(admitted)
            w = wall_of(lambda: lane["run"](standing))
            out[f"x{scale}"] = {
                "standing_rows": standing_rows,
                "admitted": admitted,
                "wall": w,
            }
            print(name, f"x{scale}", out[f"x{scale}"], flush=True)
        if len(set(admitted_counts)) != 1:
            sys.exit(
                f"{name}: admitted count varied across standing scales "
                f"({admitted_counts}) — the planted slice must be the "
                "only rejection source at every scale"
            )
        results[name] = out

    path = os.path.join(REPO, "SCALING.json")
    with open(path) as fh:
        scaling = json.load(fh)
    for name, out in results.items():
        scaling["queries"].setdefault(name, {})["standing_growth"] = out
    with open(path, "w") as fh:
        json.dump(scaling, fh, indent=1, sort_keys=True)
    print(json.dumps({"standing_growth": results}))


if __name__ == "__main__":
    main()
