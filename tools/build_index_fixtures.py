#!/usr/bin/env python
"""Build the deterministic prebuilt-index fixtures (VERDICT r6 #4).

The reference's own test strategy is a save -> load round-trip
(main.cpp:71-82): build once, persist, assert against the LOADED
artifact. Graph builds here are seeded but not bit-stable across Spark
task layouts, so graph-dependent oracle queries were rows-only. This
tool freezes one build per testdata scale into
``tests/fixtures/vamana/<sf>/{base,appended,deleted,partitioned}``;
the declared queries load these, making degree stats, reachability,
and mutation outputs bit-deterministic and DuckDB-oracle-able
(the oracle SQL reads the fixture parquet directly).

Variants (all dim=64, alpha=1.2, R=32, L=64, ef=100, seed=42 — the
same params the live-build queries use):
  base        — VamanaIndex.build on the full embeddings table
  appended    — build on vec_id % 5 != 0, then add_points the rest
  deleted     — build on the full table, then delete_points vec_id%10==3
  partitioned — PartitionedVamanaIndex.build, 4 shards, overlap 1

Run after a kernel change that should alter fixture content:
    python tools/build_index_fixtures.py
then commit the refreshed fixture files.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ("sf0.001", "sf0.01", "sf0.1")


def _clean(path: str) -> None:
    """Drop Spark's _SUCCESS / .crc bookkeeping so the committed fixture
    is just parquet + _meta.json."""
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f == "_SUCCESS" or f.endswith(".crc"):
                os.remove(os.path.join(root, f))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from vamana_spark import VamanaParams
    from vamana_spark.index.partitioned import PartitionedVamanaIndex
    from vamana_spark.index.vamana import VamanaIndex

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def params() -> VamanaParams:
        return VamanaParams(
            dim=64, alpha=1.2, R=32, L=64, ef_search=100, seed=42
        )

    summary: dict = {}
    for sf in SFS:
        emb = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet").cache()
        n = emb.count()
        out = os.path.join(REPO, "tests", "fixtures", "vamana", sf)
        if os.path.exists(out):
            shutil.rmtree(out)

        def one_file(idx):
            # committed fixtures read nicer as one parquet per table
            idx.points_df = idx.points_df.coalesce(1)
            idx.graph_df = idx.graph_df.coalesce(1)
            return idx

        base = one_file(VamanaIndex.build(spark, emb, params()))
        base.save(os.path.join(out, "base"))

        appended = one_file(
            VamanaIndex.build(
                spark, emb.where(F.col("vec_id") % 5 != 0), params()
            ).add_points(emb.where(F.col("vec_id") % 5 == 0))
        )
        appended.save(os.path.join(out, "appended"))

        deleted = one_file(
            VamanaIndex.build(spark, emb, params()).delete_points(
                emb.where(F.col("vec_id") % 10 == 3).select("vec_id")
            )
        )
        deleted.save(os.path.join(out, "deleted"))

        pidx = PartitionedVamanaIndex.build(spark, emb, params(), num_shards=4)
        pidx.shards_df = pidx.shards_df.coalesce(1)
        pidx.save(os.path.join(out, "partitioned"))

        _clean(out)
        with open(os.path.join(out, "base", "_meta.json")) as f:
            medoid = json.load(f).get("medoid")
        summary[sf] = {"n": n, "base_medoid": medoid}
        print(json.dumps({sf: summary[sf]}), flush=True)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
