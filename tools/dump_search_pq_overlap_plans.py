#!/usr/bin/env python
"""Evidence for the r14 `search_pq` overlap-dedup rewrite (VERDICT r14,
"What's wrong" #2 / Next-round #2): the committed r14 plan pair was
dumped from the bench configuration (overlap=1, forced shortlist
broadcast), which never executes the rewritten branch, so the before
and after plans were structurally identical.

This tool dumps the branch that DOES differ: ``overlap=2`` with
broadcast joins user-disabled (``autoBroadcastJoinThreshold=-1`` — the
same at-scale-shape audit configuration r14 used for minhash), where
``bcast`` is False and the broadcast steering hint is withheld.

- ``after``: HEAD's ``search_pq`` (dedup = row_number window after the
  distance projection, sharing the rank window's query_id clustering).
- ``before``: the pre-r14 code (``dropDuplicates(["query_id","vec_id"])``
  on the candidate rows BEFORE the projection — its own Exchange keyed
  (query_id, vec_id) carrying the full ``_pv`` vector), executed from a
  git worktree of 502997b~1 by pointing ``VSP_CODE_ROOT`` at it.

Both invocations also write the executed result (sorted rows) so the
two formulations can be diffed for bit-identical output.

Usage:
    python tools/dump_search_pq_overlap_plans.py plans/r15 after
    VSP_CODE_ROOT=/tmp/pre_r14_worktree \
        python tools/dump_search_pq_overlap_plans.py plans/r15 before
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.environ.get("VSP_CODE_ROOT", _REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r15"
    tag = sys.argv[2] if len(sys.argv) > 2 else "after"
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    from vamana_spark import VamanaParams
    from vamana_spark.index.partitioned import PartitionedVamanaIndex
    from vamana_spark.session import get_session

    spark = get_session("search_pq_overlap_evidence")
    # at-scale shape: broadcasts disabled by the user -> bcast False and
    # the corpus-side steering hint withheld on HEAD; the pre-r14 code
    # takes its plain-join branch. Routing/merge paths are identical.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
        .cache()
    )
    emb.count()
    queries = emb.where(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    params = VamanaParams(dim=64, alpha=1.2, R=32, L=64, ef_search=100, seed=42)
    idx = PartitionedVamanaIndex.build(
        spark, emb, params, num_shards=4, overlap=2
    )
    res = idx.search_pq(queries, k=10, pq_m=8, rerank=100)

    buf = io.StringIO()
    with redirect_stdout(buf):
        res.explain("formatted")
    plan_path = os.path.join(outdir, f"search_pq_overlap_{tag}.txt")
    with open(plan_path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", plan_path)

    rows = sorted(
        (r.query_id, r.vec_id, float(r.dist), r.rank) for r in res.collect()
    )
    out_path = os.path.join("/tmp", f"search_pq_overlap_rows_{tag}.txt")
    with open(out_path, "w") as f:
        for t in rows:
            f.write(repr(t) + "\n")
    print("wrote", out_path, f"({len(rows)} rows)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
