#!/usr/bin/env python
"""Plan + job/stage evidence for the r15 minhash_near_dups rewrite.

localCheckpoint barriers execute during DataFrame CONSTRUCTION, so the
final `.explain` alone cannot show them (they appear only as `Scan
ExistingRDD` leaves). This tool therefore records, for one full
`q_minhash_pairs`-shaped run at sf0.1:

  - the executed final plan (`explain("formatted")`),
  - the number of Spark jobs and stages the whole operator submitted
    (statusTracker delta, construction + count), and
  - the row count (must match between versions).

Run at HEAD for the "after" side and from a worktree of the pre-change
commit (b286dc8) with VSP_CODE_ROOT for the "before" side:

    python tools/dump_minhash_plans.py plans/r15 after
    VSP_CODE_ROOT=/tmp/pre_fuse_worktree \
        python tools/dump_minhash_plans.py plans/r15 before
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.environ.get("VSP_CODE_ROOT", _REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r15"
    tag = sys.argv[2] if len(sys.argv) > 2 else "after"
    os.makedirs(outdir, exist_ok=True)

    from vamana_spark.operators import dedup
    from vamana_spark.plans import declared as D
    from vamana_spark.session import get_session

    spark = get_session("minhash_plan_dump")
    sc = spark.sparkContext
    docs = D._docs(spark, SF_DIR)

    def jobs_stages():
        st = sc.statusTracker()
        jids = st.getJobIdsForGroup(None) or []
        stages = sum(
            len(st.getJobInfo(j).stageIds or []) for j in jids if st.getJobInfo(j)
        )
        return len(jids), stages

    j0, s0 = jobs_stages()
    pairs = dedup.minhash_near_dups(docs, threshold=0.5).orderBy("a_id", "b_id")
    n = pairs.count()
    j1, s1 = jobs_stages()

    buf = io.StringIO()
    with redirect_stdout(buf):
        pairs.explain("formatted")
    path = os.path.join(outdir, f"minhash_near_dups_{tag}.txt")
    with open(path, "w") as f:
        f.write(
            f"-- minhash_near_dups @ {tag}: rows={n}, "
            f"jobs={j1 - j0}, stages={s1 - s0} "
            f"(construction localCheckpoints + final count)\n"
        )
        f.write(buf.getvalue())
    print(f"wrote {path} rows={n} jobs={j1 - j0} stages={s1 - s0}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
