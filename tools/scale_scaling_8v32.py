#!/usr/bin/env python
"""8-core vs 32-core scaling A/B at a 10M-doc rung for the four corpus
operators the r14 8v32 block measured at ratio ≈ 1 at sf0.1
(VERDICT r14 #5: `exact_dedup` 1.09, `incremental_dedup` 1.03,
`quality_pipeline` 1.09, `dsir_sample` 0.89 — all fixed-cost-bound at
that SF). The hypothesis to test: these are map/agg shapes that DO
parallelize once the data dwarfs the per-query fixed cost; sf0.1 is
simply too small to show it. If any stays ≈1 at 10M, that is a real
serialization to find (guide §2.5/§2.6).

Method: a deterministic 10M-doc corpus is generated once under /tmp
(Spark expressions, seeded by doc_id — no RNG), then each operator
composition (identical to the bench cells) is timed in CHILD processes
at local[32] and local[8], interleaved 32/8/32/8 with min-of-2 per
core count so a throttle wave cannot land on only one side.

    python tools/scale_scaling_8v32.py              # full rung
    N_DOCS=1000000 python tools/scale_scaling_8v32.py   # pilot
    python tools/scale_scaling_8v32.py --run 32     # (internal) child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("N_DOCS", str(10_000_000)))
DATA = os.environ.get("SCALE_DATA_DIR", f"/tmp/vsp_scale_docs_{N_DOCS}")
REPS = int(os.environ.get("REPS", "2"))
OPS = ("exact_dedup", "incremental_dedup", "quality_pipeline", "dsir_sample")


def _gen(spark) -> None:
    """10M docs: ~20% verbatim duplicates (text keyed by doc_id % 80%N),
    24 deterministic tokens each, ~30% lang='en'. All expressions are
    seeded by doc_id — same corpus every run."""
    from pyspark.sql import functions as F

    n_base = int(N_DOCS * 0.8)
    base = F.col("id") % n_base
    toks = [
        F.concat(F.lit("w"), F.conv(F.xxhash64(base, F.lit(i)).cast("string"), 10, 36))
        for i in range(24)
    ]
    df = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *toks).alias("text"),
        F.when(F.col("id") % 10 < 3, "en")
        .when(F.col("id") % 10 < 6, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    df.write.mode("overwrite").parquet(DATA)


def _pipelines(spark, docs):
    from pyspark.sql import functions as F

    from vamana_spark.operators import dedup as DD, text as T
    from vamana_spark.operators.sampling import dsir_sample

    def exact():
        return DD.exact_dedup(docs).select("doc_id").count()

    def incremental():
        seen = docs.where(F.col("doc_id") % 3 != 0)
        batch = (
            docs.where(F.col("doc_id") % 3 == 0)
            .select((F.col("doc_id") + 100_000_000).alias("doc_id"), "text")
            .unionByName(
                docs.where((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 7 == 0))
                .select((F.col("doc_id") + 200_000_000).alias("doc_id"), "text")
            )
        )
        return DD.incremental_dedup(batch, seen).select("doc_id").count()

    def quality():
        gated = (
            T.gopher_quality_filter(docs)
            .where((F.col("n_words") >= 10) & (F.col("alpha_word_frac") > 0.5))
            .select("doc_id")
        )
        kept = docs.join(gated, "doc_id").select("doc_id", "text")
        return DD.dedup_lines(T.pii_scrub(kept)).count()

    def dsir():
        return dsir_sample(docs, F.col("lang") == "en", n=500, seed=7).count()

    return {
        "exact_dedup": exact,
        "incremental_dedup": incremental,
        "quality_pipeline": quality,
        "dsir_sample": dsir,
    }


def child(cpus: int) -> int:
    from vamana_spark.session import get_session

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = get_session(f"scale8v32_c{cpus}", master=f"local[{cpus}]",
                        shuffle_partitions=cpus)
    if not os.path.isdir(DATA):
        _gen(spark)
    docs = spark.read.parquet(DATA)
    out = {}
    pipes = _pipelines(spark, docs)
    for op in OPS:
        spark.sparkContext.setJobDescription(f"scale8v32 c{cpus}: {op}")
        t0 = time.perf_counter()
        n = pipes[op]()
        out[op] = round(time.perf_counter() - t0, 3)
        out[f"{op}_rows"] = n
    print("CHILD_JSON:" + json.dumps({"cpus": cpus, **out}), flush=True)
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        return child(int(sys.argv[2]))

    # generate once (32 cores, untimed) before any timed child
    if not os.path.isdir(DATA):
        from vamana_spark.session import get_session

        spark = get_session("scale8v32_gen")
        _gen(spark)
        spark.stop()

    results = {32: [], 8: []}
    rows_seen = {}
    for rep in range(REPS):
        for cpus in (32, 8):
            p = subprocess.run(
                [sys.executable, __file__, "--run", str(cpus)],
                capture_output=True, text=True,
            )
            line = [
                ln for ln in p.stdout.splitlines() if ln.startswith("CHILD_JSON:")
            ]
            if not line:
                print(f"child c{cpus} rep{rep} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
                return 1
            rec = json.loads(line[0][len("CHILD_JSON:"):])
            results[cpus].append(rec)
            for op in OPS:
                key = f"{op}_rows"
                rows_seen.setdefault(key, set()).add(rec[key])
            print(f"rep {rep} c{cpus}: "
                  + " ".join(f"{op}={rec[op]}" for op in OPS), flush=True)
    for key, vals in rows_seen.items():
        assert len(vals) == 1, f"{key} differed across runs: {vals}"
    summary = {"n_docs": N_DOCS, "reps": REPS}
    for op in OPS:
        lo8 = min(r[op] for r in results[8])
        lo32 = min(r[op] for r in results[32])
        summary[op] = {
            "c8_min_sec": lo8,
            "c32_min_sec": lo32,
            "ratio_8_over_32": round(lo8 / lo32, 2),
        }
    print("SUMMARY_JSON:" + json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
