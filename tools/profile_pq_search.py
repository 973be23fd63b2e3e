"""Profile one rep of the bench's partitioned_pq_search at sf0.1 to
root-cause the r10 2.905 -> 3.448 s drift (VERDICT r10 "what's wrong"
#1). Reproduces bench.py's exact setup (8 shards, same query load),
then times individual suspects: the per-call queries.count(), the
broadcast-exchange construction, and the full call."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .appName("profile_pq_search")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from vamana_spark.params import VamanaParams
from vamana_spark.index.partitioned import PartitionedVamanaIndex

emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
    F.col("vec_id"), F.col("embedding")
)
pparams = VamanaParams(dim=64, alpha=1.2, R=32, L=64, ef_search=100, seed=42)
pidx = PartitionedVamanaIndex.build(spark, emb, pparams, num_shards=8)
pidx.shards_df = pidx.shards_df.cache()

# bench's big query load: same as ann_search_sustained
allq = emb.select(
    F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
)
n = emb.count()
reps_mult = max(1, 2000 // max(n, 1))
big = allq
for _ in range(reps_mult - 1):
    big = big.union(allq)
big = big.cache()
n_big = big.count()
print(f"n={n} n_big={n_big}")

pidx.search_pq(allq.limit(5), k=10).count()  # warm pq pack

# suspect 1: the per-call count job
t0 = time.time()
for _ in range(4):
    big.count()
print(f"count(big) x4: {time.time()-t0:.3f} s")

# full call, 3 reps
for rep in range(3):
    t0 = time.time()
    pidx.search_pq(big, k=10).count()
    print(f"search_pq rep{rep}: {time.time()-t0:.3f} s")

# suspect 2: force the pre-r10 shuffle-join path via the module knob
import vamana_spark.index.partitioned as P

P._RERANK_BCAST_ROWS = 0
for rep in range(3):
    t0 = time.time()
    pidx.search_pq(big, k=10).count()
    print(f"search_pq nobcast rep{rep}: {time.time()-t0:.3f} s")
P._RERANK_BCAST_ROWS = 4_000_000

spark.stop()
