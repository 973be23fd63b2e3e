"""MLlib-backed variants of the similarity/dedup operators.

The hand-rolled DataFrame implementations (dedup.py, similarity.py) are
the engine's primary paths — transparent plans, engine-portable hashes.
These MLlib constructions are the library-native alternatives, kept as
first-class options because they plug into ML Pipelines and their
hyperparameters are battle-tested:

- ``mllib_minhash_pairs``   — ml.feature.MinHashLSH over HashingTF'd
  shingles, approxSimilarityJoin on Jaccard distance.
- ``mllib_cosine_pairs``    — BucketedRandomProjectionLSH over normalized
  vectors (Euclidean-on-unit-sphere ≈ cosine radius join).
- ``mllib_kmeans_centers``  — ml.clustering.KMeans for IVF/shard centers
  (alternative to the seeded-sample centers used by default).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import HashingTF, MinHashLSH, BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vamana_spark.operators.dedup import shingle_sets


def mllib_minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs via MLlib MinHashLSH.

    Returns (a_id, b_id, jaccard_dist) with a_id < b_id and
    jaccard_dist <= 1 - threshold.
    """
    sh = shingle_sets(df, text_col, id_col, shingle_n)
    tf = HashingTF(
        inputCol="_sh", outputCol="_features", numFeatures=num_features, binary=True
    )
    feat = tf.transform(sh).where(F.size("_sh") > 0)
    mh = MinHashLSH(
        inputCol="_features", outputCol="_hashes",
        numHashTables=num_hash_tables, seed=seed,
    )
    model = mh.fit(feat)
    joined = model.approxSimilarityJoin(
        feat, feat, 1.0 - threshold, distCol="jaccard_dist"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("a_id"),
            F.col(f"datasetB.{id_col}").alias("b_id"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .where(F.col("a_id") < F.col("b_id"))
        .distinct()
    )


def mllib_cosine_pairs(
    emb: DataFrame,
    max_cosine_dist: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Cosine radius join via BucketedRandomProjectionLSH on unit vectors.

    On the unit sphere, ||a-b||^2 = 2·(1 - cos) — so a Euclidean radius
    join at sqrt(2·max_cosine_dist) is exactly a cosine-distance join.
    """
    from vamana_spark.operators.similarity import normalize_embeddings

    unit = normalize_embeddings(emb, vec_col=vec_col).where(
        F.col("unit_vec").isNotNull()
    )
    vec = unit.select(
        F.col(id_col), array_to_vector(F.col("unit_vec")).alias("_v")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h", bucketLength=bucket_length,
        numHashTables=num_hash_tables, seed=seed,
    )
    model = brp.fit(vec)
    radius = float((2.0 * max_cosine_dist) ** 0.5)
    joined = model.approxSimilarityJoin(vec, vec, radius, distCol="euclid_dist")
    cos_dist = (F.col("euclid_dist") * F.col("euclid_dist")) / 2.0
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("a_id"),
            F.col(f"datasetB.{id_col}").alias("b_id"),
            F.round(cos_dist, 4).alias("cos_dist"),
        )
        .where(F.col("a_id") < F.col("b_id"))
        .distinct()
    )


def mllib_kmeans_centers(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
):
    """IVF / shard centers via MLlib KMeans. Returns a (k, dim) ndarray."""
    import numpy as np

    vec = emb.select(array_to_vector(F.col(vec_col)).alias("_v"))
    km = KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="_v")
    model = km.fit(vec)
    # clusterCenters() yields ndarray or ml.linalg.Vector depending on version
    return np.asarray(
        [np.asarray(c) for c in model.clusterCenters()], dtype=np.float32
    )
