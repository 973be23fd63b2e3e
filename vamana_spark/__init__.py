"""vamana_spark — a PySpark-native analytics engine with the capabilities
of the Vamana (DiskANN-style) ANN index reference, re-expressed Spark-first.

Public surface:
  - ``VamanaParams``, ``VamanaIndex`` (build / search / save / load)
  - ``exact``    — exact kNN, medoid, distance ops (the brute-force oracle path)
  - ``functions``— vector column expressions (squared L2, cosine, dot, norm)
  - ``operators``— LLM-data-pipeline operators (dedup, text stats, similarity
                   joins, sessionization, relational checks)

Design notes: DataFrame/SQL first; Catalyst does pushdown/pruning/join
selection; NumPy kernels enter only through Arrow-batched pandas UDFs
(`mapInPandas` / `applyInPandas`) for graph build + beam search, which are
inherently per-partition imperative (see SURVEY.md §2 R6-R8).
"""

from vamana_spark.params import VamanaParams
from vamana_spark.index.vamana import VamanaIndex

__all__ = ["VamanaParams", "VamanaIndex"]
__version__ = "0.1.0"
