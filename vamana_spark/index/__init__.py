from vamana_spark.index.vamana import VamanaIndex

__all__ = ["VamanaIndex"]
