from vamana_spark.operators import dedup, events, relational, similarity, text

__all__ = ["dedup", "events", "relational", "similarity", "text"]
