from vamana_spark.operators import (
    dedup,
    events,
    multimodal,
    relational,
    similarity,
    text,
)

__all__ = ["dedup", "events", "multimodal", "relational", "similarity", "text"]
