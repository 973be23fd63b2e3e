from vamana_spark.plans.declared import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
