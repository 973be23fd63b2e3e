"""Graph diagnostics over the persisted index — distributed, join-based.

``reachability`` runs a frontier BFS from the medoid as iterative
DataFrame joins (frontier ⋈ adjacency → next frontier), the standard
Pregel-without-Pregel encoding: each round is one shuffle on ordinal,
state lives in DataFrames, lineage is truncated by localCheckpoint so
50-round traversals don't build 50-deep plans. At index scale this runs
where the graph lives; nothing is collected.

Complements healthCheck (degree bounds): a node can satisfy the degree
invariant and still be unreachable from the entry point — unreachable
nodes can never be returned by greedy search, so reachable_fraction is
the real navigability invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reachability(
    graph_df: DataFrame,
    start_ordinal: int,
    max_rounds: int = 64,
) -> dict:
    """BFS from ``start_ordinal`` over (ordinal, neighbors) adjacency.

    Returns {reachable, total, reachable_fraction, rounds}.
    """
    edges = graph_df.select(
        F.col("ordinal").alias("src"), F.explode_outer("neighbors").alias("dst")
    ).where(F.col("dst").isNotNull()).cache()
    total = graph_df.select("ordinal").distinct().count()

    spark = graph_df.sparkSession
    visited = spark.createDataFrame([(int(start_ordinal),)], "ordinal long").cache()
    frontier = visited
    rounds = 0
    n_visited = 1
    for _ in range(max_rounds):
        nxt = (
            frontier.join(edges, frontier.ordinal == edges.src)
            .select(F.col("dst").alias("ordinal"))
            .distinct()
            .join(visited, "ordinal", "left_anti")
            .localCheckpoint()
        )
        rounds += 1
        c = nxt.count()
        if c == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        n_visited += c
        frontier = nxt
    edges.unpersist()
    return {
        "reachable": n_visited,
        "total": total,
        "reachable_fraction": n_visited / max(total, 1),
        "rounds": rounds,
    }


def degree_histogram(graph_df: DataFrame) -> DataFrame:
    """Out-degree distribution: (out_degree, n_nodes)."""
    return (
        graph_df.select(F.size("neighbors").alias("out_degree"))
        .groupBy("out_degree")
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )
