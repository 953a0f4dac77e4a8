"""Connected components over a pair/edge relation — the clustering step
that turns verified near-duplicate PAIRS into duplicate GROUPS (pick one
survivor per component instead of dropping one side of each pair).

Iterative min-label propagation, the standard distributed formulation
(Hash-to-Min / GraphX-style): every node starts labeled with itself;
each round, a node's label becomes the min of its own and its
neighbors'; converged when no label changes.  Rounds needed = graph
diameter (near-dup graphs are shallow), each round ONE join + ONE
aggregate — no driver-side adjacency, and ``localCheckpoint`` truncates
the growing lineage so the plan stays O(1) per round.

This is the engine's one genuinely iterative operator; it has no single
SQL twin, but the fixpoint is exactly a recursive CTE's transitive
closure, which the DuckDB oracle runs (plans/text_analysis.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable from the node."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = und.localCheckpoint(eager=True)

    labels = und.select("a").distinct().withColumn("comp", F.col("a"))
    for _ in range(max_iter):
        nbr = und.join(
            labels.select(F.col("a").alias("b"), "comp"), "b"
        ).select("a", "comp")
        new_labels = (
            labels.unionByName(nbr).groupBy("a").agg(F.min("comp").alias("comp"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.join(
                labels.select("a", F.col("comp").alias("old")), "a"
            )
            .filter(F.col("comp") < F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("a").alias("id"), F.col("comp").alias("component"))
