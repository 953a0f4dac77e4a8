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
        # Fold the convergence check into the min-label pass: every node
        # has exactly one self row in `labels`, so carrying its current
        # label as `old` through the union lets one keyed aggregate
        # produce BOTH the new label (min over self + neighbor
        # candidates — identical to the previous two-frame join) and the
        # changed flag.  This removes the per-iteration labels-vs-labels
        # equi-join (a whole extra shuffle per round at cluster scale);
        # the convergence count is now a shuffle-free filter over the
        # just-checkpointed partitions.
        null_old = F.lit(None).cast(dict(labels.dtypes)["comp"])
        merged = (
            labels.select("a", "comp", F.col("comp").alias("old"))
            .unionByName(nbr.select("a", "comp", null_old.alias("old")))
            .groupBy("a")
            .agg(F.min("comp").alias("comp"), F.max("old").alias("old"))
        )
        merged = merged.localCheckpoint(eager=True)
        changed = merged.filter(F.col("comp") < F.col("old")).count()
        labels = merged.select("a", "comp")
        if changed == 0:
            break
    return labels.select(F.col("a").alias("id"), F.col("comp").alias("component"))


def label_propagation(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """(node, community) by synchronous label propagation (LPA) — the
    density-based complement to :func:`connected_components`: a single
    bridge edge between two dense groups keeps them in ONE component but
    TWO communities, because a node adopts the label with the most votes
    among itself and its neighbors, and one bridge vote loses to a
    clique's worth of votes.

    Determinism (classic LPA is update-order-dependent; this one is
    not): updates are fully synchronous, every node casts one vote for
    its own current label (self-voting is also what breaks the 2-cycle
    oscillation of pure neighbor voting), and ties break to the LOWEST
    label via ``max(struct(votes, -label))`` — an aggregate, never a
    pick-any ``max_by``.  The result is a pure function of the edge set;
    partitioning cannot change it (asserted by the property tests).

    Scale shape: per round ONE equi-join (labels onto the edge list) and
    TWO keyed aggregates ((node, label) vote counts, then the per-node
    argmax) — the same bounded shape as the min-label component loop,
    with ``localCheckpoint`` truncating lineage per round and a
    convergence count stopping early (capped at ``max_iter``: LPA has no
    convergence guarantee in adversarial graphs, and the capped result
    is equally deterministic).  Labels are node ids and must be
    non-negative for the ``-label`` tiebreak encoding."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = und.localCheckpoint(eager=True)

    labels = und.select("a").distinct().withColumn("lbl", F.col("a"))
    for _ in range(max_iter):
        nbr_votes = und.join(
            labels.select(F.col("a").alias("b"), "lbl"), "b"
        ).select("a", "lbl")
        votes = (
            labels.unionByName(nbr_votes)  # the self-vote
            .groupBy("a", "lbl")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        new_labels = (
            votes.groupBy("a")
            .agg(F.max(F.struct(F.col("votes"), (-F.col("lbl")).alias("neg"))).alias("w"))
            .select("a", (-F.col("w.neg")).alias("lbl"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.join(labels.select("a", F.col("lbl").alias("old")), "a")
            .filter(F.col("lbl") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("a").alias("id"), F.col("lbl").alias("community"))
