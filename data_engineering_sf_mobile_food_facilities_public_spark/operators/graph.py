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

    # r16 OPT: initialize each node's label with its NEIGHBORHOOD min
    # (min over self and direct neighbors — one aggregate over the
    # checkpointed edge relation, same shuffle the old `.distinct()`
    # init paid) instead of the self-label.  This is exactly the state
    # the old first loop round produced, so every graph converges one
    # full round (join + union-agg + checkpoint + count action) earlier;
    # the fixpoint itself is unchanged.  Measured on the ER pipeline at
    # sf0.1: 1.7-1.9s -> 1.5-1.7s.
    labels = (
        und.select("a", F.least(F.col("a"), F.col("b")).alias("comp"))
        .groupBy("a")
        .agg(F.min("comp").alias("comp"))
    )
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


def connected_components_blocked(
    edges: DataFrame,
    block: str = "block",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(node, component) for edge sets whose components are KNOWN to be
    bounded within a blocking key (e.g. SemDeDup pairs, which only exist
    within a label cell): one union-find pass per block via an
    Arrow-batched ``applyInPandas`` — a single shuffle on the block key
    instead of the iterative operator's join + aggregate + checkpoint +
    convergence-count PER ROUND (r15 OPT: semdedup's component step was
    3.1-3.8s of its ~4.9s total at sf0.1; this pass is ~0.2s).

    Output is identical to :func:`connected_components` on the same
    edges: component = min node id reachable (union-by-min keeps every
    tree root the minimum of its tree; pinned by
    tests/test_dedup_similarity.py::test_blocked_components_match_iterative).
    The per-block union-find is in-memory Python over that block's edge
    list — valid exactly when blocks are bounded (the caller's own scale
    contract; SemDeDup cells, LSH bands).  NOT for global graphs whose
    components span blocks — use :func:`connected_components`.

    MISUSE MODE (ADVICE r15, explicit by contract): a node id appearing
    in MORE THAN ONE block emits one (id, component) row PER BLOCK,
    possibly with conflicting components — there is no runtime guard
    (detecting it would cost the global shuffle this operator exists to
    avoid).  Callers must guarantee one block per node (semdedup: one
    cell per vector); the duplicate-row behavior is pinned loud by
    tests/test_dedup_similarity.py::
    test_blocked_components_duplicate_block_node_behavior."""
    import pandas as pd

    id_type = dict(edges.dtypes)[src]

    def _union_find(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(pdf[src], pdf[dst]):
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # union by MIN: the root stays the min id
        ids = list(parent)
        return pd.DataFrame(
            {"id": ids, "component": [find(x) for x in ids]}
        )

    return edges.groupBy(block).applyInPandas(
        _union_find, f"id {id_type}, component {id_type}"
    )


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
