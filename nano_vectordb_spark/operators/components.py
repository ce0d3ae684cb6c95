"""Connected components over near-duplicate pair edges.

The dedup family (reference-extension; SURVEY.md pipeline ops) emits
PAIRS (a_id, b_id). Real corpus cleaning needs GROUPS: duplicates are
transitive (A~B, B~C => one cluster), so the kept document must be
chosen per connected component, not per pair — pairwise removal either
over-deletes or leaves transitive duplicates behind.

Algorithm: iterative min-label propagation with pointer jumping.
Every node starts labeled with its own id; each round takes

    label(v) <- min( label(v),
                     min over neighbors u of label(u),   -- edge step
                     label(label(v)) )                   -- pointer jump

The edge step alone converges in O(diameter) rounds; the pointer jump
(label table self-join on the current label) gives the usual
path-halving acceleration to O(log diameter). Each round is two
shuffle joins + one aggregation over the LABEL table (|V| rows of two
longs — tiny next to the corpus), with lineage truncated by
localCheckpoint so plans don't grow per round. Near-dup graphs have
small components and tiny diameter, so this typically converges in
2-3 rounds at any corpus size.

Convergence check without an extra join: labels only ever decrease,
so sum(label) is strictly monotone until fixpoint — equal consecutive
sums == converged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 30,
) -> DataFrame:
    """(id, component) for every node that appears in ``edges``;
    ``component`` is the minimum node id reachable from ``id``
    (undirected). Deterministic for any edge order."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    e = e.persist()
    labels = (
        e.select(F.col("s").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint()

    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e["d"] == labels["id"])
            .groupBy("s")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr_min, labels["id"] == nbr_min["s"], "left")
            .select(
                labels["id"],
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
        )
        jump = stepped.select(
            F.col("id").alias("jid"), F.col("comp").alias("jcomp")
        )
        labels = (
            stepped.join(jump, stepped["comp"] == jump["jid"], "left")
            .select(
                stepped["id"],
                F.least(
                    F.col("comp"), F.coalesce("jcomp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    e.unpersist()
    return labels.select("id", F.col("comp").alias("component"))


def dedup_groups(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
) -> DataFrame:
    """Resolve near-dup pairs into keep/drop decisions: one row per
    node with its component id, the component size, and whether this
    node is the canonical keeper (minimum id of the component — the
    same keep rule as exact_dedup)."""
    comp = connected_components(edges, src=src, dst=dst)
    sizes = comp.groupBy("component").agg(F.count("*").alias("group_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id"),
            "component",
            "group_size",
            (F.col("id") == F.col("component")).alias("keep"),
        )
    )
