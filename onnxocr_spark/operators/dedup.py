"""Duplicate-cluster resolution: candidate pairs → connected components
→ keeper per cluster.

A near-dup pipeline (MinHash-LSH / SimHash / embedding pairs) emits
PAIRS; deduplication needs CLUSTERS — if A~B and B~C, one keeper must
survive for {A, B, C} even though (A, C) was never emitted. That is
connected components, computed here by iterative minimum-label
propagation over the undirected pair graph:

    label(v) ← min(label(v), min over neighbors' labels)

repeated until a fixpoint. Each iteration is one join + one
map-side-combined groupBy; convergence takes O(graph diameter)
iterations — duplicate clusters are shallow (near-cliques from banding,
diameter ≤ ~3), so this terminates in 2-4 rounds where a general graph
would want the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond"). `max_iter` bounds the
loop; hitting it raises rather than returning a half-converged answer.

Deterministic: labels are doc ids, min is order-free, no RNG.
At 10^12 docs the state per iteration is one (vertex, label) row per
clustered doc — only docs that appear in a pair enter the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_component_keepers(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_a, doc_b) pairs → (doc_id, keeper) with keeper = min id of
    the doc's connected component. Docs not in any pair are absent
    (they are their own keepers by definition)."""
    spark = pairs.sparkSession
    e = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()

    # initial label: min neighbor vs self
    labels = edges.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("l")
    ).withColumnRenamed("a", "v").persist()

    def _label_mass(df: DataFrame) -> object:
        # labels only ever DECREASE under min-propagation, so the total
        # label mass strictly decreases iff any vertex changed — a
        # single tiny aggregate instead of a join-based diff per round.
        # decimal(38,0): exact and overflow-free at 10^12-scale ids.
        return df.agg(F.sum(F.col("l").cast("decimal(38,0)"))).first()[0]

    mass = _label_mass(labels)
    for _ in range(max_iter):
        # propagate: each vertex takes min(own label, neighbors' labels)
        neigh = (
            edges.join(labels.withColumnRenamed("v", "b"), "b")
            .groupBy("a")
            .agg(F.min("l").alias("nl"))
            .withColumnRenamed("a", "v")
        )
        new_labels = (
            labels.join(neigh, "v", "left")
            .select("v", F.least("l", F.coalesce("nl", "l")).alias("l"))
            .persist()
        )
        new_mass = _label_mass(new_labels)
        labels.unpersist()
        labels = new_labels
        if new_mass == mass:
            break
        mass = new_mass
    else:
        raise RuntimeError(f"label propagation did not converge in {max_iter} iters")

    edges.unpersist()
    return labels.select(F.col("v").alias("doc_id"), F.col("l").alias("keeper"))
