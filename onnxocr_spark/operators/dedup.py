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
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.l") != F.col("o.l"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"label propagation did not converge in {max_iter} iters")

    edges.unpersist()
    return labels.select(F.col("v").alias("doc_id"), F.col("l").alias("keeper"))
