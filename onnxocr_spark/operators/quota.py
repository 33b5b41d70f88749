"""Per-key quota sampling: keep the K smallest rows per key under a
deterministic total order (RefinedWeb-style per-domain caps — the
reference OnnxOCR repo has no corpus engine; this belongs to the
training-data-pipeline extension surface).

The naive shape — one `row_number()` window over the key — is correct
but serializes a hot key: a domain contributing 10^9 pages becomes one
partition-sized sort. The salted two-phase shape keeps the same exact
output while parallelizing within the key:

1. salt each row into S buckets by a deterministic hash of its ORDER
   columns (not RNG — reruns and resumes must agree),
2. keep the K smallest per (key, salt) — the hot key's scan now runs
   as S parallel partial sorts,
3. keep the K smallest per key among the <= S*K survivors.

Exactness: every row of the true per-key top-K is top-K within
whatever salt bucket it landed in, so stage 2 never drops it; stage 3
then reproduces the global order. Requires `order_cols` to totally
order rows within a key (ties would make row_number partition-order
dependent) — the battery orders by (md5(doc_id), doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def top_k_per_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    k: int,
    rank_col: str = "rank",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Rows with the K smallest `order_cols` tuples per `keys` group,
    with their 1-based rank in `rank_col`. `salt_buckets=S` switches
    to the two-phase hot-key shape (identical output, pinned in
    tests/test_temporal.py's sibling test_quota.py)."""
    if k <= 0:
        raise ValueError("k must be positive")
    order = [F.col(c) for c in order_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    if salt_buckets is not None:
        if salt_buckets <= 0:
            raise ValueError("salt_buckets must be positive")
        w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
        df = (
            df.withColumn("_salt", F.pmod(F.hash(*order), F.lit(salt_buckets)))
            .withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= k)
            .drop("_salt", "_r1")
        )
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .where(F.col(rank_col) <= k)
    )
