"""Embedding similarity search.

- ``brute_force_topk``: exact cosine top-k via built-in higher-order
  functions (zip_with/aggregate — JVM-side, no Python in the hot path).
  O(Q·N): the correctness baseline and the right choice when Q is small.
- ``lsh_topk``: the scale path — random-hyperplane LSH. Signatures are
  computed by an Arrow-batched pandas UDF (one numpy matmul per batch),
  candidates are pairs sharing any table signature (an equi-join on
  (table, signature) — shuffle keys are 16 bytes, embeddings are only
  re-read for the candidate set), exact cosine re-ranks candidates.
  Hyperplanes are sha256-derived — deterministic across executors,
  retries, and sessions; no RNG state anywhere.

At 10^9+ vectors: signatures are one narrow shuffle; the candidate join
fans out ~T·N rows with tiny payloads; only candidate pairs (≪ N²)
touch full vectors again.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def _planes(n_tables: int, bits: int, dim: int) -> np.ndarray:
    """(n_tables·bits, dim) deterministic pseudo-random hyperplanes."""
    out = np.empty((n_tables * bits, dim), dtype=np.float64)
    for p in range(n_tables * bits):
        for chunk in range(0, dim, 8):
            h = hashlib.sha256(f"plane/{p}/{chunk}".encode()).digest()
            for j in range(min(8, dim - chunk)):
                v = int.from_bytes(h[4 * j : 4 * j + 4], "big")
                out[p, chunk + j] = v / 2**31 - 1.0
    return out


def _cosine_cols(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    return dot / (norm(F.col(a)) * norm(F.col(b)))


def brute_force_topk(
    emb: DataFrame, k: int = 5, n_queries: int | None = 10
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos) — exact cosine top-k."""
    q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    if n_queries is not None:
        q = q.filter(F.col("query_id") < n_queries)
    scored = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cosine_cols("qe", "embedding").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def lsh_signatures(
    emb: DataFrame, n_tables: int = 8, bits: int = 10
) -> DataFrame:
    """(vec_id, table, sig) — one signature row per vector per table."""
    dim = len(emb.select("embedding").first()[0])
    planes = _planes(n_tables, bits, dim)

    @pandas_udf("array<long>")
    def sig_udf(col: pd.Series) -> pd.Series:
        mat = np.stack(col.to_numpy())  # (batch, dim)
        bits_m = (mat @ planes.T) > 0  # (batch, tables*bits)
        weights = 1 << np.arange(bits, dtype=np.int64)
        out = []
        for row in bits_m:
            sigs = row.reshape(n_tables, bits) @ weights
            out.append(sigs.astype(np.int64))
        return pd.Series(out)

    return emb.select(
        "vec_id", F.posexplode(sig_udf("embedding")).alias("table", "sig")
    )


def _ivf_centroids(
    emb: DataFrame, n_clusters: int, iters: int = 5, sample_cap: int = 4096
) -> np.ndarray:
    """Deterministic k-means coarse quantizer: seeds are the sample
    vectors with the smallest sha256(vec_id) (stable under any
    partitioning), Lloyd iterations run driver-side on a bounded
    sample. No RNG state anywhere — retries and sessions agree."""
    sample = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(sample_cap)
        .collect()
    )
    ids = np.array([r.vec_id for r in sample])
    mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in sample])
    order = np.argsort(
        [hashlib.sha256(str(i).encode()).hexdigest() for i in ids]
    )
    cents = mat[order[:n_clusters]].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_clusters):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cluster) — inverted-file assignment via one Arrow-batched
    matmul per batch."""

    @pandas_udf("int")
    def assign_udf(col: pd.Series) -> pd.Series:
        mat = np.stack(col.to_numpy()).astype(np.float64)
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return emb.select("vec_id", assign_udf("embedding").alias("cluster"))


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int | None = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: assign vectors to k-means cells, probe the
    ``nprobe`` nearest cells per query, exact cosine re-rank within the
    candidate set. Same output shape as brute_force_topk.

    At 10^9+ vectors the assignment is one narrow pass; the probe join
    fans out only the candidate cells (~nprobe/n_clusters of the data)."""
    centroids = _ivf_centroids(emb, n_clusters)
    assign = ivf_assign(emb, centroids)

    @pandas_udf("array<int>")
    def probe_udf(col: pd.Series) -> pd.Series:
        mat = np.stack(col.to_numpy()).astype(np.float64)
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    if n_queries is not None:
        q = q.filter(F.col("query_id") < n_queries)
    probes = q.select(
        "query_id", "qe", F.explode(probe_udf("qe")).alias("cluster")
    )
    cand = (
        probes.join(assign, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qe", F.col("vec_id").alias("neighbor_id"))
    )
    n_emb = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
    )
    scored = cand.join(n_emb, "neighbor_id").select(
        "query_id", "neighbor_id", _cosine_cols("qe", "ne").alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int | None = 10,
    n_tables: int = 8,
    bits: int = 10,
) -> DataFrame:
    """Approximate cosine top-k: candidates share ≥1 table signature,
    exact cosine re-ranks. Same output shape as brute_force_topk."""
    sigs = lsh_signatures(emb, n_tables, bits)
    qs = sigs.withColumnRenamed("vec_id", "query_id")
    if n_queries is not None:
        qs = qs.filter(F.col("query_id") < n_queries)
    cand = (
        qs.join(sigs, ["table", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q_emb = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    n_emb = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
    )
    scored = (
        cand.join(F.broadcast(q_emb), "query_id")
        .join(n_emb, "neighbor_id")
        .select("query_id", "neighbor_id", _cosine_cols("qe", "ne").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
