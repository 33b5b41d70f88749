"""Derive the interleaved span table from a plain `documents` table.

/root/testdata's `documents` is (doc_id int64, text, lang, source,
n_chars). The engine's input shape (BASELINE.json input_hint) is the
interleaved span table. This module derives one from the other with a
*pure, SQL-expressible* rule so the DuckDB oracle can independently
verify structure and text passthrough end-to-end:

- tokens = split(text, ' '); chunks of 8 tokens → text spans
- after chunk k insert a media span iff (doc_id·7 + k) % 3 == 0
- offsets are sequential over the interleaving (window prefix sum)
- media_ref = img://doc_{doc_id:012d}/{offset} → resolved by the
  deterministic renderer (operators/media.py)

Everything is built-in DataFrame ops (sequence/posexplode/slice/
window) — no UDFs — so Catalyst prunes/pushes through it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CHUNK = 8


def derive_span_rows(docs: DataFrame) -> DataFrame:
    """documents(doc_id int64, text, …) → exploded span rows
    (doc_id string, kind, text, media_ref, offset int)."""
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK))).cast("int")
    chunks = docs.select(
        F.col("doc_id").alias("src_id"),
        F.format_string("doc_%012d", F.col("doc_id")).alias("doc_id"),
        toks.alias("toks"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("_p", "k"),
    )
    # `pre` (media spans inserted before chunk k) in CLOSED FORM instead
    # of a running-sum window (r6, guide §2.4 "remove shuffles
    # outright"): m(j) = [(src·7 + j) % 3 == 0] = [j ≡ r (mod 3)] with
    # r = (3 − src % 3) % 3  (7 ≡ 1 mod 3), so the prefix count over
    # j < k is (k − r + 2) div 3 — always ≥ 0 for k ≥ 0, r ∈ {0,1,2}.
    # The window forced a full-corpus hash exchange on doc_id plus a
    # per-doc sort before a single downstream row existed; the closed
    # form makes the whole derivation a narrow map over the scan. The
    # DuckDB oracle (DERIVE_SQL_CTE below) keeps the window
    # formulation — the green ocr_* oracle rows are the equivalence
    # proof for the rewrite.
    r = (F.lit(3) - F.col("src_id") % 3) % 3
    with_flags = chunks.select(
        "doc_id",
        "k",
        F.array_join(F.slice("toks", F.col("k") * CHUNK + 1, CHUNK), " ").alias(
            "chunk"
        ),
        ((F.col("src_id") * 7 + F.col("k")) % 3 == 0).cast("int").alias("m"),
        F.floor((F.col("k") - r + 2) / 3).alias("pre"),
    )

    text_span = F.struct(
        F.lit("text").alias("kind"),
        F.col("chunk").alias("text"),
        F.lit("").alias("media_ref"),
        (F.col("k") + F.col("pre")).cast("int").alias("offset"),
    )
    media_span = F.when(
        F.col("m") == 1,
        F.struct(
            F.lit("media").alias("kind"),
            F.lit("").alias("text"),
            F.concat(
                F.lit("img://"),
                F.col("doc_id"),
                F.lit("/"),
                (F.col("k") + F.col("pre") + 1).cast("string"),
            ).alias("media_ref"),
            (F.col("k") + F.col("pre") + 1).cast("int").alias("offset"),
        ),
    )
    # one pass: each chunk yields its text span plus (conditionally) the
    # media span that follows, exploded from a 2-element array — the
    # union-of-two-filtered-branches alternative makes Catalyst scan +
    # window the input twice (verified with .explain("formatted"))
    return (
        with_flags.select(
            "doc_id", F.explode(F.array(text_span, media_span)).alias("s")
        )
        .filter(F.col("s").isNotNull())
        .select("doc_id", "s.*")
    )


def derive_documents(docs: DataFrame) -> DataFrame:
    """Same, reassembled to the nested input shape of run_extract."""
    from onnxocr_spark.pipeline import reassemble

    return reassemble(derive_span_rows(docs))


# The DuckDB-dialect mirror of derive_span_rows, used by oracle_sql().
# {sel} picks the projection; table `documents` is a pre-registered view.
DERIVE_SQL_CTE = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
c AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT))) AS k
  FROM d
),
f AS (
  SELECT doc_id, k,
         array_to_string(toks[k*8+1 : k*8+8], ' ') AS chunk,
         CASE WHEN (doc_id*7 + k) % 3 = 0 THEN 1 ELSE 0 END AS m
  FROM c
),
p AS (
  SELECT doc_id, k, chunk, m,
         COALESCE(SUM(m) OVER (PARTITION BY doc_id ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
  FROM f
)
"""
