"""Sequence packing (operators/packing.py), inverted-index phrase
search and Bloom decontamination (operators/indexing.py).

Packing is checked against an independent pandas cumsum on a
deliberately shuffled, multi-partition input (the two-phase prefix sum
must reconstruct the global doc_id order across range partitions), and
its plan is pinned window-free. Phrase search is checked against
hand-computed occurrence counts covering variable phrase lengths,
multi-occurrence docs, overlapping matches of a duplicate-token phrase,
and a too-short query doc. Bloom is pinned to its semantic contract —
per-doc hits are a superset of the exact decontamination join's — on a
corpus with full, partial, and zero contamination.

All corpus tests overlay the battery's `documents` view and follow the
repo-wide overlay contract (drop the view AND clear the registration
memo afterwards)."""

import pandas as pd
import pytest

from onnxocr_spark.operators.indexing import (
    BLOOM_DECONTAM_SQL,
    PHRASE_SEARCH_SQL,
)
from onnxocr_spark.operators.packing import pack_sequences

DOCS_SRC = "SELECT doc_id, text FROM documents"


def _overlay(spark, docs):
    spark.createDataFrame(
        docs, "doc_id BIGINT, text STRING"
    ).createOrReplaceTempView("documents")


def _teardown(spark):
    import __spark_entry__ as em

    spark.catalog.dropTempView("documents")
    em._REGISTERED.pop(spark, None)


# ---- pack_sequences --------------------------------------------------------

def _pack_ref(docs, budget):
    """Independent reference: plain pandas cumsum in doc_id order."""
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    df["n_tok"] = df["text"].str.split(" ").map(len)
    df = df.sort_values("doc_id").reset_index(drop=True)
    df["start_tok"] = df["n_tok"].cumsum() - df["n_tok"]
    df["first_window"] = df["start_tok"] // budget
    df["last_window"] = (df["start_tok"] + df["n_tok"] - 1) // budget
    df["n_windows"] = df["last_window"] - df["first_window"] + 1
    return df.drop(columns="text")


def test_pack_matches_pandas_reference(spark):
    """Shuffled insert order + forced multi-partition input: the range
    exchange must re-establish global doc_id order and the offsets must
    chain exactly across partitions. Budget 7 forces frequent window
    crossings (docs of 1-13 tokens vs 7-token windows)."""
    import random

    rng = random.Random(11)
    docs = [
        (i, " ".join(f"w{i}t{j}" for j in range(rng.randint(1, 13))))
        for i in range(211)
    ]
    rng.shuffle(docs)
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING").repartition(7)
    got = (
        pack_sequences(df, budget=7)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _pack_ref(docs, 7)
    pd.testing.assert_frame_equal(
        got.astype("int64"), ref.astype("int64"), check_like=True
    )
    # global invariant: spans tile the token stream with no gap/overlap
    ends = (got["start_tok"] + got["n_tok"]).tolist()
    assert ends[:-1] == got["start_tok"].tolist()[1:]


def test_pack_plan_is_window_free(spark):
    """The scale contract: no Window node (the single-partition cumsum
    trap), no per-row Python — one range exchange + one groupBy +
    Arrow-batched mapInPandas."""
    docs = [(i, f"a b c d{i}") for i in range(50)]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    out = pack_sequences(df, budget=5, checkpoint=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "rangepartitioning" in plan.lower(), plan


def test_pack_empty_input(spark):
    df = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    assert pack_sequences(df, budget=8).count() == 0


# ---- phrase_search ---------------------------------------------------------

def test_phrase_search_hand_computed(spark):
    """Query docs (id % 97 == 0) carry phrases of length 3/4/5 keyed by
    id//97 % 3. Expectations cover: self-match, multi-occurrence,
    OVERLAPPING occurrences of a duplicate-token phrase ('x y x y x'
    at starts 0 and 2 of 'x y x y x y x' — the DISTINCT-i vote count
    must accept both), a near-miss (right tokens, wrong order), and a
    query doc too short for its phrase length (contributes postings,
    no query)."""
    docs = [
        (0, "alpha beta gamma delta eps"),            # q, L=3
        (97, "one two three four five"),              # q, L=4
        (194, "x y x y x z z z"),                     # q, L=5
        (291, "tiny doc"),                            # q, L=3 but 2 toks
        (5, "alpha beta gamma alpha beta gamma pad"), # 2 hits of q0
        (6, "x y x y x y x pad"),                     # overlapping q194 hits
        (7, "pre one two three four post"),           # 1 hit of q97
        (8, "alpha beta delta gamma"),                # near-miss, no hit
    ]
    _overlay(spark, docs)
    try:
        rows = spark.sql(PHRASE_SEARCH_SQL.format(docs_src=DOCS_SRC)).collect()
    finally:
        _teardown(spark)
    got = sorted((r.q_doc, r.doc_id, r.n_occur) for r in rows)
    assert got == [
        (0, 0, 1), (0, 5, 2),
        (97, 7, 1), (97, 97, 1),
        (194, 6, 2), (194, 194, 1),
    ]


# ---- bloom decontamination -------------------------------------------------

def _decontam_exact_sql():
    import __spark_entry__ as em

    return em._DECONTAM_SPARK


@pytest.fixture()
def contamination_corpus():
    """Eval docs: 0, 1, 100 (id % 100 < 2). Train docs: 205 is a full
    copy of eval 0 (every 8-gram shared), 206 shares exactly one
    8-gram window with eval 1, 207 is clean but long enough to
    shingle, 208 is too short to shingle at all."""
    ev0 = "the quick brown fox jumps over the lazy dog today"
    ev1 = "pack my box with five dozen liquor jugs again ok"
    return [
        (0, ev0),
        (1, ev1),
        (100, "sphinx of black quartz judge my vow now then"),
        (205, ev0),
        (206, "XX " + " ".join(ev1.split()[:8]) + " YY ZZ"),
        (207, "completely different text with eight plus tokens here friend"),
        (208, "short"),
    ]


def test_bloom_superset_of_exact(spark, contamination_corpus):
    """The Bloom contract: per doc, bloom hits >= exact hits, and every
    exactly-contaminated doc is bloom-flagged. (False positives are
    allowed by construction; false negatives never.)"""
    _overlay(spark, contamination_corpus)
    try:
        bloom = {
            r.doc_id: r.n_bloom_hits
            for r in spark.sql(
                BLOOM_DECONTAM_SQL.format(docs_src=DOCS_SRC)
            ).collect()
        }
        exact = {
            r.doc_id: r.n_hits
            for r in spark.sql(
                _decontam_exact_sql().format(docs_src=DOCS_SRC)
            ).collect()
        }
    finally:
        _teardown(spark)
    assert set(exact) <= set(bloom), (exact, bloom)
    for d, n in exact.items():
        assert bloom[d] >= n, (d, n, bloom[d])
    # the engineered hits are found at all
    assert 205 in exact and 206 in exact
    assert exact[205] == 3  # 10-token doc -> 3 8-gram windows
    assert exact[206] == 1
