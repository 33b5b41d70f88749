"""TF-IDF keyword retrieval (operators/retrieval.py): exact-integer
scoring vs an independent Python reference, and the broadcast plan.
Hermetic — scoped temp view, never the battery's `documents`."""

from collections import Counter

from onnxocr_spark.operators.retrieval import (
    IDF_SCALE,
    TFIDF_TOPK_SQL,
    TOP_K,
)

QUERIES = {
    0: ["spark", "join"],
    1: ["hash", "table"],
    2: ["window", "agg", "scan"],
    3: ["vector", "stream"],
}



def ref_topk(docs, k=TOP_K):
    """Independent reimplementation: widf = (N*1e6) // df, score =
    sum(tf * widf), ties by doc_id."""
    n = len(docs)
    terms = {t for q in QUERIES.values() for t in q}
    tf = {d: Counter(t for t in text.split(" ") if t in terms) for d, text in docs}
    df = Counter(t for cnts in tf.values() for t in cnts)
    widf = {t: (n * IDF_SCALE) // df[t] for t in df}
    out = []
    for qid, qterms in QUERIES.items():
        scored = []
        for d, cnts in tf.items():
            s = sum(cnts[t] * widf[t] for t in qterms if t in cnts)
            if s > 0:
                scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        out += [(qid, d, s, r + 1) for r, (d, s) in enumerate(scored[:k])]
    return sorted(out)


def _docs():
    """Hand-built corpus exercising tf weighting, idf weighting (rare
    'vector' outweighs ubiquitous 'table'), score ties, multi-term
    accumulation, and docs matching nothing.

    NB: the SQL's df/N come from the battery's `documents` table; this
    test substitutes its own docs for BOTH (the docs_src hole feeds
    the tokenizer, and `documents` resolves to the same view)."""
    return [
        (0, "spark join spark join spark"),       # high tf for q0
        (1, "spark data data data data join"),
        (2, "join table hash table hash table"),  # q1 heavy
        (3, "table hash"),
        (4, "window agg scan window"),
        (5, "scan agg window"),
        (6, "vector stream vector"),              # rare terms
        (7, "stream table"),
        (8, "nothing matches here at all"),
        (9, "table table table table table"),     # common term only
    ]


def _run_on_overlay(spark, docs):
    """Overlay `documents` (the SQL reads df/N from it), per the
    repo-wide overlay contract: drop the view AND clear the battery's
    registration memo afterwards."""
    import __spark_entry__ as em

    spark.createDataFrame(docs, "doc_id BIGINT, text STRING").createOrReplaceTempView(
        "documents"
    )
    try:
        return spark.sql(
            TFIDF_TOPK_SQL.format(docs_src="SELECT doc_id, text FROM documents")
        ).collect()
    finally:
        spark.catalog.dropTempView("documents")
        em._REGISTERED.pop(spark, None)


def test_matches_python_reference(spark):
    docs = _docs()
    got = sorted(tuple(r) for r in _run_on_overlay(spark, docs))
    assert got == ref_topk(docs)
    # every query returned something, nothing beyond top-k
    qids = {r[0] for r in got}
    assert qids == set(QUERIES)
    for q in qids:
        ranks = sorted(r[3] for r in got if r[0] == q)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= TOP_K


def test_rare_term_outranks_common(spark):
    """idf does its job: for q3, the doc with 2x rare 'vector' must
    outrank docs with only the commoner 'stream'/'table' hits."""
    rows = _run_on_overlay(spark, _docs())
    q3 = sorted((r.rank, r.doc_id) for r in rows if r.query_id == 3)
    assert q3[0] == (1, 6)


def test_terms_join_is_broadcast(spark):
    """The query-term VALUES relation must broadcast: non-matching
    tokens die map-side, so the only shuffled rows are term hits."""
    import __spark_entry__ as em

    spark.createDataFrame(_docs(), "doc_id BIGINT, text STRING").createOrReplaceTempView(
        "documents"
    )
    try:
        df = spark.sql(
            TFIDF_TOPK_SQL.format(docs_src="SELECT doc_id, text FROM documents")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.catalog.dropTempView("documents")
        em._REGISTERED.pop(spark, None)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
