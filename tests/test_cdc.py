"""Content-defined chunking (operators/cdc.py): independent Python
reference, the shift-robustness property that motivates CDC over
fixed-stride chunking, and edge shapes. Hermetic (scoped temp view)."""

import hashlib

from onnxocr_spark.operators.cdc import CDC_CHUNKS_SPARK, CDC_REPEATED_SPARK

VIEW = "cdc_test_docs"


def _h3(a, b, c):
    return int(hashlib.md5(f"{a} {b} {c}".encode()).hexdigest()[:15], 16) % 8


def ref_chunks(tokens):
    """Pure-Python CDC: boundary after token i (0-based, i >= 2) iff
    _h3(t[i-2..i]) == 0; boundary token ends its chunk."""
    chunks, cur = [], []
    for i, t in enumerate(tokens):
        cur.append(t)
        if i >= 2 and _h3(tokens[i - 2], tokens[i - 1], t) == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [
        (j, len(ck), hashlib.md5(" ".join(ck).encode()).hexdigest())
        for j, ck in enumerate(chunks)
    ]


def _run(spark, docs, sql):
    spark.createDataFrame(docs, "doc_id BIGINT, text STRING").createOrReplaceTempView(
        VIEW
    )
    try:
        return [
            tuple(r)
            for r in spark.sql(
                sql.format(docs_src=f"SELECT doc_id, text FROM {VIEW}")
            ).collect()
        ]
    finally:
        spark.catalog.dropTempView(VIEW)


def _text(seed, n):
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    out = []
    for i in range(n):
        h = int(hashlib.md5(f"{seed}/{i}".encode()).hexdigest()[:8], 16)
        out.append(words[h % len(words)])
    return out


def test_matches_python_reference(spark):
    docs = [(i, " ".join(_text(i, 10 + 17 * i))) for i in range(8)]
    got = sorted(_run(spark, docs, CDC_CHUNKS_SPARK))
    want = sorted(
        (d, j, n, h) for d, text in docs for (j, n, h) in ref_chunks(text.split(" "))
    )
    assert got == want


def test_edge_shapes(spark):
    """Docs below the 3-token boundary window form exactly one chunk;
    every token lands in exactly one chunk (coverage partition)."""
    docs = [(0, "one"), (1, "one two"), (2, ""), (3, " ".join(_text(5, 120)))]
    rows = _run(spark, docs, CDC_CHUNKS_SPARK)
    for d in (0, 1, 2):
        assert len([r for r in rows if r[0] == d]) == 1
    # chunk token counts partition the doc
    for d, text in docs:
        n_tok = len(text.split(" "))
        assert sum(r[2] for r in rows if r[0] == d) == n_tok
        ranks = sorted(r[1] for r in rows if r[0] == d)
        assert ranks == list(range(len(ranks)))


def test_cdc_shift_robustness(spark):
    """THE property fixed-stride chunking lacks: prepending tokens to
    a doc leaves every chunk after the first surviving boundary
    bit-identical. Fixed 64/48 windows would shift everything."""
    base = _text(42, 200)
    shifted = ["injected", "tokens", "here"] + base
    rows = _run(
        spark,
        [(0, " ".join(base)), (1, " ".join(shifted))],
        CDC_CHUNKS_SPARK,
    )
    h0 = {r[3] for r in rows if r[0] == 0}
    h1 = {r[3] for r in rows if r[0] == 1}
    shared = h0 & h1
    # all but the first couple of chunks must survive the shift
    assert len(shared) >= len(h0) - 2
    assert len(h0) >= 15  # the doc really did chunk (avg ~8 tokens)


def test_repeated_chunks_cross_doc(spark):
    """A chunk-aligned common run is detected; the count columns are
    exact. Docs share the same 60-token tail after distinct heads."""
    tail = _text(7, 60)
    docs = [
        (i, " ".join(_text(100 + i, 40) + tail)) for i in range(3)
    ] + [(3, " ".join(_text(999, 50)))]
    reps = _run(spark, docs, CDC_REPEATED_SPARK)
    assert reps, "shared tail must produce repeated chunks"
    for chunk_hash, n_docs, n_occ, n_tok in reps:
        assert 2 <= n_docs <= 4  # tiny vocab: short chunks can repeat anywhere
        assert n_occ >= n_docs
        assert n_tok >= 1
    # at least one repeated chunk present in all three tail-sharing docs
    assert any(r[1] >= 3 for r in reps)
