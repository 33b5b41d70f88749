"""Sketch-family semantic gates: the oracles prove both engines derive
identical sketch STATE; these tests prove the state is a USEFUL sketch
— the HLL registers actually estimate distinct counts, and the exact
percentile derivation agrees with an independent numpy reference."""

import math

import numpy as np

SF = "/root/testdata/sf0.001"


def test_hll_estimate_within_error_bound(spark):
    """Standard HLL estimator over the emitted registers (alpha_64 *
    m^2 / sum 2^-M, linear-counting small-range correction) must land
    within 35% of the exact distinct count per source — m=64 gives
    ~13% standard error, so 35% is ~2.7 sigma; a broken rho/bucket
    derivation misses by orders of magnitude, not percent."""
    import __spark_entry__ as em

    rows = em.queries()["hll_distinct_tokens"](spark, SF).collect()
    m = 64
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, {"regs": {}, "exact": r.exact_distinct})
        by_source[r.source]["regs"][r.bucket] = r.register
    assert by_source
    for source, d in by_source.items():
        regs = [d["regs"].get(b, 0) for b in range(m)]
        est = 0.709 * m * m / sum(2.0 ** -x for x in regs)
        zeros = regs.count(0)
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        exact = d["exact"]
        assert abs(est - exact) / exact < 0.35, (source, est, exact)


def test_percentiles_match_numpy(spark):
    """The crossing-rule percentile (smallest v whose cumulative count
    reaches ceil(p*N/100)) vs a direct numpy sort — the exact
    'inverted CDF' discrete percentile."""
    import __spark_entry__ as em

    got = {
        r.pct: r.value
        for r in em.queries()["doc_length_percentiles"](spark, SF).collect()
    }
    n_tok = np.sort(
        np.array(
            spark.table("documents")
            .selectExpr("size(split(text, ' ')) AS n")
            .collect()
        ).ravel()
    )
    n = len(n_tok)
    for p in (25, 50, 75, 90, 99):
        expected = int(n_tok[math.ceil(p * n / 100) - 1])
        assert got[p] == expected, (p, got[p], expected)
    assert list(got) == sorted(got) and sorted(got.values()) == list(
        got[p] for p in sorted(got)
    )


def test_corpus_diff_statuses(spark):
    """Every status class populated; statuses follow from the
    MAX(doc_id)-derived marks by construction (added = only-in-B ids,
    removed = only-in-A, changed = intersection ids divisible by 7)."""
    import __spark_entry__ as em

    rows = em.queries()["corpus_diff"](spark, SF).collect()
    status = {r.doc_id: r.status for r in rows}
    hi = spark.table("documents").agg({"doc_id": "max"}).collect()[0][0]
    lo_mark, hi_mark = hi // 5, (hi * 4) // 5
    for d, s in status.items():
        if d < lo_mark:
            expect = "removed"
        elif d >= hi_mark:
            expect = "added"
        elif d % 7 == 0:
            expect = "changed"
        else:
            expect = "same"
        assert s == expect, (d, s, expect)
    assert {"added", "removed", "changed", "same"} <= set(status.values())


def test_bigram_surprise_orders_rare_above_repeated(spark):
    """Integer rarity-surprise contract: a doc of corpus-unique
    bigrams must out-score (per bigram) a doc repeating the corpus's
    most common bigram; every term is >= 0 since c2 <= N."""
    import __spark_entry__ as em

    docs = (
        [(i, "the cat sat on the mat again today") for i in range(10)]
        + [(100, "zqx wvu tsr qpo nml kji")]       # all unique bigrams
        + [(101, "the cat the cat the cat the cat")]  # common bigrams
    )
    spark.createDataFrame(
        docs, "doc_id BIGINT, text STRING"
    ).createOrReplaceTempView("documents")
    try:
        rows = spark.sql(
            em._BIGRAM_SURPRISE_SPARK.format(
                docs_src="SELECT doc_id, text FROM documents"
            )
        ).collect()
    finally:
        spark.catalog.dropTempView("documents")
        em._REGISTERED.pop(spark, None)
    by_doc = {r.doc_id: (r.surprise_bits, r.n_bigrams) for r in rows}
    rare_rate = by_doc[100][0] / by_doc[100][1]
    common_rate = by_doc[101][0] / by_doc[101][1]
    assert rare_rate > common_rate
    assert all(s >= 0 for s, _ in by_doc.values())


def test_exact_substring_cuts_semantics(spark):
    """Cross-doc 8-run removal: docs sharing a run lose exactly those
    tokens (both of them), a unique doc is untouched (cleaned ==
    original), and a full duplicate is cut to the empty string."""
    import hashlib

    import __spark_entry__ as em

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = [
        (0, shared + " tailA tailB"),
        (1, "headX " + shared),
        (2, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),   # unique, >= 8 tokens
        (3, "dupe d2 d3 d4 d5 d6 d7 d8"),    # full dup pair ->
        (4, "dupe d2 d3 d4 d5 d6 d7 d8"),    #   everything cut
        (5, "tiny doc"),                     # sub-window, untouched
    ]
    spark.createDataFrame(
        docs, "doc_id BIGINT, text STRING"
    ).createOrReplaceTempView("documents")
    try:
        rows = spark.sql(
            em._SUBSTR_CUTS_SPARK.format(
                docs_src="SELECT doc_id, text FROM documents"
            )
        ).collect()
    finally:
        spark.catalog.dropTempView("documents")
        em._REGISTERED.pop(spark, None)
    got = {r.doc_id: (r.n_tokens, r.n_cut, r.cleaned_fp) for r in rows}

    def fp(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert got[0] == (10, 8, fp("tailA tailB"))
    assert got[1] == (9, 8, fp("headX"))
    assert got[2] == (9, 0, fp("u1 u2 u3 u4 u5 u6 u7 u8 u9"))
    assert got[3] == (8, 8, fp("")) and got[4] == (8, 8, fp(""))
    assert got[5] == (2, 0, fp("tiny doc"))


def test_hll_merge_equals_single_pass(spark):
    """Mergeability — the property that makes the sketch distributed:
    MAX-merged per-half registers must equal the single-pass
    whole-corpus registers bucket-for-bucket."""
    import __spark_entry__ as em

    merged = {
        (r.source, r.bucket): r.register
        for r in em.queries()["hll_register_merge"](spark, SF).collect()
    }
    full = {
        (r.source, r.bucket): r.register
        for r in em.queries()["hll_distinct_tokens"](spark, SF).collect()
    }
    assert merged == full
