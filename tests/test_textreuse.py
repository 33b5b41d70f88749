"""Winnowing fingerprints + text-reuse pairs (operators/textreuse.py).

Hermetic: builds its own docs in a scoped temp view (never overlays the
battery's `documents` view), and checks the Spark SQL against an
INDEPENDENT pure-Python reimplementation of robust winnowing — the MOSS
guarantee and the rightmost tie-break are asserted against that oracle,
not against the SQL's own output.
"""

import hashlib

import pytest

from onnxocr_spark.operators.textreuse import (
    K,
    TEXT_REUSE_PAIRS_SQL,
    W,
    WINNOW_FINGERPRINTS_SQL,
)

VIEW = "textreuse_test_docs"


def ref_fingerprints(tokens, k=K, w=W):
    """Pure-Python robust winnowing: window of w k-gram hashes, min
    selected, ties to the rightmost position."""
    n = len(tokens) - k + 1
    if n < w:
        return set()
    hs = []
    for i in range(n):
        kg = " ".join(tokens[i : i + k])
        hs.append(int(hashlib.md5(kg.encode()).hexdigest()[:15], 16) % 2147483647)
    out = set()
    for j in range(n - w + 1):
        m = min(hs[j : j + w])
        p = max(i for i in range(j, j + w) if hs[i] == m)
        out.add((p, hs[p]))
    return out


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


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _text(seed, n):
    """Deterministic token stream (no RNG — md5-driven)."""
    toks = []
    for i in range(n):
        h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
        toks.append(WORDS[h % len(WORDS)])
    return toks


def test_matches_python_reference(spark):
    docs = [(i, " ".join(_text(i, 40 + 7 * i))) for i in range(6)]
    got = _run(spark, docs, WINNOW_FINGERPRINTS_SQL)
    want = {
        (doc_id, pos, h)
        for doc_id, text in docs
        for (pos, h) in ref_fingerprints(text.split(" "))
    }
    assert set(got) == want
    assert len(got) == len(want)  # DISTINCT means no dup rows either


@pytest.mark.parametrize("ntok", [1, 3, K + W - 2])
def test_below_guarantee_threshold_emits_nothing(spark, ntok):
    docs = [(0, " ".join(_text(9, ntok)))]
    assert _run(spark, docs, WINNOW_FINGERPRINTS_SQL) == []


def test_moss_guarantee_shared_run_shares_a_fingerprint(spark):
    """Any shared token run of >= k + w - 1 tokens must share at least
    one fingerprint HASH between the two docs (the paper's guarantee),
    at every insertion offset of the run in the second doc."""
    run = _text(1234, K + W - 1)  # exactly the guarantee length
    base = _text(1, 30)
    a_tokens = base[:12] + run + base[12:]
    for offset in range(0, 24, 5):
        other = _text(2 + offset, 30)
        b_tokens = other[:offset] + run + other[offset:]
        docs = [(0, " ".join(a_tokens)), (1, " ".join(b_tokens))]
        rows = _run(spark, docs, WINNOW_FINGERPRINTS_SQL)
        ha = {h for d, p, h in rows if d == 0}
        hb = {h for d, p, h in rows if d == 1}
        assert ha & hb, f"offset {offset}: no shared fingerprint"


def test_density_bound(spark):
    """Winnowing selects at most one fingerprint per window and at
    least one per w consecutive windows — positions per doc fall in
    [ceil(nwin / w), nwin]."""
    docs = [(i, " ".join(_text(100 + i, 200))) for i in range(3)]
    rows = _run(spark, docs, WINNOW_FINGERPRINTS_SQL)
    nwin = (200 - K + 1) - W + 1
    for d in range(3):
        cnt = len([r for r in rows if r[0] == d])
        assert nwin // W <= cnt <= nwin
        # expected density ~ 2/(w+1) per window; loose sanity band
        assert cnt < 0.8 * nwin


def test_reuse_pairs_against_reference(spark):
    """Pair counts + containment vs the Python oracle, including the
    doc-frequency cap (hashes in > 32 docs excluded from pairing) and
    the shared >= 2 floor."""
    run = _text(7, 20)
    docs = []
    for i in range(5):
        filler = _text(50 + i, 25)
        docs.append((i, " ".join(filler[:10] + run + filler[10:])))
    docs.append((5, " ".join(_text(99, 40))))  # unrelated
    rows = _run(spark, docs, TEXT_REUSE_PAIRS_SQL)

    fps = {d: ref_fingerprints(t.split(" ")) for d, t in docs}
    sets = {d: {h for _, h in v} for d, v in fps.items()}
    want = []
    for a in range(6):
        for b in range(a + 1, 6):
            shared = len(sets[a] & sets[b])  # n_docs=6 < 32: cap inert
            if shared >= 2:
                want.append(
                    (a, b, shared, shared / min(len(sets[a]), len(sets[b])))
                )
    assert sorted(rows) == sorted(want)
    assert len(want) >= 10  # the 5 run-sharing docs must all pair up


def _ref_pairs(docs, max_df=32, min_shared=2):
    """Cap-aware Python oracle for the pair stage: containment sizes
    use the FULL fingerprint sets; only the pair support excludes
    hashes with doc-frequency > max_df (exactly the SQL's shape)."""
    sets = {d: {h for _, h in ref_fingerprints(t.split(" "))} for d, t in docs}
    df = {}
    for s in sets.values():
        for h in s:
            df[h] = df.get(h, 0) + 1
    rare = {d: {h for h in s if df[h] <= max_df} for d, s in sets.items()}
    out = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(rare[a] & rare[b])
            if shared >= min_shared:
                out.append((a, b, shared, shared / min(len(sets[a]), len(sets[b]))))
    return out


def test_df_cap_drops_ubiquitous_fingerprints(spark):
    """A fingerprint present in > 32 docs is boilerplate and leaves the
    pair support: 40 docs whose only overlap is one common run produce
    exactly what the cap-aware reference says (the run's hashes, at
    df=40, support no pair), while the same construction at 20 docs
    pairs every run-sharing doc with every other. (The run is 20
    tokens: the guarantee-length run of k+w-1 yields only ~1 shared
    fingerprint, under the shared >= 2 pair floor.)"""
    run = _text(11, 20)

    def mk(n):
        out = []
        for i in range(n):
            filler = _text(300 + i, 30)
            out.append((i, " ".join(filler[:15] + run + filler[15:])))
        return out

    # the run really fingerprints identically across all docs
    common_all = set.intersection(
        *({h for _, h in ref_fingerprints(t.split(" "))} for _, t in mk(40))
    )
    assert common_all

    big = _run(spark, mk(40), TEXT_REUSE_PAIRS_SQL)
    assert sorted(big) == sorted(_ref_pairs(mk(40)))

    small = _run(spark, mk(20), TEXT_REUSE_PAIRS_SQL)
    assert sorted(small) == sorted(_ref_pairs(mk(20)))
    assert len(small) >= 20 * 19 // 2  # all run-sharing docs pair up
