"""Dup-graph analytics (operators/graph.py) vs a brute-force Python
reference. The overlay corpus has strongly unique texts, so the LSH
pair contribution is empty and the graph is EXACTLY the deterministic
residue fixture — the reference re-derives fixture edges, degrees and
triangles from the documented rules and from first principles
(adjacency-set intersection), independent of any orientation trick."""

from itertools import combinations

N = 60
DOCS_SRC = "SELECT doc_id, text FROM documents"


def _overlay(spark):
    docs = [(i, f"u{i}a u{i}b u{i}c u{i}d") for i in range(N)]
    spark.createDataFrame(
        docs, "doc_id BIGINT, text STRING"
    ).createOrReplaceTempView("documents")


def _teardown(spark):
    import __spark_entry__ as em

    spark.catalog.dropTempView("documents")
    em._REGISTERED.pop(spark, None)


def _ref_edges():
    e = set()
    for d in range(N):
        if d % 10 < 5 and d + 1 < N:
            e.add((d, d + 1))
        if d % 10 < 3 and d + 2 < N:
            e.add((d, d + 2))
        if d % 50 != 0 and d % 7 == 0:
            e.add(tuple(sorted((d - d % 50, d))))
    return {(a, b) for a, b in e if a != b}


def _ref_triangles(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per_doc = {}
    tris = {
        tuple(sorted(t))
        for a, b in edges
        for t in ((a, b, c) for c in adj[a] & adj[b])
    }
    for t in tris:
        for v in t:
            per_doc[v] = per_doc.get(v, 0) + 1
    return per_doc


def test_degree_hist_matches_reference(spark):
    from onnxocr_spark.operators.graph import degree_hist

    _overlay(spark)
    try:
        got = {
            r.degree: r.n_docs
            for r in degree_hist(spark, DOCS_SRC).collect()
        }
    finally:
        _teardown(spark)
    deg = {}
    for a, b in _ref_edges():
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    hist = {}
    for d in deg.values():
        hist[d] = hist.get(d, 0) + 1
    assert got == hist


def test_triangles_match_reference(spark):
    from onnxocr_spark.operators.graph import triangles

    _overlay(spark)
    try:
        got = {
            r.doc_id: r.n_tri for r in triangles(spark, DOCS_SRC).collect()
        }
    finally:
        _teardown(spark)
    ref = _ref_triangles(_ref_edges())
    assert got == ref
    assert ref, "fixture must actually contain triangles"
    # hub sanity: the chord rule closes (d, d+1, d+2) whenever all
    # three edges exist — spot-check one by hand
    assert got.get(0, 0) >= 1


def test_triangle_count_orientation_invariance(spark):
    """The degree-ordered wedge join must count each triangle EXACTLY
    once: the sum of per-doc participations is 3x the number of
    distinct triangles in the reference."""
    from onnxocr_spark.operators.graph import triangles

    _overlay(spark)
    try:
        total = sum(
            r.n_tri for r in triangles(spark, DOCS_SRC).collect()
        )
    finally:
        _teardown(spark)
    edges = _ref_edges()
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_tris = sum(
        1
        for a, b, c in combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert total == 3 * n_tris
