"""Keyword retrieval over the corpus: TF-IDF-style top-k scoring with
exact integer weights.

A training-data pipeline needs corpus search (inspect dedup clusters,
pull eval-adjacent docs, audit filters). Classic TF-IDF weighs a term
as ln(N/df) — a transcendental whose low bits are not contractually
identical across engines, which would poison a hash-compared oracle
whenever two docs' float scores cross. Instead the weight is the
RATIONAL idf  widf(t) = (N * 1_000_000) div df(t)  — exact BIGINT in
both engines, strictly decreasing in df like the log weight — and the
score is  sum over query terms of tf(d,t) * widf(t),  an exact BIGINT
sum (order-free). Ties rank by doc_id. The docstring-level contract:
same top-k SEMANTICS as tf-idf with a rational weight curve, bit-equal
across engines by construction (no float enters the operator).

Plan shape at 100 TB: the token explode is the narrow per-doc pass
(codegen; same fan-out discipline as the shingle queries via
{docs_src}); the query-term table is a literal VALUES relation —
Catalyst broadcasts it, so non-matching tokens die map-side and the
only shuffle rows are (doc_id, matched-term) hits, ~ppm of the token
stream for selective queries. tf/df aggregations are map-side
combined; the final ranking window partitions by query_id (Q rows
per partition bound by N — for top-k at scale swap the window for the
salted two-phase top-K the domain-quota operator uses; at Q queries
x corpus hits the window input is already only the scored docs).

The DuckDB oracle shares every CTE except the tokenizer (explode vs
unnest) and the integer division spelling (DIV vs //); the fixed
8-term / 4-query set is inlined identically on both sides.
"""

from __future__ import annotations

TOP_K = 5
IDF_SCALE = 1_000_000

# Fixed query set, inlined in both dialects. Terms are drawn from the
# synthetic corpus vocabulary so every query matches at all SFs.
QUERY_TERMS_SQL = """
  SELECT * FROM (VALUES
    (0, 'spark'), (0, 'join'),
    (1, 'hash'),  (1, 'table'),
    (2, 'window'), (2, 'agg'), (2, 'scan'),
    (3, 'vector'), (3, 'stream')
  ) AS q(query_id, term)
"""

TOKS_SPARK = """
  SELECT doc_id, tok
  FROM ({docs_src}) LATERAL VIEW explode(split(text, ' ')) t AS tok
"""

TOKS_DUCK = """
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
"""

# {idiv}: Spark DIV / DuckDB //. Everything else is shared verbatim.
TFIDF_TAIL_TEMPLATE = """
hits AS (
  SELECT t.doc_id, t.tok
  FROM toks t JOIN (SELECT DISTINCT term FROM q) v ON t.tok = v.term
),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       FROM hits GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       FROM hits GROUP BY tok),
w AS (SELECT df.tok,
             ((SELECT CAST(COUNT(*) AS BIGINT) FROM documents) * 1000000)
               {idiv} df.df AS widf
      FROM df),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(SUM(tf.tf * w.widf) AS BIGINT) AS score
  FROM q JOIN tf ON tf.tok = q.term JOIN w ON w.tok = q.term
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS BIGINT)
           AS rank
  FROM scored
)
SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= 5
"""

TFIDF_TOPK_SQL = (
    "WITH q AS (" + QUERY_TERMS_SQL + "),\ntoks AS (" + TOKS_SPARK + "),\n"
    + TFIDF_TAIL_TEMPLATE.format(idiv="DIV")
)
TFIDF_TOPK_DUCK = (
    "WITH q AS (" + QUERY_TERMS_SQL + "),\ntoks AS (" + TOKS_DUCK + "),\n"
    + TFIDF_TAIL_TEMPLATE.format(idiv="//")
)
