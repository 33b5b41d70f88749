"""Content-defined chunking (CDC): shift-robust chunk boundaries from
a local hash condition, + cross-doc repeated-chunk detection.

`chunk_documents` cuts fixed 64-token windows at stride 48 — insert
ONE token at the front of a doc and every downstream chunk hash
changes, so edited near-copies share nothing at chunk grain. CDC (the
LBFS/FastCDC idea, Muthitacharoen et al. SOSP'01) instead cuts after
token i whenever the hash of the local 3-token window (t[i-2..i])
satisfies  h % 8 == 0:  boundaries depend only on LOCAL content, so
an insertion re-chunks at most the chunks it touches and everything
after the next surviving boundary realigns bit-identically (pinned by
test_cdc_shift_robustness). Expected chunk length = the divisor, 8
tokens; no min/max clamp — the greedy clamp of production CDC is
stateful-sequential and would buy nothing at oracle scale, while the
bare mod rule keeps the operator one deterministic expression.

Plan shape — deliberately ARRAY-NATIVE on the Spark side (boundary
positions via filter() over the token array, then an explode of CHUNK
indices slicing the array, exactly chunk_documents' shape): the
alternative LAG/SUM-OVER window formulation needs the corpus
partitioned by doc_id, i.e. a full-text shuffle of every token at
100 TB. The repo-wide "prefer explode -> codegen over interpreted
lambdas" rule (CLAUDE.md) is argued for shuffles that carry ~1 row
per doc after map-side combine; here the shuffle would carry EVERY
TOKEN, so the calculus flips and the zero-shuffle interpreted filter
wins. The only shuffle in either query is the final groupBy on 32-char
md5s (map-side combined). The DuckDB oracle IS the window formulation
— semantically identical by construction, and the cross-derivation is
exactly what the hash compare proves.

Boundary/chunk alignment contract (both engines): a boundary token
ENDS its chunk; chunk_no of a token = number of boundaries strictly
before it; docs shorter than 3 tokens have no boundary window and
form one chunk. Empty-text docs still emit one 1-token chunk (the ''
token) — harmless and symmetric in both engines. When the LAST token
is itself a boundary the Spark explode produces a zero-length
trailing slice that the window formulation never materializes — the
`WHERE size(ck) > 0` filter drops it (numbering of the real chunks
is unaffected).
"""

from __future__ import annotations

DIVISOR = 8  # expected tokens per chunk

# Spark: boundary hash on 0-based i in [2, n-1] over t[i-2..i].
_H3_SPARK = (
    "pmod(CAST(conv(substring(md5(concat_ws(' ', t[i-2], t[i-1], t[i])),"
    " 1, 15), 16, 10) AS BIGINT), 8)"
)

CDC_CHUNKS_SPARK = f"""
SELECT doc_id, CAST(j AS BIGINT) AS chunk_no,
       CAST(size(ck) AS BIGINT) AS n_tokens,
       md5(concat_ws(' ', ck)) AS chunk_hash
FROM (
  SELECT doc_id, j,
         slice(t,
               CASE WHEN j = 0 THEN 1 ELSE b[j-1] + 2 END,
               (CASE WHEN j = size(b) THEN size(t) - 1 ELSE b[j] END)
                 - (CASE WHEN j = 0 THEN 0 ELSE b[j-1] + 1 END) + 1) AS ck
  FROM (
    SELECT doc_id, t,
           CASE WHEN size(t) >= 3
                THEN filter(sequence(2, size(t) - 1), i -> {_H3_SPARK} = 0)
                ELSE array() END AS b
    FROM (SELECT doc_id, split(text, ' ') AS t FROM ({{docs_src}}))
  )
  LATERAL VIEW explode(sequence(0, size(b))) x AS j
)
WHERE size(ck) > 0
"""

# Shared cross-doc tail: chunks repeated in >= 2 distinct docs.
REPEATED_TAIL_SQL = """
SELECT chunk_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MIN(n_tokens) AS BIGINT) AS n_tokens
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) >= 2
"""

CDC_REPEATED_SPARK = (
    "WITH chunks AS (" + CDC_CHUNKS_SPARK + ")\n" + REPEATED_TAIL_SQL
)

# DuckDB oracle: the window-function derivation of the same contract.
# (SUM returns HUGEINT in DuckDB -> explicit BIGINT casts.)
CDC_CHUNKS_DUCK_CTE = """
toks AS (SELECT doc_id,
                generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
                unnest(string_split(text, ' ')) AS tok
         FROM documents),
lagged AS (
  SELECT doc_id, pos, tok,
         LAG(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
         LAG(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1
  FROM toks),
flags AS (
  SELECT doc_id, pos, tok,
         CASE WHEN pos >= 2 AND
                   ('0x' || substr(md5(t2 || ' ' || t1 || ' ' || tok),
                                   1, 15))::BIGINT % 8 = 0
              THEN 1 ELSE 0 END AS b
  FROM lagged),
ch AS (
  SELECT doc_id, pos, tok,
         CAST(COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS chunk_no
  FROM flags),
chunks AS (
  SELECT doc_id, chunk_no,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
  FROM ch GROUP BY doc_id, chunk_no)
"""

CDC_CHUNKS_DUCK = (
    "WITH " + CDC_CHUNKS_DUCK_CTE
    + "\nSELECT doc_id, chunk_no, n_tokens, chunk_hash FROM chunks"
)
CDC_REPEATED_DUCK = "WITH " + CDC_CHUNKS_DUCK_CTE + REPEATED_TAIL_SQL
