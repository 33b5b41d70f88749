"""Document fingerprinting by robust winnowing + cross-doc text-reuse
pairs (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003 — the MOSS algorithm).

Complements the existing dedup families: MinHash/LSH and SimHash find
WHOLE-document near-duplicates; winnowing finds LOCAL reuse — a
paragraph lifted from one doc into an otherwise unrelated one — with
the paper's guarantee that any shared token run of length >= k + w - 1
(here 4 + 4 - 1 = 7 tokens) shares at least one selected fingerprint.

Construction (all exact integer/string ops — no RNG, no floats until
the single final containment division):

  1. k-grams (k=4) over the whitespace token stream, hashed to
     [0, 2^31) via md5 — same hash family as the MinHash shingles
     (dedup.py MINHASH_CORE_SQL).
  2. winnowing window w=4 over the k-gram hash sequence: each window
     of 4 consecutive hashes selects its minimum, ties to the
     RIGHTMOST position (the paper's deterministic tie rule). A
     position's hash and its position are packed into one BIGINT key
     (h * 2^24 + (2^24-1 - pos)) so a plain windowed MIN performs the
     rightmost-argmin; density of selected fingerprints ~= 2/(w+1)
     per token. Docs shorter than k + w - 1 tokens emit nothing (no
     full window exists — exactly the guarantee boundary).
  3. reuse pairs: equi-join distinct (doc, fp_hash) on fp_hash,
     count shared fingerprints, containment = shared / min(|A|, |B|)
     as ONE IEEE division (bit-identical across engines — see the
     float-boundary rules). Fingerprints present in more than
     `max_df` docs are excluded from pairing: they are boilerplate
     (the boilerplate_chunks operator owns those) and, at corpus
     scale, hub keys that would otherwise make the join quadratic in
     the hottest hash.

Scale shape: the k-gram derivation is the same narrow explode ->
codegen path as SHINGLES_SQL (no token self-join); winnowing is one
window function partitioned by doc (each doc's k-grams sit in one
task after the map-side-combined shuffle); the pair join is keyed by
fp_hash with the max_df cap bounding per-key fan-out at max_df^2/2
rows — the identical skew argument to LSH band join + star edges.
The packed-key multiplier 2^24 bounds docs at 16M tokens; longer docs
would alias positions (raise the multiplier together with the oracle
if that corpus exists).

The DuckDB oracles in __spark_entry__.py re-derive the construction
from WINNOW_TAIL_TEMPLATE (one {idiv} dialect hole — see below) —
beyond that only the k-gram CTE differs per dialect (explode/struct
vs generate_subscripts + 3 self-joins).
Reference has no counterpart (pipeline-capability operator, not a
reference-parity one).
"""

from __future__ import annotations

K = 4          # tokens per k-gram
W = 4          # winnowing window (k-grams per window)
POS_MULT = 16777216  # 2^24 — packs (hash, pos) into one BIGINT
MAX_DF = 32    # fingerprints in more docs than this are boilerplate
MIN_SHARED = 2  # pairs must share at least this many fingerprints

# Spark-dialect k-gram CTE: narrow explode of (pos, kgram) structs —
# the offset rides inside the struct (posexplode would block nested
# pruning on struct sources; here it's a plain string but the explode
# pattern is the repo-wide convention, see SHINGLES_SQL).
KGRAMS_SPARK = """
  SELECT doc_id, s.pos AS pos,
         pmod(CAST(conv(substring(md5(s.kg), 1, 15), 16, 10) AS BIGINT),
              2147483647) AS h
  FROM (
    SELECT doc_id,
           explode(transform(sequence(1, size(t) - 3),
                   i -> named_struct('pos', i - 1,
                                     'kg', concat_ws(' ', t[i-1], t[i],
                                                     t[i+1], t[i+2])))) AS s
    FROM (SELECT doc_id, split(text, ' ') AS t FROM ({docs_src}))
    WHERE size(t) >= 4
  )
"""

# Near-engine-independent tail: windowed rightmost-argmin selection.
# wkey = h * 2^24 + (2^24-1 - pos): MIN over the frame picks the
# smallest hash, ties to the LARGEST pos. The decode MUST be integer
# division ({idiv} -> Spark `DIV`, DuckDB `//`): wkey exceeds 2^53, so
# a double division silently rounds in DuckDB while Spark's decimal
# literals divide exactly — an off-by-one on ~1/500 hashes (measured).
# The anchor restriction (pos <= n - w: only full windows select)
# applies AFTER the windowed MIN — filtering kv first would remove the
# trailing k-grams from the last anchors' frames and silently mis-pick
# those windows' minima (caught by the pure-Python winnowing oracle in
# tests/test_textreuse.py, which both engines agreed in missing).
WINNOW_TAIL_TEMPLATE = """
cnt AS (SELECT doc_id, COUNT(*) AS n FROM kv GROUP BY doc_id),
keyed AS (
  SELECT doc_id, pos,
         MIN(h * 16777216 + (16777215 - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
  FROM kv
),
fp AS (
  SELECT DISTINCT k.doc_id,
         CAST(wkey {idiv} 16777216 AS BIGINT) AS fp_hash,
         CAST(16777215 - (wkey % 16777216) AS BIGINT) AS fp_pos
  FROM keyed k JOIN cnt c ON k.doc_id = c.doc_id
  WHERE k.pos + 4 <= c.n
)
"""
WINNOW_TAIL_SPARK = WINNOW_TAIL_TEMPLATE.format(idiv="DIV")
WINNOW_TAIL_DUCK = WINNOW_TAIL_TEMPLATE.format(idiv="//")

FINGERPRINTS_SELECT = """
SELECT doc_id, fp_pos, fp_hash FROM fp
"""

# Pair tail: df cap -> equi-join -> containment. The sizes joins are
# one-row-per-doc (broadcast-tiny); `shared` and sizes are exact
# BIGINTs; containment is a single division of identical operands —
# emitted raw per the float-boundary rules.
REUSE_PAIRS_SELECT = """,
fps AS (SELECT DISTINCT doc_id, fp_hash FROM fp),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM fps GROUP BY doc_id),
df AS (SELECT fp_hash, COUNT(*) AS ndocs FROM fps GROUP BY fp_hash),
rare AS (
  SELECT f.doc_id, f.fp_hash
  FROM fps f JOIN df ON f.fp_hash = df.fp_hash
  WHERE df.ndocs <= 32
),
common AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM rare x JOIN rare y ON x.fp_hash = y.fp_hash AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT c.doc_a, c.doc_b, c.shared,
       CAST(c.shared AS DOUBLE) / LEAST(sa.sz, sb.sz) AS containment
FROM common c
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE c.shared >= 2
"""

WINNOW_FINGERPRINTS_SQL = (
    "WITH kv AS (" + KGRAMS_SPARK + "),\n" + WINNOW_TAIL_SPARK + FINGERPRINTS_SELECT
)
TEXT_REUSE_PAIRS_SQL = (
    "WITH kv AS (" + KGRAMS_SPARK + "),\n" + WINNOW_TAIL_SPARK + REUSE_PAIRS_SELECT
)
