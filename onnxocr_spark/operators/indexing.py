"""Inverted-index phrase search and Bloom-filter decontamination.

Two corpus-index operators a training-data pipeline runs constantly:
"find every document containing this exact phrase" (audit a dedup
cluster, trace a leaked eval answer) and "flag documents sharing any
n-gram with the benchmark set" at a memory cost independent of the
benchmark's shingle count (the Bloom twin of the exact
`decontaminate_overlap` join).

Phrase search — index-intersection, not positional self-join
------------------------------------------------------------
The naive positional plan joins the postings stream to itself once per
phrase token (L-1 corpus-sized shuffles). Search engines instead
intersect postings: explode each query phrase into (query, i, token_i)
rows — a tiny relation that Catalyst BROADCASTS — and equi-join the
postings ONCE against it. Every matching posting casts a "vote" for a
candidate start position (pos - i); a start that collects all L
distinct vote indices is a genuine occurrence. One broadcast join +
one map-side-combinable groupBy; non-matching tokens (the overwhelming
majority) die map-side, so the only shuffled rows are term hits.
Variable phrase lengths (3-5 tokens here, keyed off the query doc id)
fall out for free — which is exactly what the fixed-length n-gram
formulation can't do without one stream per length.

Duplicate tokens inside a phrase ("a b a") are handled by counting
DISTINCT vote indices, not votes: the 'a'@p posting votes for starts p
and p-2, and each start still needs all L distinct i's to win.

Query set: docs with doc_id % 97 == 0 contribute their first
L = 3 + (doc_id/97 % 3) tokens as the phrase — deterministic, non-empty
at every SF, and every phrase trivially matches its own source doc
(a built-in sanity row per query).

Bloom decontamination — constant-size filter vs broadcast shingle set
---------------------------------------------------------------------
`decontaminate_overlap` broadcasts the DISTINCT eval shingles — fine at
10^5 eval docs, but the broadcast grows with the benchmark. The Bloom
variant folds the eval shingles into a fixed 65,536-bit filter (2,048
x 32-bit words in BIGINT lanes, 2 hash probes) with ONE
map-side-combined bit_or aggregation; membership is a broadcast join
of the corpus shingle stream against the 2k-row word table. The filter
size is a CONSTANT of the operator, not a function of the eval set —
at 100 TB the probe side stays a per-executor 16 KB table forever.
False positives are inherent to Bloom semantics but DETERMINISTIC
given the hash family (md5 hex lanes, same on both engines), so the
DuckDB oracle reproduces them bit-for-bit — the oracle proves the
FILTER's exact contents, while `test_bloom_superset_of_exact` pins the
semantic contract (bloom hits ⊇ exact hits, per doc).

Word lanes are 32 bits wide in a BIGINT so the shift operand never
exceeds 31: Spark's shiftleft wraps at 64 bits silently while DuckDB's
`<<` errors on BIGINT overflow — 32-bit lanes keep both engines in the
well-defined range (same class of trap as the CLAUDE.md shiftleft
note). The two dialect strings below must stay rule-for-rule
identical; change them together or not at all.
"""

from __future__ import annotations

BLOOM_BITS = 65_536  # 2,048 x 32-bit word lanes
_LANE = 32

# ---- phrase search ---------------------------------------------------------

PHRASE_SEARCH_SQL = """
WITH tok AS (
  SELECT doc_id, pos, token
  FROM (SELECT doc_id, split(text, ' ') AS t FROM ({docs_src}))
  LATERAL VIEW posexplode(t) x AS pos, token
),
qd AS (
  SELECT doc_id AS q_doc,
         CAST(3 + (doc_id DIV 97) % 3 AS BIGINT) AS phrase_len,
         split(text, ' ') AS t
  FROM documents WHERE doc_id % 97 = 0
),
qp AS (
  SELECT q_doc, phrase_len,
         concat_ws(' ', slice(t, 1, CAST(phrase_len AS INT))) AS phrase
  FROM qd WHERE size(t) >= phrase_len
),
leads AS (
  -- one LEAD per distance: Spark does NOT dedupe textually repeated
  -- window expressions across output columns (9 lead evals observed
  -- in the plan when the g3/g4/g5 concats inlined them), so project
  -- the 4 distinct leads once and concat in the parent
  SELECT doc_id, token,
         LEAD(token, 1) OVER w AS l1, LEAD(token, 2) OVER w AS l2,
         LEAD(token, 3) OVER w AS l3, LEAD(token, 4) OVER w AS l4
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grams AS (
  SELECT doc_id,
         token || ' ' || l1 || ' ' || l2 AS g3,
         token || ' ' || l1 || ' ' || l2 || ' ' || l3 AS g4,
         token || ' ' || l1 || ' ' || l2 || ' ' || l3 || ' ' || l4 AS g5
  FROM leads
),
cand AS (
  SELECT doc_id, L, gram
  FROM grams
  LATERAL VIEW explode(map(CAST(3 AS BIGINT), g3,
                           CAST(4 AS BIGINT), g4,
                           CAST(5 AS BIGINT), g5)) x AS L, gram
  WHERE gram IS NOT NULL
)
SELECT /*+ BROADCAST(qp) */ qp.q_doc, cand.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_occur
FROM cand JOIN qp ON cand.L = qp.phrase_len AND cand.gram = qp.phrase
GROUP BY qp.q_doc, cand.doc_id
"""
# ^ SLIDING-GRAM formulation (r6 continuation, guide §1.2). The
# original inverted-index shape joined EVERY corpus token occurrence
# against EVERY query term and vote-intersected per (q, doc, start).
# Both sides of that join scale with the corpus (the query set is
# doc_id % 97 = 0), so the votes intermediate is quadratic BY
# CONSTRUCTION — measured 1.87 M rows at sf0.1 but 186 M at a 10×
# corpus. This plan instead materializes each position's 3/4/5-gram
# once (one hash exchange of the token table by doc_id + a per-doc
# LEAD window — the {3,4,5} map keys are exactly the phrase_len
# domain 3 + (doc_id DIV 97) % 3) and equi-joins the gram string
# against the BROADCAST phrase strings, so the intermediate is
# 3 rows/token — linear — and matches only survive the join.
# Row-identical by construction: a phrase of length L matches at
# (doc, start) iff the L-gram at start equals it — space-joined grams
# are injective because split-on-space tokens cannot contain a space,
# and `||` NULL-propagation (NOT concat_ws, which skips NULLs) kills
# doc-tail grams so no short-tail false positives exist. The DuckDB
# twin keeps the votes + COUNT(DISTINCT i) formulation: the
# cross-engine green row is the equivalence proof. Measured: sf0.1
# cold-call parity within drift (interleaved 5.17/4.92 old vs
# 5.41/4.19 new, warm both ~1.1-1.7 s) and a 10× tiled corpus
# 39 → 3.2 s warm (12×); an anchor-first variant tried en route read
# 13 s at 10× but paid ~0.7 s at sf0.1 — this one holds both scales.

PHRASE_SEARCH_DUCK = """
WITH tok AS (
  SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos, unnest(t) AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
qd AS (
  SELECT doc_id AS q_doc,
         CAST(3 + (doc_id // 97) % 3 AS BIGINT) AS phrase_len,
         string_split(text, ' ') AS t
  FROM documents WHERE doc_id % 97 = 0
),
qi AS (
  SELECT q_doc, phrase_len, t, unnest(range(phrase_len)) AS i
  FROM qd WHERE len(t) >= phrase_len
),
qt AS (
  SELECT q_doc, phrase_len, i, t[CAST(i + 1 AS INT)] AS token FROM qi
),
votes AS (
  SELECT qt.q_doc, qt.phrase_len, tok.doc_id,
         tok.pos - qt.i AS start_pos, qt.i
  FROM tok JOIN qt ON tok.token = qt.token
),
hits AS (
  SELECT q_doc, doc_id, start_pos
  FROM votes
  GROUP BY q_doc, phrase_len, doc_id, start_pos
  HAVING COUNT(DISTINCT i) = phrase_len
)
SELECT q_doc, doc_id, CAST(COUNT(*) AS BIGINT) AS n_occur
FROM hits GROUP BY q_doc, doc_id
"""

# ---- bloom decontamination -------------------------------------------------
# Same 8-gram shingles and eval split (doc_id % 100 < 2) as the exact
# decontaminate_overlap query, so the two operators are directly
# comparable per doc. Two probes from independent md5 hex lanes
# (chars 1-15 and 17-31 of the same digest).

BLOOM_DECONTAM_SQL = """
WITH sh AS (
  SELECT doc_id, explode(transform(sequence(1, size(t) - 7),
             i -> concat_ws(' ', slice(t, i, 8)))) AS shingle
  FROM (SELECT doc_id, split(text, ' ') AS t FROM ({docs_src}))
  WHERE size(t) >= 8
),
hb AS (
  SELECT doc_id, shingle,
         pmod(CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT),
              65536) AS b1,
         pmod(CAST(conv(substring(md5(shingle), 17, 15), 16, 10) AS BIGINT),
              65536) AS b2
  FROM (SELECT DISTINCT doc_id, shingle FROM sh) ds
),
evbit AS (
  SELECT explode(array(b1, b2)) AS bit FROM hb WHERE doc_id % 100 < 2
),
bloom AS (
  SELECT w, bit_or(shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))) AS bits
  FROM (SELECT CAST(bit DIV 32 AS BIGINT) AS w, bit % 32 AS b FROM evbit)
  GROUP BY w
),
blarr AS (
  SELECT transform(sequence(0, 2047),
                   w -> coalesce(m[CAST(w AS BIGINT)], CAST(0 AS BIGINT)))
           AS arr
  FROM (SELECT map_from_entries(collect_list(struct(w, bits))) AS m
        FROM bloom)
),
tr AS (
  SELECT doc_id, b1, b2, (SELECT arr FROM blarr) AS arr
  FROM hb WHERE doc_id % 100 >= 2
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom_hits
FROM tr
WHERE (arr[CAST(b1 DIV 32 AS INT)]
       & shiftleft(CAST(1 AS BIGINT), CAST(b1 % 32 AS INT))) <> 0
  AND (arr[CAST(b2 DIV 32 AS INT)]
       & shiftleft(CAST(1 AS BIGINT), CAST(b2 % 32 AS INT))) <> 0
GROUP BY doc_id
"""
# ^ r6 physical restructure of the SPARK side only — the hash lanes,
# lane width, bit rules and the filter's exact contents are unchanged
# (the DuckDB twin below still proves them bit-for-bit):
#  - md5 moves AFTER the (doc_id, shingle) DISTINCT, so each distinct
#    shingle is hashed once instead of once per occurrence (guide §2.3);
#  - the eval side feeds the filter via ONE scan
#    (explode(array(b1,b2))) where the UNION ALL twin scanned — and,
#    Spark inlining CTEs, re-shingled — the eval docs twice (§2.4);
#  - the 2,048-word filter becomes ONE dense array in a scalar
#    subquery (absent word ⇔ 0 ⇔ the inner join's no-match row drop),
#    so the probe is a projection-level mask test instead of two
#    broadcast hash joins, and the whole eval pipeline executes once
#    instead of once per join side. The subquery result is what gets
#    shipped per executor: the same constant 16 KB, now literally one
#    row.

BLOOM_DECONTAM_DUCK = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_transform(range(len(t) - 7),
             i -> array_to_string(t[CAST(i + 1 AS INT):CAST(i + 8 AS INT)],
                                  ' '))) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 8
),
hb AS (
  SELECT DISTINCT doc_id, shingle,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 65536 AS b1,
         ('0x' || substr(md5(shingle), 17, 15))::BIGINT % 65536 AS b2
  FROM sh
),
evbit AS (
  SELECT b1 AS bit FROM hb WHERE doc_id % 100 < 2
  UNION ALL
  SELECT b2 AS bit FROM hb WHERE doc_id % 100 < 2
),
bloom AS (
  SELECT w, bit_or((1::BIGINT << CAST(b AS INT))) AS bits
  FROM (SELECT bit // 32 AS w, bit % 32 AS b FROM evbit)
  GROUP BY w
),
tr AS (
  SELECT doc_id, shingle, b1, b2 FROM hb WHERE doc_id % 100 >= 2
)
SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom_hits
FROM tr
JOIN bloom w1 ON w1.w = tr.b1 // 32
JOIN bloom w2 ON w2.w = tr.b2 // 32
WHERE (w1.bits & (1::BIGINT << CAST(tr.b1 % 32 AS INT))) <> 0
  AND (w2.bits & (1::BIGINT << CAST(tr.b2 % 32 AS INT))) <> 0
GROUP BY tr.doc_id
"""
