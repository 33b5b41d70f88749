"""Canonical PII patterns and the scrub chain (single source of truth).

Java-regex spellings (Spark SQL string-literal form: backslashes
doubled so the SQL parser delivers '\\b' to the Java regex engine).
The DuckDB/RE2 spellings used by the battery oracles are DERIVED in
`__spark_entry__.py` by collapsing the double backslashes — the
coupling invariant (CLAUDE.md): these patterns, their order, and the
replacement tokens are load-bearing on BOTH engines; change them here
and the oracle derivations together or not at all.

Scrub ORDER is part of the contract (email → ip → ssn → phone):
replacement tokens must never create new matches for a LATER pattern,
and the battery's `pii_scrub` + `corpus_final` oracles replay the same
order. `jobs/corpus_build_job.py` applies the same chain to real
corpus text (where the battery queries apply it to the deterministic
in-query fixture, since the synthetic corpus carries no PII).
"""

from __future__ import annotations

PII_EMAIL_J = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IP_J = r"\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
PII_SSN_J = r"\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
PII_PHONE_J = r"\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

# (pattern, replacement) in canonical scrub order
SCRUB_CHAIN = (
    (PII_EMAIL_J, "<EMAIL>"),
    (PII_IP_J, "<IP>"),
    (PII_SSN_J, "<SSN>"),
    (PII_PHONE_J, "<PHONE>"),
)


def scrub_sql_expr(col: str = "text") -> str:
    """Spark SQL expression applying the canonical scrub chain to
    ``col`` — nested regexp_replace, innermost first pattern."""
    expr = col
    for pat, repl in SCRUB_CHAIN:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}')"
    return expr
