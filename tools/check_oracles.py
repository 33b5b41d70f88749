"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir,
compare row count + sorted values. Usage:

    python tools/check_oracles.py [--audit-floats] [sf_dir] [query ...]

--audit-floats additionally re-runs every oracle with each ROUND(x, n)
call routed through a margin-recording UDF and FAILS if any pre-round
value sits within 1e-6 rounding quanta of a .5 boundary — i.e. close
enough that a ~1e-12 cross-engine evaluation difference could flip the
rounded digit and hence the value hash (CLAUDE.md float-boundary audit).
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(int)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


_AUDIT_MIN: dict[str, float] = {}
_AUDIT_MARGINS: list[float] = []
_AUDIT_REGISTERED: set[int] = set()


def _audit_round_udf(x: float, n: int) -> float:
    scaled = x * (10.0 ** n)
    _AUDIT_MARGINS.append(abs(scaled - math.floor(scaled) - 0.5))
    return round(x, n)


def _audit_round_margins(con, name: str, sql: str) -> float | None:
    """Re-run `sql` with ROUND(x, n) intercepted: records the minimum
    distance (in units of the rounding quantum 10^-n) of any pre-round
    value from the nearest .5 flip boundary. Returns the min margin, or
    None if the query contains no ROUND."""
    import re

    if not re.search(r"\bROUND\s*\(", sql, re.IGNORECASE):
        return None
    _AUDIT_MARGINS.clear()
    if id(con) not in _AUDIT_REGISTERED:
        con.create_function("audit_round", _audit_round_udf, [float, int], float)
        _AUDIT_REGISTERED.add(id(con))
    audited = re.sub(r"\bROUND\s*\(", "audit_round(", sql, flags=re.IGNORECASE)
    con.execute(audited).fetchall()
    if not _AUDIT_MARGINS:
        return None
    m = min(_AUDIT_MARGINS)
    _AUDIT_MIN[name] = m
    return m


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--audit-floats"]
    audit = "--audit-floats" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from onnxocr_spark.pipeline import build_session

    spark = build_session("oracle-check", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            if len(sdf) == 0 and name != "ocr_metrics":
                failures.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(exc).__name__}: {exc}")
            continue
        a, b = _normalize(sdf), _normalize(odf)
        status = "OK   "
        if list(a.columns) != list(b.columns):
            status = "FAIL "
            print(f"{status}{name}: columns {list(a.columns)} vs {list(b.columns)}")
        elif len(a) != len(b):
            status = "FAIL "
            print(f"{status}{name}: rows {len(a)} vs {len(b)}")
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            status = "FAIL "
            print(f"{status}{name}: {int(neq.sum())}/{len(a)} rows differ")
            print(pd.concat([a[neq].head(3), b[neq].head(3)], keys=["spark", "duck"]))
        if status.startswith("FAIL"):
            failures.append(name)
        else:
            print(f"{status}{name}: {len(a)} rows match [{time.time()-t0:.1f}s]")
        if audit:
            try:
                m = _audit_round_margins(con, name, oracles[name])
            except Exception as exc:
                failures.append(name)
                print(f"FAIL  {name}: float audit error {exc}")
                continue
            if m is not None:
                tag = "ok" if m > 1e-6 else "DANGER"
                print(f"audit {name}: min .5-boundary margin "
                      f"{m:.3e} quanta [{tag}]")
                if m <= 1e-6:
                    failures.append(name)
    spark.stop()
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
