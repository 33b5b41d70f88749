"""Optimization-round measurement harness (guide §1). NOT the frozen
bench.py — this file exists so the round can iterate on per-query
timings, Spark job counts, and plan captures without touching the
driver's measured bench.

Usage:
    python bench_extra.py [query ...]        # default: full HEADLINE list
Env:
    SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS    # same contract as bench.py
    BENCH_EXTRA_REPS=2                       # timed reps per query
    BENCH_EXTRA_PLANS=plans/r06              # capture explain() here ('' = off)
    BENCH_EXTRA_SUFFIX=_before               # plan file suffix

Methodology matches bench.py: one warm session at local[$CPUS],
queries timed via .count() in HEADLINE order.  Extra per query:
  - n_jobs: Spark jobs launched (statusTracker job-group diff) — the
    fixed-latency proxy that dominates small-SF wall time
  - reps: every timed repetition (first = bench-comparable cold call)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))
PLAN_DIR = os.environ.get("BENCH_EXTRA_PLANS", "")
SUFFIX = os.environ.get("BENCH_EXTRA_SUFFIX", "_before")

from bench import HEADLINE  # single source for the query list


def main() -> None:
    import __spark_entry__ as em
    from onnxocr_spark.pipeline import build_session

    names = sys.argv[1:] or HEADLINE
    spark = build_session(
        "bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )

    def _warm(it):
        from onnxocr_spark.ocr.textsystem import ocr_image_text
        from onnxocr_spark.models.barcode import encode_bar
        import numpy as np
        ocr_image_text(np.repeat(encode_bar("warm")[:, :, None], 3, axis=2))
        yield from it
    spark.range(CPUS * 8).repartition(CPUS * 4).mapInPandas(_warm, "id long").count()

    if PLAN_DIR:
        os.makedirs(os.path.join(REPO, PLAN_DIR), exist_ok=True)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = em.queries()
    out = {}
    for name in names:
        reps = []
        n_jobs = -1
        for rep in range(REPS):
            group = f"bx-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            try:
                n = qs[name](spark, SF_DIR).count()
            except Exception as exc:
                print(f"# {name} FAILED: {exc}", file=sys.stderr)
                reps.append(-1.0)
                break
            dt = round(time.time() - t0, 3)
            reps.append(dt)
            if rep == 0:
                n_jobs = len(tracker.getJobIdsForGroup(group))
                print(f"# {name}: {n} rows in {dt}s ({n_jobs} jobs)",
                      file=sys.stderr)
            sc.setJobGroup("bx-idle", "idle")
        out[name] = {"reps": reps, "n_jobs": n_jobs}
        if PLAN_DIR:
            try:
                import contextlib, io
                df = qs[name](spark, SF_DIR)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(REPO, PLAN_DIR, f"{name}{SUFFIX}.txt"),
                          "w") as f:
                    f.write(buf.getvalue())
            except Exception as exc:
                print(f"# plan capture {name} failed: {exc}", file=sys.stderr)
    total_first = round(sum(v["reps"][0] for v in out.values()
                            if v["reps"]), 3)
    print(json.dumps({"metric": "bench_extra_first_rep_total_sec",
                      "value": total_first, "queries": out, "sf": SF_DIR,
                      "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
