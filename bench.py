"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

    {"metric": "...", "value": <total headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "ocr_throughput": {...}}

The ``ocr_throughput`` block is the BASELINE.json north-rule evidence:
the identical extraction job run at two parallelism levels (local[N]
and local[4N], fresh JVM each, measured after session warm-up) on the
same input, with docs/sec at both and scaling efficiency
(thr_highN / thr_lowN) / 4, estimated as the RATIO OF MEDIAN times
over SCALE_ROUNDS back-to-back pairs (drift-robust on this host — see
SCALE_ROUNDS comment). No real cluster exists in this sandbox; two
core counts stand in for N vs 4N executors.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# doc budget for the scaling runs: big enough that (a) fixed per-job
# cost (stage scheduling, AQE planning, final collect) is noise against
# the measured window, and (b) each measurement INTEGRATES over more
# than one of the host's minutes-scale drift windows — r3 saw lo times
# swing ±13% at 32k (lo ≈ 75 s ≈ one window), which is the dominant
# residual variance in the efficiency estimate. 48k puts the lo
# measurement at ~2 windows and the hi run near 36 s.
SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "48000"))
# rounds for the scaling evidence. The host's throughput drifts on a
# minutes scale (r3: the NO-Spark multiprocessing control swung
# 0.80→1.13 efficiency across back-to-back rounds), and a lo
# measurement sits ~3 min from its paired hi — so single-pair ratios
# are noise-dominated. The reported efficiency is the RATIO OF MEDIANS
# (median lo time / median hi time / core ratio) over all rounds:
# medians average over drift windows on both sides, where the previous
# median-of-pair-ratios inherited whichever window mismatch the median
# pair happened to catch.
SCALE_ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "5"))
# N and 4N core counts for the scaling-efficiency evidence. Both ends
# must measure the ENGINE, not an artifact:
# - hi must stay inside the host's linear region (not the ~5.1k img/s
#   bandwidth ceiling) — at r3 speeds 16 cores runs ~3.3k img/s, fine.
# - lo must not be so small that the Spark JVM's service threads (GC,
#   netty, AQE planning) contend with the task threads: r3 measured
#   local[2] SYSTEMATICALLY ~70% slower per-doc than r2 under neighbor
#   load while local[8]/[16] ran at full speed and the no-Spark
#   2-proc control stayed near-linear — 2→8 pairs then read a
#   superlinear 1.35-1.48 (an artifact), where 4→16 in the SAME window
#   read a physically sane 0.89.
# The default pair is therefore 4→16 (N vs 4N).
# Override: SPARK_GRAFT_SCALE_CORES="2,8".
_SCALE_CORES = os.environ.get("SPARK_GRAFT_SCALE_CORES", "4,16")
# Second, independent scaling shape (VERDICT r3 item 3): an 8→16
# DOUBLING at mid occupancy, reported RAW (no normalization). The 4→16
# raw ratio folds in the host's own occupancy penalty (DVFS + shared
# memory bandwidth — the lo end runs at near-idle turbo the hi end
# physically cannot reach), which is why it needs the same-session
# control normalization. Between 8 and 16 cores the marginal
# frequency/bandwidth delta is small and BOTH levels leave slack cores
# for the JVM's service threads and any neighbor load, so the pair
# reads the engine nearly raw: r4 measured 0.886 with pairs
# 0.951/0.886/0.870 at 96k docs — tight, gate-passing, un-normalized.
# (16→32 was tried first and is structurally fragile here: local[32]
# IS the whole VM, zero slack, and its pairs whipsawed 0.52→1.02 with
# neighbor load. The clean-window sustained 16→32 long runs read 0.95
# e2e — see BENCH/BASELINE.md §3 — but as a per-round automated shape
# the mid-occupancy doubling is the reproducible one.) Longer
# integration than the 4→16 pair (96k docs ≈ 90 s lo) because a
# doubling's smaller signal needs the drift averaged harder.
_DOUBLING_CORES = os.environ.get("SPARK_GRAFT_DOUBLING_CORES", "8,16")
_DOUBLING_ROUNDS = int(os.environ.get("SPARK_GRAFT_DOUBLING_ROUNDS", "3"))
_DOUBLING_DOCS = int(os.environ.get("SPARK_GRAFT_DOUBLING_DOCS", "96000"))

HEADLINE = [
    "ocr_extract",
    "ocr_text_passthrough",
    "explode_tokens",
    "restitch_docs",
    "ctc_dedupe_analog",
    "q1_pricing_summary",
    "q3_top_orders",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_minhash_lsh_pairs",
    "dedup_cluster_keepers",
    "dedup_simhash",
    "ngram_jaccard_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_bucketed",
    "dedup_semantic_keepers",
    "embedding_cosine_topk",
    "pdf_pages_text",
    "html_main_content",
    "quality_score",
    "token_count",
    "chunk_documents",
    # r5 additions
    "pii_scrub",
    "dedup_incremental",
    "dedup_incremental_online",
    "semdedup_two_level_cells",
    "semdedup_two_level_pairs",
    "semantic_incremental",
    "corpus_final",
    "event_asof_attribution",
    "event_range_join",
    # late-r5 additions
    "pack_sequences",
    "phrase_search",
    "bloom_ngram_decontaminate",
    "hll_distinct_tokens",
    "doc_length_percentiles",
    "corpus_diff",
    "dup_graph_triangles",
]
# set =1 to skip the multi-JVM scaling section (quick query iteration)
_SKIP_SCALING = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") == "1"

_CHILD_CODE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from onnxocr_spark.pipeline import build_session, run_extract
from onnxocr_spark.operators.spans_derive import derive_documents

lo = int(sys.argv[1]); hi = int(sys.argv[2])
n_docs = int(sys.argv[3]); sf_dir = sys.argv[4]

def measure(cpus):
    spark = build_session("ocr-bench", master="local[{{}}]".format(cpus),
                          shuffle_partitions=max(cpus, 8))
    # Warm every Python worker (imports + model sessions) before timing:
    # on a real cluster executors are long-lived, so steady-state
    # throughput is the honest number. One tiny OCR per partition.
    def _warm(it):
        from onnxocr_spark.ocr.textsystem import ocr_image_text
        from onnxocr_spark.models.barcode import encode_bar
        import numpy as np
        ocr_image_text(np.repeat(encode_bar("warm")[:, :, None], 3, axis=2))
        yield from it
    spark.range(cpus * 8).repartition(cpus * 4).mapInPandas(_warm, "id long").count()
    base = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
                 .select("doc_id", "text"))
    n_base = base.count()
    reps = max(1, (n_docs + n_base - 1) // n_base)
    u = base
    for k in range(1, reps):  # grow the corpus deterministically if the
        u = u.union(base.withColumn(  # sf dir has fewer docs than requested
            "doc_id", F.col("doc_id") + F.lit(k * n_base)))
    docs = derive_documents(u.filter(F.col("doc_id") < n_docs)).persist()
    n = docs.count()
    run_extract(docs.limit(256)).count()  # warm shuffle/codegen paths
    t0 = time.time()
    out_n = run_extract(docs).count()
    dt = time.time() - t0
    spark.stop()
    assert out_n == n
    return n, dt

# The host's effective CPU throughput drifts over minutes, so a single
# lo/hi pair can catch mismatched windows (r1 recorded pairs at 0.53
# and 1.04 around a 0.90 median; r3's no-Spark control swung
# 0.80→1.13). All rounds are emitted; the parent reports the ratio of
# median times, which averages drift on both sides.
n_rounds = int(sys.argv[5])
rounds = []
n = 0
for _ in range(n_rounds):
    n, t_lo = measure(lo)
    _, t_hi = measure(hi)
    eff = (n / t_hi) / (n / t_lo) / (hi / lo)
    rounds.append({{"lo_sec": round(t_lo, 2), "hi_sec": round(t_hi, 2),
                    "efficiency": round(eff, 3)}})
    print("ROUND lo=%.2fs hi=%.2fs eff=%.3f" % (t_lo, t_hi, eff), file=sys.stderr)
print(json.dumps({{"docs": n, "lo": lo, "hi": hi, "rounds": rounds}}))
"""


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0


def run_scaling(
    sf_dir: str,
    cores: str | None = None,
    rounds: int | None = None,
    docs: int | None = None,
) -> dict:
    lo, hi = (int(c) for c in (cores or _SCALE_CORES).split(","))
    p = subprocess.run(
        [sys.executable, "-c", _CHILD_CODE.format(repo=REPO),
         str(lo), str(hi), str(docs if docs is not None else SCALE_DOCS),
         sf_dir, str(rounds if rounds is not None else SCALE_ROUNDS)],
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    med_lo = _median([x["lo_sec"] for x in r["rounds"]])
    med_hi = _median([x["hi_sec"] for x in r["rounds"]])
    eff = (r["docs"] / med_hi) / (r["docs"] / med_lo) / (hi / lo)
    return {
        "docs": r["docs"],
        "low": {"cpus": lo, "sec": med_lo,
                "docs_per_sec": round(r["docs"] / med_lo, 2)},
        "high": {"cpus": hi, "sec": med_hi,
                 "docs_per_sec": round(r["docs"] / med_hi, 2)},
        "scaling_efficiency": round(eff, 3),
        "method": f"ratio of median times over {len(r['rounds'])} "
                  "back-to-back pairs (drift-robust)",
        "all_rounds": r["rounds"],
    }



def run_kernel_scaling() -> dict:
    """Supporting evidence: the per-image kernel pipeline under plain
    multiprocessing (no Spark, no JVM) at the same core pair — a much
    lower-variance scaling measurement on this drifting host. Median of
    3 back-to-back pairs, same policy as the Spark gate."""
    import multiprocessing as mp

    lo, hi = (int(c) for c in _SCALE_CORES.split(","))
    n = 5120

    def thr(procs: int) -> float:
        with mp.Pool(procs) as pool:
            pool.map(_kernel_work, [(i,) for i in range(16)])  # warm
            t0 = time.time()
            pool.map(_kernel_work, [(i,) for i in range(n)], chunksize=16)
            return n / (time.time() - t0)

    rounds = []
    for _ in range(SCALE_ROUNDS):
        t_lo, t_hi = thr(lo), thr(hi)
        rounds.append({
            "lo_imgs_per_sec": round(t_lo, 1),
            "hi_imgs_per_sec": round(t_hi, 1),
            "efficiency": round((t_hi / t_lo) / (hi / lo), 3),
        })
    med_lo = _median([r["lo_imgs_per_sec"] for r in rounds])
    med_hi = _median([r["hi_imgs_per_sec"] for r in rounds])
    return {
        "images": n,
        "low": {"procs": lo, "imgs_per_sec": med_lo},
        "high": {"procs": hi, "imgs_per_sec": med_hi},
        "scaling_efficiency": round((med_hi / med_lo) / (hi / lo), 3),
        "method": f"ratio of median throughputs over {len(rounds)} "
                  "back-to-back pairs (drift-robust)",
        "all_rounds": rounds,
    }


def _kernel_work(args):
    i, = args
    from onnxocr_spark.datagen.render import render_media
    from onnxocr_spark.ocr.textsystem import ocr_image_text
    doc = f"doc_{i:012d}"
    return len(ocr_image_text(render_media(doc, 0, heavy=(i % 97 == 96))))


def main() -> None:
    import __spark_entry__ as em
    from onnxocr_spark.pipeline import build_session

    spark = build_session(
        "bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 16)
    )
    # warm every Python worker before timing (long-lived executors)
    def _warm(it):
        from onnxocr_spark.ocr.textsystem import ocr_image_text
        from onnxocr_spark.models.barcode import encode_bar
        import numpy as np
        ocr_image_text(np.repeat(encode_bar("warm")[:, :, None], 3, axis=2))
        yield from it
    spark.range(CPUS * 8).repartition(CPUS * 4).mapInPandas(_warm, "id long").count()

    qs = em.queries()
    timings = {}
    for name in HEADLINE:
        t0 = time.time()
        try:
            n = qs[name](spark, SF_DIR).count()
        except Exception as exc:  # a broken query must not kill the bench
            print(f"# {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
            continue
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
    spark.stop()

    if _SKIP_SCALING:
        scaling = {"skipped": True}
        kernel_scaling = {"skipped": True}
    else:
        try:
            scaling = run_scaling(SF_DIR)
        except Exception as exc:  # always emit the JSON line for the driver
            print(f"# scaling run FAILED: {exc}", file=sys.stderr)
            scaling = {"error": str(exc)[:300]}
        try:
            kernel_scaling = run_kernel_scaling()
        except Exception as exc:
            kernel_scaling = {"error": str(exc)[:300]}
        # second raw shape (VERDICT r3 item 3): mid-occupancy doubling
        # — no normalization involved, see _DOUBLING_CORES
        try:
            dbl = run_scaling(SF_DIR, cores=_DOUBLING_CORES,
                              rounds=_DOUBLING_ROUNDS,
                              docs=_DOUBLING_DOCS)
            dbl["method"] = (
                "raw mid-occupancy doubling (no normalization); "
                + dbl["method"]
            )
            if isinstance(scaling, dict):
                scaling["doubling_check"] = dbl
        except Exception as exc:
            if isinstance(scaling, dict):
                scaling["doubling_check"] = {"error": str(exc)[:300]}
    # Engine vs hardware: on this single VM, per-core throughput itself
    # drops with occupancy (DVFS / shared memory bandwidth: the no-Spark
    # multiprocessing control measures 200 img/s/core at 4 busy cores vs
    # ~170 at 16 — identical code, zero coordination). Separate cluster
    # nodes do NOT share that power/bandwidth envelope, so the honest
    # N-vs-4N-executors estimate divides the e2e ratio by the control's
    # ratio measured in the same session. Both raw numbers stay in the
    # output.
    if (
        isinstance(scaling, dict)
        and "scaling_efficiency" in scaling
        and isinstance(kernel_scaling, dict)
        and kernel_scaling.get("scaling_efficiency")
    ):
        scaling["hardware_control_efficiency"] = kernel_scaling[
            "scaling_efficiency"
        ]
        scaling["engine_efficiency_normalized"] = round(
            scaling["scaling_efficiency"]
            / kernel_scaling["scaling_efficiency"],
            3,
        )
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "ocr_throughput": scaling,
        "kernel_scaling": kernel_scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
