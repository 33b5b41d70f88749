"""Checkpoint/resume sink (Iceberg-shaped, parquet-backed).

The reference's service layer tracks per-task status in an in-memory
dict (/root/reference/app/routers/v2.py:71-88); at 10^12-document scale
the analog is snapshot-based resume (SURVEY.md §7.1): every committed
run appends (a) the output rows under its own run subdirectory and
(b) a ledger partition containing ONLY that run's doc_ids + lineage.
Restart = left_anti join of the input against the ledger — the one true
join in the system, against a table ~6 orders of magnitude narrower
than the input. Commits are O(run), never O(total): nothing existing is
rewritten, so a commit for run k costs the same at the first and the
millionth run.

With an Iceberg catalog the ledger folds into snapshot summary
properties; the parquet layout keeps the same interface:

    {root}/data/run=<run_id>/…    output documents (one dir per run)
    {root}/ledger/run=<run_id>/…  committed doc_ids for that run
    {root}/metrics/run_<id>.json  per-run lineage + counters
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def _data_path(root: str) -> str:
    return os.path.join(root, "data")


def _ledger_path(root: str) -> str:
    return os.path.join(root, "ledger")


def write_with_ledger(
    out: DataFrame,
    root: str,
    run_id: str,
    source_path: str = "",
) -> dict:
    """Append one run's output + its ledger partition + a metrics
    sidecar. Returns the metrics dict."""
    spark = out.sparkSession
    run_dir = os.path.join(_data_path(root), f"run={run_id}")
    out.write.mode("error").parquet(run_dir)

    # ledger entry derived from what actually landed on disk (idempotent
    # wrt speculative tasks), appended — never rewritten
    landed = spark.read.parquet(run_dir)
    ledger_dir = os.path.join(_ledger_path(root), f"run={run_id}")
    landed.select("doc_id").distinct().write.mode("error").parquet(ledger_dir)

    n_docs = landed.count()
    n_spans, n_media, n_empty_media = (
        landed.select(F.explode("spans").alias("s"))
        .agg(
            F.count("*"),
            F.sum(F.when(F.col("s.kind") == "media", 1).otherwise(0)),
            F.sum(
                F.when(
                    (F.col("s.kind") == "media") & (F.col("s.text") == ""), 1
                ).otherwise(0)
            ),
        )
        .first()
    )
    metrics = {
        "run_id": run_id,
        "source_path": source_path,
        "docs": n_docs,
        "spans": int(n_spans or 0),
        "media_spans": int(n_media or 0),
        "empty_media_spans": int(n_empty_media or 0),
        "wall_clock_unix": time.time(),
    }
    os.makedirs(os.path.join(root, "metrics"), exist_ok=True)
    with open(os.path.join(root, "metrics", f"run_{run_id}.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def read_output(spark: SparkSession, root: str) -> DataFrame:
    """All committed output rows across runs."""
    return spark.read.option("recursiveFileLookup", "true").parquet(
        _data_path(root)
    )


def committed_doc_ids(spark: SparkSession, root: str) -> DataFrame:
    """doc_ids already extracted (empty DF if no ledger yet)."""
    try:
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(_ledger_path(root))
            .select("doc_id")
            .distinct()
        )
    except Exception:
        return spark.createDataFrame([], "doc_id string")


def pending_documents(docs: DataFrame, root: str) -> DataFrame:
    """Resume filter: input documents not yet committed (left_anti)."""
    done = committed_doc_ids(docs.sparkSession, root)
    return docs.join(done, on="doc_id", how="left_anti")
