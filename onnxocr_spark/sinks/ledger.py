"""Checkpoint/resume sink (Iceberg-shaped, parquet-backed).

The reference's service layer tracks per-task status in an in-memory
dict (/root/reference/app/routers/v2.py:71-88); at 10^12-document scale
the analog is snapshot-based resume (SURVEY.md §7.1): every committed
batch appends (a) the output rows and (b) a tiny ledger partition of
committed doc_ids + run lineage/metrics. Restart = left_anti join of
the input against the ledger — the one true join in the system, and it
is an anti-join against a table ~6 orders of magnitude smaller than
the input.

With an Iceberg catalog the ledger folds into snapshot summary
properties; the parquet layout here keeps the same interface:

    {root}/data/…            output documents (append)
    {root}/ledger/run=…/…    committed doc_ids (append, one dir per run)
    {root}/metrics/run_….json  per-run lineage + counters
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def _ledger_path(root: str) -> str:
    return os.path.join(root, "ledger")


def write_with_ledger(
    out: DataFrame,
    root: str,
    run_id: str,
    source_path: str = "",
) -> dict:
    """Append output + commit ledger + metrics sidecar. Returns metrics."""
    data_path = os.path.join(root, "data")
    out.write.mode("append").parquet(data_path)

    spark = out.sparkSession
    done = spark.read.parquet(data_path).select("doc_id")
    ledger = done.withColumn("run_id", F.lit(run_id))
    ledger.write.mode("overwrite").parquet(_ledger_path(root))

    n_docs = done.count()
    metrics = {
        "run_id": run_id,
        "source_path": source_path,
        "committed_docs_total": n_docs,
        "wall_clock_unix": time.time(),
    }
    os.makedirs(os.path.join(root, "metrics"), exist_ok=True)
    with open(os.path.join(root, "metrics", f"run_{run_id}.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def committed_doc_ids(spark: SparkSession, root: str) -> DataFrame:
    """doc_ids already extracted (empty DF if no ledger yet)."""
    path = _ledger_path(root)
    try:
        return spark.read.parquet(path).select("doc_id").distinct()
    except Exception:
        return spark.createDataFrame([], "doc_id string")


def pending_documents(docs: DataFrame, root: str) -> DataFrame:
    """Resume filter: input documents not yet committed (left_anti)."""
    done = committed_doc_ids(docs.sparkSession, root)
    return docs.join(done, on="doc_id", how="left_anti")
