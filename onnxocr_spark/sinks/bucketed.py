"""Bucketed band-signature index: the storage-partitioned-join analog.

The incremental dedup resume (jobs/dedup_job.py --resume) equi-joins the
new batch's band rows against the accumulated sigindex on
(band, band_sig). Read as plain parquet that join shuffles BOTH sides —
and at 100 TB the index side is the corpus-sized one: a daily 1% ingest
pays a full-index shuffle every day. The round-5 PLANS.md §7 note named
the fix — with an Iceberg catalog the sigindex becomes a
bucket-partitioned table and a storage-partitioned join moves only the
new batch. No Iceberg jar ships in this environment, but Spark's native
bucketed tables give the identical physical property: a table written
with ``bucketBy(N, "band", "band_sig")`` reports
``HashPartitioning(band, band_sig, N)`` straight from the scan, so the
sort-merge join on those keys adds NO Exchange on the index side — only
the (small) new-batch side shuffles, into N partitions matching the
buckets. Spark's bucket id is ``pmod(murmur3(cols), N)`` — the same
hash ``repartition(N, cols)`` uses — so the pre-write repartition below
aligns tasks with buckets and each bucket lands in one file.

Lifecycle (mirrors the compaction discipline in sinks/ledger.py):

- ``bucketize_sigindex`` is a MAINTENANCE pass (jobs/compact_job.py
  --bucket-index, or standalone): it folds every committed
  ``sigindex/run=*`` dir into one bucketed table under
  ``{root}/sigindex_bucketed/`` using the same decision-preserving
  global re-aggregation compaction applies (one (band, band_sig) row,
  min hub — an index MATCH retires a new doc regardless of which
  processed doc the hub names). The coverage marker ``_COVERS.json`` is
  written LAST: a crash mid-write leaves no marker, so readers fall
  back to the parquet dirs and never see a partial table.
- ``load_sigindex_parts`` is what --resume reads: the bucketed table
  for every run the marker covers, PLUS the raw parquet dirs of any
  runs committed after the last bucketize (the small daily delta — it
  joins broadcast/shuffled, which is fine at delta size). Rows may
  repeat across parts; every consumer of the index is duplicate-
  tolerant by contract (bool_and absorption, parallel CC hub edges),
  so overlap is harmless and a gap is impossible: a run is either
  covered by the marker or still has its parquet dir. If the marker
  covers runs that are no longer committed (the compactor renamed them
  into a consolidated run), the table is STALE and is ignored entirely
  — correctness first, re-bucketize to get the acceleration back.

The run dirs stay the source of truth; the table is a derived
accelerator that can be dropped and rebuilt at any time. Single-writer
per root, like compaction.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

BUCKET_COLS = ("band", "band_sig")
_LAYOUT = "sigindex_bucketed"


def sigindex_table_name(root: str) -> str:
    """Deterministic per-root session-catalog table name (twin roots in
    one test session must not collide)."""
    digest = hashlib.md5(os.path.abspath(root).encode()).hexdigest()[:12]
    return f"sigindex_{digest}"


def _marker_path(root: str) -> str:
    return os.path.join(os.path.abspath(root), _LAYOUT, "_COVERS.json")


def _data_path(root: str) -> str:
    # absolute: a relative ``path`` option would resolve against the
    # warehouse dir, landing the bucket files away from the root
    return os.path.join(os.path.abspath(root), _LAYOUT, "data")


def committed_sigindex_dirs(root: str) -> list[str]:
    """_SUCCESS-complete sigindex run dirs (the dedup job's commit
    marker — same rule jobs/dedup_job.py applies)."""
    return sorted(
        d
        for d in glob.glob(os.path.join(root, "sigindex", "run=*"))
        if os.path.exists(os.path.join(d, "_SUCCESS"))
    )


def bucketize_sigindex(
    spark: SparkSession, root: str, n_buckets: int = 64
) -> dict:
    """Fold all committed sigindex run dirs into one bucketed table.

    Steps (crash window analysis in the module docstring): drop any
    previous table + data, write the re-aggregated index bucketed by
    (band, band_sig), then publish the coverage marker last."""
    sig_dirs = committed_sigindex_dirs(root)
    if not sig_dirs:
        raise ValueError(f"no committed sigindex runs under {root}")
    table = sigindex_table_name(root)
    data_path = _data_path(root)

    marker = _marker_path(root)
    if os.path.exists(marker):
        os.remove(marker)  # old coverage is void the moment we rebuild
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if os.path.isdir(data_path):
        shutil.rmtree(data_path)

    index = (
        spark.read.parquet(*sig_dirs)
        .groupBy(*BUCKET_COLS)
        .agg(F.min("hub").alias("hub"))
    )
    (
        index.repartition(n_buckets, *[F.col(c) for c in BUCKET_COLS])
        .write.format("parquet")
        .bucketBy(n_buckets, *BUCKET_COLS)
        .sortBy(*BUCKET_COLS)
        .option("path", data_path)
        .mode("overwrite")
        .saveAsTable(table)
    )
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.table(table).schema.fields
    )
    cover = {
        "table": table,
        "buckets": n_buckets,
        "runs": sorted(os.path.basename(d) for d in sig_dirs),
        "schema_ddl": schema_ddl,
    }
    # processed-ids twin table (covered by the SAME marker, so both
    # tables commit atomically): the resume's already-processed skip is
    # an anti-join of the new batch against every committed ledger ∪
    # retired id — at corpus scale that id set's distinct + anti-join
    # shuffle is the other daily corpus-sized movement. Pre-distincted
    # and bucketed by doc_id it anti-joins shuffle-free.
    run_names = {os.path.basename(d)[len("run="):] for d in sig_dirs}
    pid_dirs = [
        d
        for layout in ("ledger", "retired")
        for d in glob.glob(os.path.join(root, layout, "run=*"))
        if os.path.basename(d)[len("run="):] in run_names
        and os.path.exists(os.path.join(d, "_SUCCESS"))
    ]
    if pid_dirs:
        cover.update(
            _write_procids_table(spark, root, pid_dirs, "doc_id", n_buckets)
        )
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cover, f)
    os.replace(tmp, marker)  # commit point
    return cover


def _procids_table_name(root: str) -> str:
    digest = hashlib.md5(os.path.abspath(root).encode()).hexdigest()[:12]
    return f"procids_{digest}"


def _procids_data_path(root: str) -> str:
    return os.path.join(os.path.abspath(root), "procids_bucketed", "data")


def _write_procids_table(
    spark: SparkSession,
    root: str,
    id_dirs: list[str],
    id_col: str,
    n_buckets: int,
) -> dict:
    """(re)build the processed-ids table; returns the marker fields."""
    table = _procids_table_name(root)
    data_path = _procids_data_path(root)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if os.path.isdir(data_path):
        shutil.rmtree(data_path)
    ids = spark.read.parquet(*id_dirs).select(id_col).distinct()
    (
        ids.repartition(n_buckets, F.col(id_col))
        .write.format("parquet")
        .bucketBy(n_buckets, id_col)
        .sortBy(id_col)
        .option("path", data_path)
        .mode("overwrite")
        .saveAsTable(table)
    )
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.table(table).schema.fields
    )
    return {
        "procids_table": table,
        "procids_schema_ddl": ddl,
        "procids_id_col": id_col,
    }


def _ensure_procids_registered(
    spark: SparkSession, root: str, cover: dict
) -> bool:
    data_path = _procids_data_path(root)
    if "procids_table" not in cover or not os.path.isdir(data_path):
        return False
    table = cover["procids_table"]
    if not spark.catalog.tableExists(table):
        col = cover["procids_id_col"]
        spark.sql(
            f"CREATE TABLE {table} ({cover['procids_schema_ddl']}) "
            f"USING PARQUET CLUSTERED BY ({col}) SORTED BY ({col}) "
            f"INTO {cover['buckets']} BUCKETS LOCATION '{data_path}'"
        )
    return True


def load_processed_parts(
    spark: SparkSession,
    root: str,
    kind: str,
    plain_dirs: list[str],
    committed_runs: set[str],
    delta_dirs_of,
) -> list[DataFrame]:
    """Processed-id parts for the already-committed skip: the bucketed
    procids table (when the root's coverage marker is valid and carries
    one) plus the plain id dirs of runs committed after the bucketize;
    else one plain part. ``delta_dirs_of(uncovered_run_names)`` maps
    uncovered run names to their id dirs. Consumers chain LEFT ANTI
    joins over the parts (set difference against the union — exact,
    order-independent), which keeps the bucketed part's scan
    exchange-free and never needs a distinct: anti-join semantics
    ignore duplicate build-side rows. ``kind`` picks which layout's
    coverage marker governs: 'sigindex' (text roots) or 'semvec'
    (semantic roots) or 'extract' (extraction roots, standalone
    marker)."""
    marker_file = {
        "sigindex": _marker_path,
        "semvec": _vec_marker_path,
        "extract": _extract_marker_path,
    }[kind](root)
    cover = None
    if os.path.exists(marker_file):
        try:
            with open(marker_file) as f:
                cover = json.load(f)
        except (OSError, ValueError):
            cover = None
    if cover is not None:
        covered = {r[len("run="):] if r.startswith("run=") else r
                   for r in cover.get("runs", [])}
        if (
            covered
            and covered <= committed_runs
            and _ensure_procids_registered(spark, root, cover)
        ):
            parts = [spark.table(cover["procids_table"])]
            uncovered = sorted(committed_runs - covered)
            if uncovered:
                delta = delta_dirs_of(uncovered)
                if delta:
                    parts.append(spark.read.parquet(*delta))
            return parts
    return [spark.read.parquet(*plain_dirs)]


def _ensure_registered(spark: SparkSession, root: str, cover: dict) -> bool:
    """Re-register the external bucketed table in THIS session's
    catalog (the default in-memory catalog does not survive restarts;
    the parquet bucket files + marker do). Returns False if the data
    dir is gone — caller falls back to the run dirs."""
    data_path = _data_path(root)
    if not os.path.isdir(data_path):
        return False
    table = cover["table"]
    if not spark.catalog.tableExists(table):
        cols = ", ".join(BUCKET_COLS)
        spark.sql(
            f"CREATE TABLE {table} ({cover['schema_ddl']}) USING PARQUET "
            f"CLUSTERED BY ({cols}) SORTED BY ({cols}) "
            f"INTO {cover['buckets']} BUCKETS "
            f"LOCATION '{data_path}'"
        )
    return True


def load_sigindex_parts(
    spark: SparkSession, root: str, sig_dirs: list[str] | None = None
) -> list[DataFrame]:
    """The index a --resume run joins against, as one or two parts:
    [bucketed table (+ parquet delta of uncovered runs)] when a valid
    coverage marker exists, else [union of the raw parquet run dirs].
    Parts must be JOINED SEPARATELY by the consumer (a union of a
    bucketed and an unbucketed frame forfeits the scan's output
    partitioning and re-shuffles everything — the thing this module
    exists to avoid)."""
    if sig_dirs is None:
        sig_dirs = committed_sigindex_dirs(root)
    if not sig_dirs:
        raise ValueError(f"no committed sigindex runs under {root}")
    committed = {os.path.basename(d) for d in sig_dirs}

    marker = _marker_path(root)
    cover = None
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                cover = json.load(f)
        except (OSError, ValueError):
            cover = None
    if cover is not None:
        covered = set(cover.get("runs", []))
        if (
            covered
            and covered <= committed
            and _ensure_registered(spark, root, cover)
        ):
            parts = [spark.table(cover["table"])]
            uncovered = sorted(committed - covered)
            if uncovered:
                parts.append(
                    spark.read.parquet(
                        *[
                            os.path.join(root, "sigindex", r)
                            for r in uncovered
                        ]
                    )
                )
            return parts
        # covered ⊄ committed: the compactor renamed runs out from
        # under the table (or the marker is empty) — stale, ignore it

    return [spark.read.parquet(*sig_dirs)]


# ---------------------------------------------------------------------------
# Semantic twin: bucketed committed-vector layout for the SemDeDup resume.
#
# jobs/semantic_dedup_job.py --resume re-reads ALL committed vectors
# (kept + retired) every run — the linear read is inherent to cosine
# comparison — but the bipartite pair scan then SHUFFLES them on
# (cell, gb) every run, which at corpus scale is the expensive part of
# the movement. Persisting the committed vectors bucketed by
# (cell, gb) — gb precomputed at a fixed tile count g recorded in the
# marker — lets the cogrouped scan
# (similarity.cosine_pairs_bipartite_cogrouped) read them already
# partitioned: zero committed-side Exchange, only the new batch moves.
# The gb split is pure tiling (any g yields the identical pair set), so
# the accelerator is decision-invariant like the sigindex table above.
# ---------------------------------------------------------------------------

VEC_BUCKET_COLS = ("cell", "gb")
_VEC_LAYOUT = "vectors_bucketed"


def semvector_table_name(root: str) -> str:
    digest = hashlib.md5(os.path.abspath(root).encode()).hexdigest()[:12]
    return f"semvec_{digest}"


def _vec_marker_path(root: str) -> str:
    return os.path.join(os.path.abspath(root), _VEC_LAYOUT, "_COVERS.json")


def _vec_data_path(root: str) -> str:
    return os.path.join(os.path.abspath(root), _VEC_LAYOUT, "data")


def committed_semantic_runs(root: str) -> list[str]:
    """Run ids whose ledger dir (the semantic job's commit marker)
    landed _SUCCESS-complete."""
    return sorted(
        os.path.basename(d)[len("run="):]
        for d in glob.glob(os.path.join(root, "ledger", "run=*"))
        if os.path.exists(os.path.join(d, "_SUCCESS"))
    )


def _vec_dirs(root: str, run_ids: list[str]) -> list[str]:
    dirs = []
    for layout in ("data", "retired"):
        for r in run_ids:
            d = os.path.join(root, layout, f"run={r}")
            if os.path.isdir(d):
                dirs.append(d)
    return dirs


def bucketize_semvectors(
    spark: SparkSession,
    root: str,
    n_buckets: int = 64,
    block_rows: int = 1024,
) -> dict:
    """Fold the committed (vec_id, embedding, cell) rows of a semantic
    dedup root into one (cell, gb, vid, vec) table bucketed by
    (cell, gb). The tile count g = ceil(n / (block_rows · C)) is fixed
    at bucketize time and recorded in the marker — resumes MUST reuse
    it (the loader hands it back) so gb assignment matches the bucket
    files."""
    run_ids = committed_semantic_runs(root)
    if not run_ids:
        raise ValueError(f"no committed semantic runs under {root}")
    vec_dirs = _vec_dirs(root, run_ids)
    idx_dirs = [
        d for d in glob.glob(os.path.join(root, "cellindex", "run=*"))
        if os.path.basename(d)[len("run="):] in set(run_ids)
    ]
    if not vec_dirs or not idx_dirs:
        raise ValueError(f"{root} does not look like a semantic dedup root")
    n_cells = (
        spark.read.parquet(*idx_dirs).dropDuplicates(["seed_id"]).count()
    )
    cells = spark.read.parquet(*vec_dirs)
    n = cells.count()
    g = max(1, -(-n // (block_rows * max(1, n_cells))))

    table = semvector_table_name(root)
    marker = _vec_marker_path(root)
    data_path = _vec_data_path(root)
    if os.path.exists(marker):
        os.remove(marker)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if os.path.isdir(data_path):
        shutil.rmtree(data_path)

    pre = cells.select(
        F.col("cell"),
        F.pmod(F.col("vec_id"), F.lit(g)).cast("int").alias("gb"),
        F.col("vec_id").alias("vid"),
        F.col("embedding").alias("vec"),
    )
    (
        pre.repartition(n_buckets, *[F.col(c) for c in VEC_BUCKET_COLS])
        .write.format("parquet")
        .bucketBy(n_buckets, *VEC_BUCKET_COLS)
        .sortBy(*VEC_BUCKET_COLS)
        .option("path", data_path)
        .mode("overwrite")
        .saveAsTable(table)
    )
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.table(table).schema.fields
    )
    cover = {
        "table": table,
        "buckets": n_buckets,
        "g": g,
        "runs": run_ids,
        "schema_ddl": schema_ddl,
    }
    # processed-ids twin: the semantic ledger already holds each run's
    # kept ∪ retired ids pre-distincted, so it is the procids source
    pid_dirs = [
        os.path.join(root, "ledger", f"run={r}")
        for r in run_ids
        if os.path.isdir(os.path.join(root, "ledger", f"run={r}"))
    ]
    if pid_dirs:
        cover.update(
            _write_procids_table(spark, root, pid_dirs, "vec_id", n_buckets)
        )
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cover, f)
    os.replace(tmp, marker)  # commit point
    return cover


def load_semvector_parts(
    spark: SparkSession, root: str, run_ids: list[str] | None = None
) -> list:
    """Committed-vector parts for a semantic --resume, in the format
    ``incremental_semantic_decisions`` consumes: a ``(DataFrame, g)``
    tuple for the bucketed (cell, gb, vid, vec) table plus a plain
    (vec_id, embedding, cell) DataFrame for any runs committed after
    the last bucketize; or a single plain part when no valid marker
    exists. Same staleness/fallback rules as the sigindex loader."""
    if run_ids is None:
        run_ids = committed_semantic_runs(root)
    if not run_ids:
        raise ValueError(f"no committed semantic runs under {root}")
    committed = set(run_ids)

    marker = _vec_marker_path(root)
    cover = None
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                cover = json.load(f)
        except (OSError, ValueError):
            cover = None
    if cover is not None:
        covered = set(cover.get("runs", []))
        data_path = _vec_data_path(root)
        ok = covered and covered <= committed and os.path.isdir(data_path)
        if ok:
            table = cover["table"]
            if not spark.catalog.tableExists(table):
                cols = ", ".join(VEC_BUCKET_COLS)
                spark.sql(
                    f"CREATE TABLE {table} ({cover['schema_ddl']}) "
                    f"USING PARQUET CLUSTERED BY ({cols}) "
                    f"SORTED BY ({cols}) INTO {cover['buckets']} BUCKETS "
                    f"LOCATION '{data_path}'"
                )
            parts: list = [(spark.table(table), int(cover["g"]))]
            uncovered = sorted(committed - covered)
            if uncovered:
                parts.append(
                    spark.read.parquet(*_vec_dirs(root, uncovered))
                )
            return parts

    return [spark.read.parquet(*_vec_dirs(root, sorted(committed)))]


def _extract_marker_path(root: str) -> str:
    return os.path.join(
        os.path.abspath(root), "procids_bucketed", "_COVERS.json"
    )


def bucketize_extraction_ids(
    spark: SparkSession, root: str, n_buckets: int = 64
) -> dict:
    """Processed-ids table for an EXTRACTION root (jobs/extract_job.py):
    only the ids — there is no cross-run index to bucket, but the
    resume's anti-join against every committed ledger id is the same
    daily corpus-sized movement the dedup roots had. Covers LEDGERED
    runs only; orphan data dirs (crashed between data and ledger
    writes) keep flowing through `committed_doc_id_parts`' plain
    orphan union, so the crash-consistency contract is untouched.
    Standalone marker (these roots have no index marker to share)."""
    led_dirs = sorted(
        d
        for d in glob.glob(os.path.join(root, "ledger", "run=*"))
        if os.path.exists(os.path.join(d, "_SUCCESS"))
    )
    if not led_dirs:
        raise ValueError(f"no committed ledger runs under {root}")
    marker = _extract_marker_path(root)
    if os.path.exists(marker):
        os.remove(marker)  # void old coverage before the rebuild
    cover = {
        "buckets": n_buckets,
        "runs": sorted(os.path.basename(d)[len("run="):]
                       for d in led_dirs),
    }
    cover.update(
        _write_procids_table(spark, root, led_dirs, "doc_id", n_buckets)
    )
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cover, f)
    os.replace(tmp, marker)  # commit point
    return cover


def bucketize_root(spark: SparkSession, root: str, n_buckets: int = 64) -> dict:
    """Dispatch for jobs/compact_job.py --bucket-index: a text-dedup
    root (sigindex/ layout) gets the band-signature table, a semantic
    root (cellindex/ layout) the committed-vector table, a plain
    extraction root (ledger/ only) the processed-ids table."""
    if glob.glob(os.path.join(root, "sigindex", "run=*")):
        return bucketize_sigindex(spark, root, n_buckets)
    if glob.glob(os.path.join(root, "cellindex", "run=*")):
        return bucketize_semvectors(spark, root, n_buckets)
    if glob.glob(os.path.join(root, "ledger", "run=*")):
        return bucketize_extraction_ids(spark, root, n_buckets)
    raise ValueError(
        f"{root} has no sigindex/, cellindex/ or ledger/ layout to bucketize"
    )
