"""End-product corpus build job (jobs/corpus_build_job.py): composed
dedup + quality gate + PII scrub under the shared run-dir layout, with
incremental resume and the twin-root full-vs-incremental equivalence."""

import json
import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "jobs"),
)

BATCH1 = [
    (0, "alpha beta gamma delta epsilon zeta"),       # kept
    (1, "alpha beta gamma delta epsilon zeta"),       # dup of 0
    (2, "short one"),                                 # quality (<5 toks)
    (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),            # quality (>8 toks)
    (4, "contact me at bob@example.com now please ok"),  # kept, scrubbed
]
BATCH2 = [
    (0, "alpha beta gamma delta epsilon zeta"),       # resubmitted -> skip
    (5, "alpha beta gamma delta epsilon zeta"),       # cross-batch dup of 0
    (6, "eta theta iota kappa lam mu"),               # fresh, kept
    (7, "tiny"),                                      # quality
]
QUALITY = ["--min-tokens", "5", "--max-tokens", "8"]


def _write_batch(spark, tmp_path, name, rows):
    path = str(tmp_path / name)
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").write.mode(
        "overwrite"
    ).parquet(path)
    return path


def _run(args):
    import corpus_build_job

    assert corpus_build_job.main(args) == 0


def _kept(spark, root, run=None):
    pat = os.path.join(root, "data", f"run={run}" if run else "run=*")
    return {
        r.doc_id: r.text for r in spark.read.parquet(pat).collect()
    }


def _retired(spark, root, run=None):
    pat = os.path.join(root, "retired", f"run={run}" if run else "run=*")
    return {r.doc_id: r.reason for r in spark.read.parquet(pat).collect()}


@pytest.fixture()
def roots(spark, tmp_path):
    b1 = _write_batch(spark, tmp_path, "b1", BATCH1)
    b2 = _write_batch(spark, tmp_path, "b2", BATCH2)
    ball = _write_batch(spark, tmp_path, "ball", BATCH1 + BATCH2[1:])
    return b1, b2, ball, str(tmp_path / "root"), str(tmp_path / "root2")


def test_initial_run_composition(spark, roots):
    b1, _, _, root, _ = roots
    _run(["--input", b1, "--output", root, "--policy", "cc",
          "--run-id", "a"] + QUALITY)
    kept = _kept(spark, root, "a")
    assert set(kept) == {0, 4}
    # PII scrubbed in the OUTPUT text only
    assert "<EMAIL>" in kept[4] and "bob@example.com" not in kept[4]
    assert kept[0] == "alpha beta gamma delta epsilon zeta"  # no-op scrub
    retired = _retired(spark, root, "a")
    assert retired == {1: "dup", 2: "quality", 3: "quality"}
    side = os.path.join(root, "metrics", "_sidecars", "run_a.json")
    m = json.load(open(side))
    assert (m["docs_in"], m["docs_kept"], m["retired_dup"],
            m["retired_quality"]) == (5, 2, 1, 2)


def test_resume_decides_against_sigindex_and_skips_committed(spark, roots):
    b1, b2, _, root, _ = roots
    _run(["--input", b1, "--output", root, "--policy", "cc",
          "--run-id", "a"] + QUALITY)
    _run(["--input", b2, "--output", root, "--policy", "cc",
          "--run-id", "b", "--resume"] + QUALITY)
    kept_b = _kept(spark, root, "b")
    retired_b = _retired(spark, root, "b")
    assert set(kept_b) == {6}
    assert retired_b == {5: "dup", 7: "quality"}
    m = json.load(
        open(os.path.join(root, "metrics", "_sidecars", "run_b.json"))
    )
    assert m["docs_in"] == 3  # doc 0 skipped as already committed
    # resubmitting batch2 wholesale is a no-op for decided docs
    _run(["--input", b2, "--output", root, "--policy", "cc",
          "--run-id", "c", "--resume"] + QUALITY)
    assert _kept(spark, root, "c") == {}
    assert _retired(spark, root, "c") == {}


def test_twin_root_full_equals_incremental(spark, roots):
    b1, b2, ball, root, root2 = roots
    _run(["--input", b1, "--output", root, "--policy", "cc",
          "--run-id", "a"] + QUALITY)
    _run(["--input", b2, "--output", root, "--policy", "cc",
          "--run-id", "b", "--resume"] + QUALITY)
    _run(["--input", ball, "--output", root2, "--policy", "cc",
          "--run-id", "full"] + QUALITY)
    assert _kept(spark, root) == _kept(spark, root2)
    assert _retired(spark, root) == _retired(spark, root2)


def test_no_scrub_flag(spark, roots):
    b1, _, _, _, root2 = roots
    _run(["--input", b1, "--output", root2, "--policy", "cc",
          "--run-id", "raw", "--no-scrub"] + QUALITY)
    kept = _kept(spark, root2, "raw")
    assert "bob@example.com" in kept[4]


def test_streaming_sink_matches_sequential_resumes(spark, tmp_path, roots):
    """The foreachBatch corpus-build sink commits the SAME cumulative
    kept/retired state as sequential --resume runs fed the same
    batches on a twin root; a restart replay of a committed
    micro-batch is skipped whole (exactly-once)."""
    import pandas as pd

    import corpus_build_job

    b1, _, _, root, root2 = roots
    # founding run on both roots
    for r in (root, root2):
        _run(["--input", b1, "--output", r, "--policy", "cc",
              "--run-id", "a"] + QUALITY)

    # stage batch2 as one file per micro-batch, mtime-ordered
    sdir = str(tmp_path / "stream_src")
    os.makedirs(sdir)
    halves = (BATCH2[:2], BATCH2[2:])
    for i, rows in enumerate(halves):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            f"{sdir}/part-{i}.parquet"
        )
        os.utime(f"{sdir}/part-{i}.parquet", (1000 * (i + 1),) * 2)

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(sdir)
    )
    q = (
        stream.writeStream
        .foreachBatch(corpus_build_job.streaming_corpus_build_sink(
            root, policy="cc", min_tokens=5, max_tokens=8))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # batch twin: sequential --resume runs over the same halves
    for i, rows in enumerate(halves):
        src = _write_batch(spark, tmp_path, f"half{i}", rows)
        _run(["--input", src, "--output", root2, "--policy", "cc",
              "--run-id", f"r{i}", "--resume"] + QUALITY)

    assert _kept(spark, root) == _kept(spark, root2)
    assert _retired(spark, root) == _retired(spark, root2)

    # exactly-once: replaying a committed micro-batch is a no-op
    before = _kept(spark, root)
    bdf = spark.createDataFrame(halves[0], "doc_id BIGINT, text STRING")
    corpus_build_job.streaming_corpus_build_sink(
        root, policy="cc", min_tokens=5, max_tokens=8)(bdf, 0)
    assert _kept(spark, root) == before


@pytest.mark.parametrize("policy", ["online", "exact"])
def test_resume_other_policies(spark, roots, policy):
    """The composition is policy-agnostic: online (greedy band
    first-wins) and exact (prefix-fingerprint) resumes retire the
    cross-batch duplicate and honor the quality gate identically on
    this fixture."""
    b1, b2, _, root, _ = roots
    root = f"{root}_{policy}"
    _run(["--input", b1, "--output", root, "--policy", policy,
          "--run-id", "a"] + QUALITY)
    _run(["--input", b2, "--output", root, "--policy", policy,
          "--run-id", "b", "--resume"] + QUALITY)
    assert set(_kept(spark, root, "b")) == {6}
    assert _retired(spark, root, "b") == {5: "dup", 7: "quality"}


def test_compaction_preserves_reasons_and_resume(spark, roots):
    """compact_runs on a corpus-build root: the consolidated retired
    manifest keeps the reason column, and a post-compaction resume
    decides identically to an uncompacted twin root."""
    from onnxocr_spark.sinks import compact_runs

    b1, b2, _, root, root2 = roots
    for r in (root, root2):
        _run(["--input", b1, "--output", r, "--policy", "cc",
              "--run-id", "a"] + QUALITY)
    compact_runs(spark, root, compacted_id="cpt")
    assert _retired(spark, root) == {1: "dup", 2: "quality",
                                     3: "quality"}
    for r in (root, root2):
        _run(["--input", b2, "--output", r, "--policy", "cc",
              "--run-id", "b", "--resume"] + QUALITY)
    assert _kept(spark, root) == _kept(spark, root2)
    assert _retired(spark, root) == _retired(spark, root2)


def test_pack_budget_writes_per_run_shard_packing(spark, roots):
    """--pack-budget: packed/run=<id> carries the window assignment
    over the run's kept (scrubbed) docs; spans tile the shard's token
    stream exactly and windows stay within the shard."""
    b1, _, _, root, _ = roots
    _run(["--input", b1, "--output", root, "--policy", "cc",
          "--run-id", "a", "--pack-budget", "4"] + QUALITY)
    packed = {
        r.doc_id: r
        for r in spark.read.parquet(
            os.path.join(root, "packed", "run=a")).collect()
    }
    kept = _kept(spark, root, "a")
    assert set(packed) == set(kept)
    total = 0
    for d in sorted(packed):
        r = packed[d]
        assert r.start_tok == total
        assert r.n_tok == len(kept[d].split(" "))
        assert r.first_window == r.start_tok // 4
        total += r.n_tok


def test_decontaminate_against_eval_set(spark, tmp_path, roots):
    """--decontaminate-against: docs sharing any token 8-gram with the
    eval parquet are retired 'contaminated'; precedence sits between
    dup and quality (doc 3 fails the length gate AND matches the eval
    8-gram -> 'contaminated'); sub-8-token docs can never match."""
    b1, _, _, root, _ = roots
    ev = _write_batch(spark, tmp_path, "eval",
                      [(900, "w1 w2 w3 w4 w5 w6 w7 w8")])
    _run(["--input", b1, "--output", root, "--policy", "cc",
          "--run-id", "a", "--decontaminate-against", ev] + QUALITY)
    assert set(_kept(spark, root, "a")) == {0, 4}
    assert _retired(spark, root, "a") == {
        1: "dup", 2: "quality", 3: "contaminated"
    }
    m = json.load(
        open(os.path.join(root, "metrics", "_sidecars", "run_a.json"))
    )
    assert m["retired_contaminated"] == 1 and m["docs_kept"] == 2


def test_shard_offsets_chain_across_runs(spark, roots):
    """shard_offsets: per-run packings compose into one global token
    stream — offsets chain in run order and each shard's spans tile
    [offset, offset + shard_total)."""
    from onnxocr_spark.operators.packing import shard_offsets

    b1, b2, _, root, _ = roots
    _run(["--input", b1, "--output", root, "--policy", "cc",
          "--run-id", "a", "--pack-budget", "4"] + QUALITY)
    _run(["--input", b2, "--output", root, "--policy", "cc",
          "--run-id", "b", "--resume", "--pack-budget", "4"] + QUALITY)
    offs = shard_offsets(spark, root)
    assert list(offs) == ["a", "b"] and offs["a"] == 0
    rows_a = spark.read.parquet(
        os.path.join(root, "packed", "run=a")).collect()
    assert offs["b"] == sum(r.n_tok for r in rows_a)
    rows_b = spark.read.parquet(
        os.path.join(root, "packed", "run=b")).collect()
    spans = sorted(
        (offs[run] + r.start_tok, offs[run] + r.start_tok + r.n_tok)
        for run, rows in (("a", rows_a), ("b", rows_b)) for r in rows
    )
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2  # global tiling, no gap/overlap
