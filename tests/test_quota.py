"""Per-key quota sampling (operators/quota.py): the salted two-phase
top-K must be pinned output-identical to the single-window shape on a
skewed fixture (one hot key dominating), and both must match a
brute-force Python oracle."""

import pytest
from pyspark.sql import Row, functions as F

from onnxocr_spark.operators.quota import top_k_per_key


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key "h" holds 500 rows, cold keys 3 rows each — fewer than
    # k for some keys (k=5 must then keep all of them).
    rows = [Row(k="h", v=f"{(i * 37) % 500:04d}", i=i) for i in range(500)]
    rows += [Row(k=f"c{j}", v=f"{i:04d}", i=i) for j in range(4) for i in range(3)]
    return spark.createDataFrame(rows).repartition(8)


@pytest.mark.parametrize("k", [1, 5])
def test_salted_identical_to_default_and_brute_force(skewed, k):
    base = sorted(
        map(tuple, top_k_per_key(skewed, ["k"], ["v", "i"], k).collect())
    )
    for s in (2, 8, 64):  # more buckets than k, fewer keys than rows
        salted = sorted(map(tuple, top_k_per_key(
            skewed, ["k"], ["v", "i"], k, salt_buckets=s
        ).collect()))
        assert salted == base, s
    # brute force
    local = [(r["k"], r["v"], r["i"]) for r in skewed.collect()]
    want = []
    for key in {k_ for k_, _, _ in local}:
        grp = sorted((v, i) for k_, v, i in local if k_ == key)
        want += [(key, v, i, rk + 1) for rk, (v, i) in enumerate(grp[:k])]
    assert base == sorted(want)


def test_rejects_bad_params(skewed):
    with pytest.raises(ValueError):
        top_k_per_key(skewed, ["k"], ["v"], 0)
    with pytest.raises(ValueError):
        top_k_per_key(skewed, ["k"], ["v"], 1, salt_buckets=0)


def test_salted_plan_has_no_join_or_cartesian(skewed):
    plan = top_k_per_key(
        skewed, ["k"], ["v", "i"], 3, salt_buckets=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # two windows (per-(key,salt) then per-key), zero joins
    assert plan.count("Window") >= 2 and "Join" not in plan
