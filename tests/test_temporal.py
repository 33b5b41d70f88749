"""Temporal join operators (operators/temporal.py): as-of attribution
and bounded range joins, checked against brute-force Python oracles on
crafted fixtures that hit every boundary rule, plus plan-shape pins
(the whole point of these operators is the shape: no join node at all
for as-of, an equi-join — never BNLJ/Cartesian — for the range join).
"""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from onnxocr_spark.operators.temporal import asof_join, range_join_bucketed

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return EPOCH + dt.timedelta(seconds=seconds)


@pytest.fixture(scope="module")
def fixture(spark):
    # left (probes): crafted to hit: exact-tie with a right row (l1),
    # no prior right row (l0 at t=5 vs first right at t=10 for key B),
    # two right rows at the SAME timestamp (key A t=100 → tie rule),
    # and a key with no right rows at all (key C).
    left = spark.createDataFrame(
        [
            Row(lid=0, k="B", ts=_ts(5)),
            Row(lid=1, k="A", ts=_ts(100)),   # == two right rows' ts
            Row(lid=2, k="A", ts=_ts(150)),
            Row(lid=3, k="B", ts=_ts(10)),    # == right r3's ts exactly
            Row(lid=4, k="C", ts=_ts(50)),    # key with no right rows
            Row(lid=5, k="A", ts=_ts(99)),    # just before the t=100 pair
        ]
    )
    right = spark.createDataFrame(
        [
            Row(rid=10, k="A", ts=_ts(20), v=1.5),
            Row(rid=11, k="A", ts=_ts(100), v=2.5),  # same-ts pair …
            Row(rid=12, k="A", ts=_ts(100), v=3.5),  # … greatest rid wins
            Row(rid=13, k="B", ts=_ts(10), v=4.5),
        ]
    )
    return left, right


def test_asof_semantics_vs_brute_force(fixture):
    left, right = fixture
    out = {
        r["lid"]: (r["r_rid"], r["r_v"])
        for r in asof_join(
            left, right, keys=["k"], ts="ts", tie="rid", right_cols=["rid", "v"]
        ).collect()
    }
    # brute force: latest right with ts <= left.ts, ties → greatest rid
    rrows = [(13, "B", 10, 4.5), (10, "A", 20, 1.5), (11, "A", 100, 2.5),
             (12, "A", 100, 3.5)]
    lrows = [(0, "B", 5), (1, "A", 100), (2, "A", 150), (3, "B", 10),
             (4, "C", 50), (5, "A", 99)]
    for lid, k, ls in lrows:
        cand = [(rs, rid, v) for rid, rk, rs, v in rrows
                if rk == k and rs <= ls]
        want = (max(cand)[1], max(cand)[2]) if cand else (None, None)
        assert out[lid] == want, lid
    assert len(out) == 6  # left-outer: every left row survives exactly once


def test_asof_plan_has_no_join_node(fixture):
    left, right = fixture
    plan = asof_join(
        left, right, keys=["k"], ts="ts", tie="rid", right_cols=["rid", "v"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan      # union + one window, zero joins
    assert "Window" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("lo_s,hi_s", [(0, 30), (-15, 15), (10, 40)])
def test_range_join_vs_brute_force(spark, lo_s, hi_s):
    # timestamps dense enough that every band boundary case occurs:
    # r.ts == l.ts+lo (must be IN) and r.ts == l.ts+hi (must be OUT).
    lrows = [(i, "k%d" % (i % 3), 10 * i) for i in range(12)]
    rrows = [(100 + j, "k%d" % (j % 3), 5 * j) for j in range(24)]
    left = spark.createDataFrame(
        [Row(lid=i, k=k, ts=_ts(s)) for i, k, s in lrows]
    )
    right = spark.createDataFrame(
        [Row(rid=i, k=k, ts=_ts(s)) for i, k, s in rrows]
    )
    got = sorted(
        (r["lid"], r["r_rid"])
        for r in range_join_bucketed(
            left, right, keys=["k"], ts="ts",
            lo_us=lo_s * 1_000_000, hi_us=hi_s * 1_000_000,
            right_cols=["rid"],
        ).collect()
    )
    want = sorted(
        (lid, rid)
        for lid, lk, ls in lrows
        for rid, rk, rs in rrows
        if lk == rk and ls + lo_s <= rs < ls + hi_s
    )
    assert got == want


def test_range_join_rejects_empty_band(spark):
    df = spark.range(1).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts")
    )
    with pytest.raises(ValueError):
        range_join_bucketed(df, df, keys=["k"], ts="ts",
                            lo_us=5, hi_us=5, right_cols=["k"])


def test_range_join_plan_is_equi_join(fixture):
    left, right = fixture
    plan = range_join_bucketed(
        left, right, keys=["k"], ts="ts", lo_us=0, hi_us=60_000_000,
        right_cols=["rid"],
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the band predicate rides the equi-join on (keys…, _bin)
    assert "Join" in plan and "_bin" in plan


@pytest.mark.parametrize("width_s", [7, 40, 1000])
def test_asof_sliced_identical_to_default(fixture, width_s):
    # slice widths chosen so the fixture spans many/few/one slice(s):
    # carry must cross empty slices and slices holding only left rows.
    left, right = fixture
    kw = dict(keys=["k"], ts="ts", tie="rid", right_cols=["rid", "v"])
    base = sorted(map(tuple, asof_join(left, right, **kw).collect()))
    sliced = sorted(map(tuple, asof_join(
        left, right, slice_width_us=width_s * 1_000_000, **kw
    ).collect()))
    assert sliced == base


def test_asof_sliced_hot_key(spark):
    # one hot key with interleaved rights/lefts across many slices;
    # brute-force oracle, slice boundary exactly between events.
    n = 400
    rows_r = [Row(rid=i, k="hot", ts=_ts(3 * i), v=float(i)) for i in range(0, n, 2)]
    rows_l = [Row(lid=i, k="hot", ts=_ts(3 * i + 1)) for i in range(n)]
    right = spark.createDataFrame(rows_r).repartition(8)
    left = spark.createDataFrame(rows_l).repartition(8)
    out = asof_join(
        left, right, keys=["k"], ts="ts", tie="rid",
        right_cols=["rid"], slice_width_us=50_000_000,
    ).collect()
    got = {r["lid"]: r["r_rid"] for r in out}
    assert len(got) == n
    for i in range(n):
        # right rid=e (even) sits at t=3e; latest with 3e <= 3i+1 is
        # e = i rounded down to even.
        assert got[i] == i - (i % 2), i


def test_asof_duplicate_left_rows_both_survive(spark):
    # genuinely duplicate left rows must each get the attribution
    left = spark.createDataFrame(
        [Row(lid=1, k="A", ts=_ts(50)), Row(lid=1, k="A", ts=_ts(50))]
    )
    right = spark.createDataFrame([Row(rid=7, k="A", ts=_ts(40), v=1.0)])
    out = asof_join(left, right, keys=["k"], ts="ts", tie="rid",
                    right_cols=["rid"]).collect()
    assert [r["r_rid"] for r in out] == [7, 7]
