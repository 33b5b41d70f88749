"""Temporal joins over event streams: as-of attribution and bounded
range joins, in shapes that survive 100 TB.

Both are operators Spark lacks as built-ins (reference parity: the
OnnxOCR reference has no event engine at all — these belong to the
training-data-pipeline extension surface, like sessionization in
`__spark_entry__.py`), and both have a naive formulation that is a
scale killer:

* as-of ("latest right row at-or-before each left row, per key") as a
  theta-join ``l.key = r.key AND r.ts <= l.ts`` + argmax explodes to
  O(|l|·|r|) per key before the argmax prunes it.
* range ("right rows within [l.ts+lo, l.ts+hi)") as a raw inequality
  join is a BroadcastNestedLoop/Cartesian unless the optimizer finds
  an equi-key — and the band predicate alone gives it none.

The shapes used here instead:

* `asof_join`: UNION the two sides with a tag column, ONE window over
  (keys) ordered by (ts, tag, tie) carrying ``last(right_struct,
  ignorenulls=True)`` — a single hash exchange on the join keys and a
  per-key sort, O((|l|+|r|) log) total, no join node at all. Right
  rows order before left rows at the same timestamp (tag 0 < 1), so
  the semantics are latest-at-or-EQUAL; ties among right rows at one
  timestamp resolve to the greatest `tie` column (deterministic, no
  RNG). All carried right columns come from the same right row because
  they travel inside one struct.
* `range_join_bucketed`: quantize time into bins of width (hi-lo); a
  half-open window of length L=hi-lo overlaps at most 2 bins of width
  L, so each left row emits exactly 2 (key, bin) probes, the join is a
  plain equi-join on (keys…, bin), and the exact band predicate
  filters after. Shuffle volume is 2·|l| + |r| rows — no quadratic
  blowup, no BNLJ; skew follows the key distribution like any
  equi-join (salt upstream if one key dominates).

Scale notes: both shapes shuffle by the join keys, so a single
pathological key (one user with 10^9 events) would serialize within
its partition under the default path — inherent to per-key ordered
semantics. `asof_join(slice_width_us=…)` is the built escape hatch:
time-sliced per-(key, slice) scans with a per-key prefix scan over
per-slice tails (boundary carry-over), pinned output-identical to the
default path. Timestamps compare as exact integer microseconds,
never floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _floor_div(x: Column, w: int) -> Column:
    """Exact floor(x / w) for BIGINT x, any sign. `F.floor(x / lit(w))`
    is WRONG here: `/` on bigints is double division, and at epoch-
    microsecond magnitudes (~1.7e15) the quotient's double rounding
    error (~q*2^-52) can cross an integer boundary when the bin width
    is large (width 1e10 → gap 1/width = 1e-10 < error ~1.3e-9),
    silently mis-binning a row and dropping a matching pair.
    `x - pmod(x, w)` is an exact multiple of w (pmod is non-negative),
    and dividing an exact multiple m*w by w yields m exactly in double
    for |x| < 2^53 — every real timestamp qualifies."""
    return ((x - F.pmod(x, F.lit(w))) / F.lit(w)).cast("long")


def _epoch_micros(df: DataFrame, ts: str) -> Column:
    """Exact integer microseconds for TIMESTAMP and TIMESTAMP_NTZ.
    `unix_micros` rejects NTZ, and casting NTZ→TIMESTAMP interprets in
    the session zone — not an affine shift across DST transitions, so
    a band predicate could silently widen/narrow by an hour near them.
    For NTZ, diff against an NTZ epoch literal instead: zone-free and
    exact."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts}`)"
        )
    return F.unix_micros(F.col(ts))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts: str,
    tie: str,
    right_cols: list[str],
    prefix: str = "r_",
    slice_width_us: int | None = None,
) -> DataFrame:
    """For every left row, attach `right_cols` from the latest right
    row with the same `keys` and right.ts <= left.ts (at-or-equal;
    ties among right rows at one timestamp go to the greatest `tie`).
    Left rows with no prior right row keep NULLs (left-outer as-of).

    Default path: one hash exchange on `keys`, one window, zero join
    nodes. A single pathological key still serializes inside its
    partition (inherent to a per-key ordered scan), so
    `slice_width_us` is the skew escape hatch: time is cut into fixed
    slices, the ordered scan runs per (key, slice) — parallel WITHIN
    the hot key — and cross-slice visibility is restored by a per-key
    prefix scan over the per-slice LAST-right tails (one row per
    (key, slice), not per event) joined back and coalesced under the
    in-slice hit. Output is pinned identical to the default path
    (tests/test_temporal.py); cost is one extra small aggregation +
    one equi-join on (keys, slice) that reuses the same partitioning.
    """
    carried = F.struct(*[F.col(c) for c in right_cols]).alias("_asof")
    r = right.select(
        *keys, F.col(ts).alias("_ts"), F.col(tie).alias("_tie"),
        F.lit(0).alias("_tag"), carried,
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    # `tie` only orders RIGHT rows (left rows at one ts are independent
    # of each other), so the left side may lack the column entirely.
    l_tie = F.col(tie) if tie in left.columns else F.lit(0)
    l = left.select(
        *keys, F.col(ts).alias("_ts"), l_tie.alias("_tie"),
        F.lit(1).alias("_tag"), F.lit(None).cast(r.schema["_asof"].dataType).alias("_asof"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    u = r.unionByName(l)
    if slice_width_us is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy("_ts", "_tag", "_tie")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = u.withColumn(
            "_hit", F.last("_asof", ignorenulls=True).over(w)
        ).where(F.col("_tag") == 1)
    else:
        if slice_width_us <= 0:
            raise ValueError("slice_width_us must be positive")
        u = u.withColumn("_slice", _floor_div(_epoch_micros(u, "_ts"), slice_width_us))
        w_in = (
            Window.partitionBy(*keys, "_slice")
            .orderBy("_ts", "_tag", "_tie")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # last RIGHT row per (key, slice); max_by skips NULL ordinals,
        # so slices with no right rows yield a NULL tail (and every
        # (key, slice) that has ANY row appears, which is exactly the
        # set the join back needs to cover).
        tails = u.groupBy(*keys, "_slice").agg(
            F.max_by(
                F.col("_asof"),
                F.when(F.col("_tag") == 0, F.struct("_ts", "_tie")),
            ).alias("_tail")
        )
        w_carry = (
            Window.partitionBy(*keys)
            .orderBy("_slice")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carries = tails.select(
            *keys, "_slice",
            F.last("_tail", ignorenulls=True).over(w_carry).alias("_carry"),
        )
        out = (
            u.withColumn("_hit_in", F.last("_asof", ignorenulls=True).over(w_in))
            .where(F.col("_tag") == 1)
            .join(carries, on=keys + ["_slice"], how="left")
            .withColumn("_hit", F.coalesce("_hit_in", "_carry"))
        )
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_hit.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts: str,
    lo_us: int,
    hi_us: int,
    right_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Inner-join each left row to every right row with the same
    `keys` and right.ts in the half-open band
    [left.ts + lo_us, left.ts + hi_us), via 2-bin quantization →
    equi-join → exact band filter. `hi_us > lo_us` required; bin
    width is exactly the band length so 2 probe bins always cover.
    """
    if hi_us <= lo_us:
        raise ValueError("hi_us must exceed lo_us")
    width = hi_us - lo_us
    l = left.select(
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
        *[F.col(k) for k in keys],
        _epoch_micros(left, ts).alias("_lus"),
    ).withColumn(
        "_bin",
        F.explode(
            F.array_distinct(
                F.array(
                    _floor_div(F.col("_lus") + F.lit(lo_us), width),
                    _floor_div(F.col("_lus") + F.lit(hi_us) - 1, width),
                )
            )
        ),
    )
    r = right.select(
        *[F.col(k) for k in keys],
        _epoch_micros(right, ts).alias("_rus"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rc"),
    ).withColumn("_bin", _floor_div(F.col("_rus"), width))
    joined = l.join(r, on=keys + ["_bin"], how="inner").where(
        (F.col("_rus") >= F.col("_lus") + F.lit(lo_us))
        & (F.col("_rus") < F.col("_lus") + F.lit(hi_us))
    )
    return joined.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_rc.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
