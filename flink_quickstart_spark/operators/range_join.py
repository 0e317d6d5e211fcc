"""Binned range join — the scalable form of inequality joins.

A naive join on ``abs(a.v - b.v) <= eps`` plans as
BroadcastNestedLoopJoin: every row pair is compared, O(|A|·|B|) — fatal
at 100 TB (docs/SCALE_DESIGN.md flags it). The standard fix (used by
every range-join implementation, e.g. the interval-join literature and
Spark's own range-join hints on Databricks) is binning:

1. assign each left row the bucket ``floor(v / eps)``;
2. replicate each RIGHT row into every bucket its eps-window can touch:
   ``floor((rv - eps) / eps) .. floor((rv + eps) / eps)``, widened by one
   bucket on each side (see below) — at most 6 rows;
3. equi-join on the bucket id (hash shuffle, not nested loop);
4. re-check the exact float64 predicate to discard false candidates.

Why the span + widening instead of the obvious ``bucket ± 1``: the
re-check ``abs(lv - rv) <= eps`` is float64, and rounding can make it
true for pairs whose *exact* difference exceeds eps (e.g. lv=0.5,
rv=-1.18e-38, eps=0.5: the float difference rounds to exactly 0.5).
``bucket(rv) ± 1`` derives candidates from exact-arithmetic reasoning
and misses such pairs. Computing the span endpoints with the same
float64 ops Spark uses for the re-check closes most of the gap, but the
two expressions (``lv/eps`` vs ``(rv ± eps)/eps``) can still round to
opposite sides of an integer, shifting a floor by one — hence the ±1
widening. A remaining miss would need a ≥2-unit floor discrepancy,
which requires ``|v|/eps >= 2^52`` — a regime where float64 bucket ids
(and the long cast) are degenerate regardless; callers there should
rescale. Property-tested against the all-pairs join in
tests/test_property_rangejoin.py.

Cost: ≤6× replication of one side + one hash shuffle — linear, skew
handled by AQE. The same pattern generalizes to time-interval joins
(bucket = time window) and spatial joins (bucket = grid cell).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    eps: float,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner join of rows with ``abs(left.left_val - right.right_val) <= eps``
    as a binned equi-join. Column names of both inputs must be disjoint
    (alias beforehand). ``extra_cond`` adds equi/filter predicates that
    are AND-ed into the join (evaluated after the bucket match)."""
    eps = float(eps)
    if not eps > 0.0:
        raise ValueError(f"range_join eps must be > 0, got {eps!r}")

    l_binned = left.withColumn(
        "_rj_bucket", F.floor(F.col(left_val) / F.lit(eps)).cast("long")
    )
    # Replicate the right side into every bucket its eps-window can touch,
    # with the span endpoints computed in the SAME float64 arithmetic as
    # the re-check, widened ±1 for floor-rounding disagreement (see module
    # docstring). sequence() keeps this ≤6 rows per input row.
    rv = F.col(right_val)
    span_lo = F.floor((rv - F.lit(eps)) / F.lit(eps)).cast("long") - F.lit(1)
    span_hi = F.floor((rv + F.lit(eps)) / F.lit(eps)).cast("long") + F.lit(1)
    r_binned = right.withColumn(
        "_rj_bucket", F.explode(F.sequence(span_lo, span_hi))
    )
    cond = (F.col("_rj_bucket") == F.col("_rj_bucket2")) & (
        F.abs(F.col(left_val) - F.col(right_val)) <= F.lit(float(eps))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return (
        l_binned.join(
            r_binned.withColumnRenamed("_rj_bucket", "_rj_bucket2"), cond
        )
        .drop("_rj_bucket", "_rj_bucket2")
    )
