"""Binned range join — the scalable form of inequality joins.

A naive join on ``abs(a.v - b.v) <= eps`` plans as
BroadcastNestedLoopJoin: every row pair is compared, O(|A|·|B|) — fatal
at 100 TB (docs/SCALE_DESIGN.md flags it). The standard fix (used by
every range-join implementation, e.g. the interval-join literature and
Spark's own range-join hints on Databricks) is binning:

1. assign each row the bucket ``floor(v / eps)``;
2. a pair within ``eps`` can only differ by at most one bucket, so
   replicate ONE side into its bucket and both neighbors (3 rows);
3. equi-join on the bucket id (hash shuffle, not nested loop);
4. re-check the exact predicate to discard the few false candidates.

Cost: 3× replication of one side + one hash shuffle — linear, skew
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
    bucket = lambda c: F.floor(F.col(c) / F.lit(float(eps))).cast("long")  # noqa: E731

    l_binned = left.withColumn("_rj_bucket", bucket(left_val))
    # replicate the right side into bucket-1, bucket, bucket+1
    r_binned = right.withColumn(
        "_rj_bucket",
        F.explode(
            F.array(
                bucket(right_val) - F.lit(1),
                bucket(right_val),
                bucket(right_val) + F.lit(1),
            )
        ),
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
