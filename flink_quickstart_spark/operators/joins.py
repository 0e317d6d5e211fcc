"""Composed join operators Spark lacks natively.

Reference surface [PK]: Flink ``KeyedStream.intervalJoin`` and the Table
API temporal (as-of) join (checkout empty — see SURVEY.md §0).

Both operators here are pure DataFrame compositions — they shuffle once on
the join key and never collect to the driver, so they scale to arbitrary
key cardinality. The as-of join deliberately avoids ``ps.merge_asof``
(pandas-on-Spark) because the union+window form stays entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (``<`` when ``strict``) within the same ``on``
    key — a backward as-of join (Flink temporal-join semantics).

    Plan shape: tag both sides, union, one window over (key, ts) with a
    running ``last(..., ignorenulls=True)`` — a single shuffle on ``on``,
    linear in total rows, skew-tolerant via AQE. At 100 TB this beats a
    range-join (no quadratic candidate pairs) and pandas merge_asof (no
    Python boundary).
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    ).withColumn("__side", F.lit(0))
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)
    for c in lcols:
        if c != on and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(ltypes[c]))
    for c in right_payload:
        l = l.withColumn(f"__r_{c}", F.lit(None).cast(rtypes[c]))
    unioned = l.unionByName(r.select(*l.columns))
    # Tie handling happens purely via sort order with a frame ending at the
    # current row: non-strict sorts right rows (side 0) before left at equal
    # ts so `right.ts <= left.ts` matches; strict sorts them after, so an
    # equal-ts right row is out of frame.
    order = [F.col("__ts")] + ([F.col("__side").desc()] if strict else [F.col("__side")])
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_payload
        ],
    )
    return filled.where(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__m_{c}").alias(f"r_{c}") for c in right_payload]
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """For each left row, attach the right row NEAREST in time within the
    same key — either direction; equal-distance ties (and exact-equal
    timestamps) resolve BACKWARD. Appends ``r_<payload>`` columns plus
    ``direction`` ('backward'/'forward', null when no match).

    Plan shape: the same single-shuffle union as :func:`asof_join`, but
    ONE window sort serves TWO frames — a running ``last`` (unbounded
    preceding → current) fills the backward candidate and a running
    ``first`` (current → unbounded following) the forward candidate; the
    nearest pick is a row-local CASE on the two gaps. Equal-ts right
    rows sort before left rows, so backward is non-strict and forward
    effectively strict — which never changes the nearest result, since a
    gap-0 backward match wins every tie. Linear in total rows, no
    quadratic candidates, no Python."""
    lcols = left.columns
    payload = list(dict.fromkeys([right_ts, *right_payload]))
    l = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    ).withColumn("__side", F.lit(0))
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)
    for c in lcols:
        if c != on and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(ltypes[c]))
    for c in payload:
        l = l.withColumn(f"__r_{c}", F.lit(None).cast(rtypes[c]))
    unioned = l.unionByName(r.select(*l.columns))
    base = Window.partitionBy(on).orderBy("__ts", "__side")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in payload
        ],
        *[
            F.first(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in payload
        ],
    ).where(F.col("__side") == 1)
    ts_us = F.unix_micros(F.col("__ts"))
    b_ts, f_ts = F.col(f"__b_{right_ts}"), F.col(f"__f_{right_ts}")
    b_gap = ts_us - F.unix_micros(b_ts)
    f_gap = F.unix_micros(f_ts) - ts_us
    use_b = b_ts.isNotNull() & (f_ts.isNull() | (b_gap <= f_gap))
    return filled.select(
        *lcols,
        *[
            F.when(use_b, F.col(f"__b_{c}"))
            .otherwise(F.col(f"__f_{c}"))
            .alias(f"r_{c}")
            for c in payload
        ],
        F.when(b_ts.isNull() & f_ts.isNull(), F.lit(None).cast("string"))
        .otherwise(F.when(use_b, F.lit("backward")).otherwise(F.lit("forward")))
        .alias("direction"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
) -> DataFrame:
    """Flink ``a.intervalJoin(b).between(lower, upper)`` batch analog:
    pairs where ``left.ts + lower <= right.ts <= left.ts + upper``.

    Equi-join on the key carries the shuffle; the time-range predicate is
    evaluated post-match inside the join, so there is no cross product.
    The streaming twin (stream-stream join + watermarks) lives in
    ``streaming/``.
    """
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (rt >= lt + lower)
            & (rt <= lt + upper),
        )
    )
