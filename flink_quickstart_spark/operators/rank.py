"""Scale-safe global ranking — two-phase distributed row_number.

``Window.orderBy(...)`` with no ``partitionBy`` is the classic Spark
scale-killer: the physical plan is a single-partition ``WindowExec``
("WARN WindowExec: No Partition Defined for Window operation"), i.e.
every row moves to ONE reducer. Fine for a 25-row dimension, fatal at
100 TB.

The standard distributed alternative (the ``zipWithIndex`` idiom,
re-expressed DataFrame-first) is two-phase:

1. **Bucket** every row by a value-deterministic range of the primary
   sort key. Boundaries come from one ``approxQuantile`` pass
   (Greenwald-Khanna, driver gets ≤ ``buckets`` doubles). Assignment is
   a pure expression on the value, so tied values can never straddle a
   bucket — global order restricted to a bucket is contiguous.
2. **Count** rows per bucket (one tiny agg, ≤ ``buckets`` rows to the
   driver), prefix-sum the counts into per-bucket global offsets, and
   broadcast-join them back. Within each bucket a *partitioned* window
   computes ``row_number``; global position = bucket offset + local
   row_number.

Cost: two extra passes over the input (quantile probe + count) and one
hash shuffle on the bucket id — every stage is parallel across
``buckets`` tasks. Skewed keys degrade gracefully: a heavy-hitter value
lands in one bucket (ties must stay together), which AQE can split for
the sort but not for the window — callers with a dominant single value
should rank on a higher-cardinality composite.

From the global position, the order-statistics family follows with no
further shuffle (total ordering must be UNIQUE so rank == row_number):

- ``percent_rank = (pos - 1) / (n - 1)``
- ``cume_dist   = pos / n``
- ``ntile(k)``: first ``n % k`` tiles hold ``ceil(n/k)`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_GB = "_rank_bucket"
_RN = "_rank_local"
_OFF = "_rank_offset"


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    bucket_col: str,
    out_col: str = "pos",
    buckets: int = 64,
    _with_total: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Append ``out_col`` = 1-based global row_number over ``order_by``.

    ``order_by`` must be a UNIQUE total ordering (include a tiebreak
    key). ``bucket_col`` names the numeric primary sort column used for
    range bucketing; its sense (asc/desc) is inferred from the first
    ``order_by`` expression by the caller passing boundaries-compatible
    ordering — bucketing only groups rows, the window inside each bucket
    enforces the exact ``order_by``, so any value-deterministic
    assignment that keeps bucket ranges aligned with the primary sort
    direction is correct.

    ``buckets`` bounds driver-side state (≤ buckets doubles + counts)
    and the parallelism of the window stage; raise it at larger scale.
    """
    asc = _is_ascending(order_by[0])
    bucketed = df.withColumn(_GB, _bucket_expr(df, bucket_col, asc, buckets))

    counts = {
        r[_GB]: r["cnt"]
        for r in bucketed.groupBy(_GB).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total, offsets = 0, []
    for bid in sorted(counts):
        offsets.append((bid, total))
        total += counts[bid]

    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, f"{_GB} int, {_OFF} long")

    w = Window.partitionBy(_GB).orderBy(*order_by)
    out = (
        bucketed.join(F.broadcast(off_df), _GB)
        .withColumn(_RN, F.row_number().over(w))
        .withColumn(out_col, (F.col(_OFF) + F.col(_RN)).cast("long"))
        .drop(_GB, _RN, _OFF)
    )
    return (out, total) if _with_total else out


def global_order_stats(
    df: DataFrame,
    order_by: list[Column],
    bucket_col: str,
    ntile: int = 4,
    pos_col: str = "_pos",
    buckets: int = 64,
) -> DataFrame:
    """Append ``ntile``/``percent_rank``/``cume_dist`` columns (named
    ``ntile``, ``pct_rank``, ``cdist``) computed from the two-phase
    global position — no single-partition window anywhere.

    Requires a unique total ordering (so rank == row_number); matches
    ANSI window-function semantics under that condition.
    """
    ranked, n = global_row_number(
        df, order_by, bucket_col, out_col=pos_col, buckets=buckets, _with_total=True
    )
    pos = F.col(pos_col)
    q, r = divmod(n, ntile) if n else (0, 0)
    # First r tiles hold q+1 rows each, the rest hold q.
    big_span = r * (q + 1)
    if q == 0:
        # Fewer rows than tiles: tile == pos.
        tile = pos
    else:
        tile = F.when(
            pos <= F.lit(big_span), ((pos - 1) / F.lit(q + 1)).cast("long") + 1
        ).otherwise(
            F.lit(r) + ((pos - 1 - F.lit(big_span)) / F.lit(q)).cast("long") + 1
        )
    pct = (
        F.lit(0.0)
        if n <= 1
        else (pos - F.lit(1)).cast("double") / F.lit(float(n - 1))
    )
    return (
        ranked.withColumn("ntile", tile.cast("long"))
        .withColumn("pct_rank", pct)
        .withColumn("cdist", pos.cast("double") / F.lit(float(max(n, 1))))
    )


def global_ntiles(
    df: DataFrame,
    specs: list[tuple[str, list[Column], str]],
    ntile: int = 5,
    buckets: int = 64,
) -> DataFrame:
    """Append one ANSI-exact global ``ntile`` column PER SPEC — the
    multi-ordering fusion of :func:`global_order_stats` (r8).

    ``specs`` is a list of ``(out_col, order_by, bucket_col)``; each
    ordering must be a unique total order (tiebreak key included).

    PRECONDITION — same null caveat as :func:`_bucket_expr`, which this
    fusion inlines (one approxQuantile call covering EVERY bucket
    column is the point, so it cannot call the shared helper per spec):
    bucket columns must be NON-NULL. approxQuantile ignores nulls and a
    null evaluates every when() to 0, landing the row in the HEAD
    bucket — wrong for DESC NULLS LAST global order. Callers filter
    nulls first (q_agg_rfm's aggregate columns are non-null by
    construction).

    Why this exists: N chained ``global_order_stats`` calls cost
    ~2N driver-synchronized jobs (each stage's approxQuantile + bucket
    counts re-execute everything upstream), which dominates wall time
    wherever fixed cost matters. This fusion runs ONE approxQuantile
    job covering every bucket column, ONE grouping-sets aggregate for
    all per-bucket counts (≤ specs × buckets rows to the driver — the
    same bounded concession as global_row_number), and then appends all
    ntile columns in a single lazy plan: per spec, a broadcast offset
    join + a bucket-partitioned row_number window. No single-partition
    WindowExec; the N window shuffles are inherent to ranking N
    different orders and run without driver round-trips between them.
    """
    probs = [i / buckets for i in range(1, buckets)]
    raw = df.stat.approxQuantile([s[2] for s in specs], probs, 0.001)
    gb_names, bucketed = [], df
    for (out_col, order_by, bcol), bounds_raw in zip(specs, raw):
        asc = _is_ascending(order_by[0])
        boundaries = sorted(set(float(b) for b in bounds_raw))
        v = F.col(bcol)
        expr = F.lit(0)
        for b in boundaries:
            cond = (v > F.lit(b)) if asc else (v < F.lit(b))
            expr = expr + F.when(cond, 1).otherwise(0)
        gb = f"_gb_{out_col}"
        gb_names.append(gb)
        bucketed = bucketed.withColumn(gb, expr)

    counts_rows = (
        bucketed.groupingSets([[g] for g in gb_names], *[F.col(g) for g in gb_names])
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    spark = df.sparkSession
    n = 0
    out = bucketed
    for i, ((out_col, order_by, _bcol), gb) in enumerate(zip(specs, gb_names)):
        # single-column grouping sets: the row for set i has every OTHER
        # grouping column null (bucket ids themselves are never null)
        counts = {
            r[gb]: r["cnt"]
            for r in counts_rows
            if r[gb] is not None
            and all(r[g] is None for g in gb_names if g != gb)
        }
        total, offsets = 0, []
        for bid in sorted(counts):
            offsets.append((bid, total))
            total += counts[bid]
        n = total
        off_df = spark.createDataFrame(offsets, f"{gb} int, _off long")
        w = Window.partitionBy(gb).orderBy(*order_by)
        pos = F.col("_off") + F.row_number().over(w)
        q, r = divmod(n, ntile) if n else (0, 0)
        big_span = r * (q + 1)
        if q == 0:
            tile = pos
        else:
            tile = F.when(
                pos <= F.lit(big_span), ((pos - 1) / F.lit(q + 1)).cast("long") + 1
            ).otherwise(
                F.lit(r) + ((pos - 1 - F.lit(big_span)) / F.lit(q)).cast("long") + 1
            )
        out = (
            out.join(F.broadcast(off_df), gb)
            .withColumn(out_col, tile.cast("long"))
            .drop("_off")
        )
    return out.drop(*gb_names)


def _bucket_expr(df: DataFrame, bucket_col: str, asc: bool, buckets: int) -> Column:
    """Value-deterministic range-bucket id for ``bucket_col``: boundaries
    from one approxQuantile pass, assignment as a pure expression (tied
    values can never straddle a bucket). approxQuantile ignores nulls;
    rank ordering with nulls is ambiguous across engines anyway —
    callers filter them."""
    probs = [i / buckets for i in range(1, buckets)]
    raw = df.stat.approxQuantile(bucket_col, probs, 0.001)
    boundaries = sorted(set(float(b) for b in raw))
    if not boundaries:
        return F.lit(0)
    v = F.col(bucket_col)
    # Unrolled sum-of-whens rather than F.aggregate over a boundary
    # array: the boundaries are driver-side constants anyway, the
    # unrolled form stays inside whole-stage codegen, and the HOF
    # lambda trips a Spark 4.1 Union constraint-rewrite crash
    # ("key not found: <attr>") when the bucketed frame is a union
    # (operators/theta.py r6 discovery).
    expr = F.lit(0)
    for b in boundaries:
        cond = (v > F.lit(b)) if asc else (v < F.lit(b))
        expr = expr + F.when(cond, 1).otherwise(0)
    return expr


def global_running_sum(
    df: DataFrame,
    value_col: str,
    order_by: list[Column],
    bucket_col: str,
    out_col: str = "running",
    buckets: int = 64,
) -> DataFrame:
    """Append ``out_col`` = inclusive running SUM of ``value_col`` over the
    global ``order_by`` — the distributed prefix-sum, same two-phase shape
    as :func:`global_row_number`: range-bucket on ``bucket_col``, one tiny
    per-bucket SUM aggregate to the driver, prefix-sum those into bucket
    offsets, broadcast them back, and finish with a *partitioned* running
    window inside each bucket. No single-partition WindowExec anywhere;
    every stage is parallel across ``buckets`` tasks.

    ``order_by`` must be a unique total ordering (include a tiebreak key)
    so the prefix sum is well-defined row-by-row. Integer value columns
    prefix-sum in long arithmetic (exact); float columns in double —
    bucket offsets then carry the usual summation-order caveat, so
    consumers round their outputs like every other double aggregate.
    """
    return global_running_sums(
        df, [value_col], order_by, bucket_col, [out_col], buckets
    )


def global_running_sums(
    df: DataFrame,
    value_cols: list[str],
    order_by: list[Column],
    bucket_col: str,
    out_cols: list[str],
    buckets: int = 64,
) -> DataFrame:
    """N-column variant of :func:`global_running_sum`: one bucket pass,
    one per-bucket aggregate (N sums in the same tiny job), ONE
    partitioned window evaluating all N running sums — callers needing
    several prefix statistics over the same ordering (e.g. the theta
    count+sum join) pay a single shuffle instead of one per statistic.
    """
    assert len(value_cols) == len(out_cols) and value_cols
    asc = _is_ascending(order_by[0])
    bucketed = df.withColumn(_GB, _bucket_expr(df, bucket_col, asc, buckets))

    dtypes = dict(df.dtypes)
    _FLOAT = ("double", "float")
    _INT = ("bigint", "int", "smallint", "tinyint", "boolean")
    for c in value_cols:
        if dtypes.get(c) not in _FLOAT + _INT:
            raise ValueError(
                f"global_running_sums: unsupported dtype "
                f"{dtypes.get(c)!r} for value column {c!r} — prefix "
                f"sums are defined for integral (exact long "
                f"arithmetic) and float/double (double arithmetic) "
                f"columns only; cast decimals/strings explicitly so "
                f"the offset schema is chosen deliberately"
            )
    kinds = [
        "double" if dtypes.get(c) in _FLOAT else "long"
        for c in value_cols
    ]
    rows = (
        bucketed.groupBy(_GB)
        .agg(*[F.sum(c).alias(f"s{i}") for i, c in enumerate(value_cols)])
        .collect()
    )
    sums = {r[_GB]: [r[f"s{i}"] for i in range(len(value_cols))] for r in rows}
    totals = [0.0 if k == "double" else 0 for k in kinds]
    offsets = []
    for bid in sorted(sums):
        offsets.append((bid, *totals))
        totals = [
            t + (s or 0) for t, s in zip(totals, sums[bid])
        ]

    spark = df.sparkSession
    off_fields = ", ".join(
        f"{_OFF}{i} {k}" for i, k in enumerate(kinds)
    )
    off_df = spark.createDataFrame(offsets, f"{_GB} int, {off_fields}")

    w = (
        Window.partitionBy(_GB)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = bucketed.join(F.broadcast(off_df), _GB)
    for i, (c, o, k) in enumerate(zip(value_cols, out_cols, kinds)):
        out = out.withColumn(
            o, (F.col(f"{_OFF}{i}") + F.sum(c).over(w)).cast(k)
        )
    return out.drop(_GB, *[f"{_OFF}{i}" for i in range(len(value_cols))])


def _is_ascending(col: Column) -> bool:
    """Infer sort direction from a Column's expression string ("... DESC
    NULLS LAST" etc.); plain columns default to ascending."""
    s = str(col)
    return " DESC" not in s.upper()
