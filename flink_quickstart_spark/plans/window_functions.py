"""Analytic (OVER) window query keys (SURVEY.md §2.E).

Reference surface [PK]: Flink Table API OVER windows (checkout empty — see
SURVEY.md §0).

Every key maps to ``pyspark.sql.Window`` with fully deterministic ordering
(explicit tie-breaks everywhere — Spark and DuckDB must rank identically).
Scale note: an OVER window shuffles once on its partition key; these
partition on high-cardinality keys (user_id, priority) so partitions stay
small. A window with NO partition key (q_sort's global row_number) is the
single-reducer anti-pattern — acceptable only for final small outputs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_quickstart_spark.plans.registry import register, tables


@register(
    "q_wf_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS total,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("batch", "window"),
)
def q_wf_rank(spark, sf_dir):
    """E1: row_number / rank / dense_rank within order priority."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("total"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "q_wf_laglead",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           epoch_us(ts) - lag(epoch_us(ts))  OVER w AS gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("batch", "window"),
)
def q_wf_laglead(spark, sf_dir):
    """E2: lag/lead — per-user inter-event gap in exact integer µs."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    return t.events.select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_wf_running",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_total
    FROM orders
    """,
    tags=("batch", "window"),
)
def q_wf_running(spark, sf_dir):
    """E3: running sum (rows frame) — cumulative revenue per customer."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "q_wf_rangeframe",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                               RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS BIGINT)
             AS n_within_1k
    FROM orders
    """,
    tags=("batch", "window"),
)
def q_wf_rangeframe(spark, sf_dir):
    """E4: RANGE frame — peers counted by value distance, not row offset."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.count(F.lit(1)).over(w).cast("long").alias("n_within_1k"),
    )


@register(
    "q_wf_distribution",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS BIGINT)   AS quartile,
           round(percent_rank() OVER w, 6)   AS pct_rank,
           round(cume_dist() OVER w, 6)      AS cdist
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    tags=("batch", "window"),
)
def q_wf_distribution(spark, sf_dir):
    """E5: ntile / percent_rank / cume_dist over account balance — derived
    from the two-phase distributed global rank (operators/rank.py), so
    the plan has NO single-partition WindowExec; values match the ANSI
    window functions because (c_acctbal, c_custkey) is a unique total
    ordering (rank == row_number)."""
    from flink_quickstart_spark.operators.rank import global_order_stats

    t = tables(spark, sf_dir)
    stats = global_order_stats(
        t.customer.select("c_custkey", "c_acctbal"),
        order_by=[F.col("c_acctbal"), F.col("c_custkey")],
        bucket_col="c_acctbal",
        ntile=4,
    )
    return stats.select(
        "c_custkey",
        F.col("ntile").alias("quartile"),
        F.round("pct_rank", 6).alias("pct_rank"),
        F.round("cdist", 6).alias("cdist"),
    )


@register(
    "q_wf_firstlast",
    oracle="""
    SELECT user_id,
           arg_min(event_type, ts) AS first_type,
           arg_max(event_type, ts) AS last_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    tags=("batch", "window"),
)
def q_wf_firstlast(spark, sf_dir):
    """E6: first/last value per key — via min_by/max_by (deterministic,
    unlike Spark's first()/last() without ordering). Event timestamps are
    µs-distinct per user in this data, so arg_min/min_by agree."""
    t = tables(spark, sf_dir)
    return t.events.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("first_type"),
        F.max_by("event_type", "ts").alias("last_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_topk_pergroup",
    oracle="""
    SELECT user_id, event_id, value
    FROM (SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events)
    WHERE rn <= 3
    """,
    tags=("batch", "window", "headline"),
)
def q_topk_pergroup(spark, sf_dir):
    """E7: top-k per group — the row_number≤k idiom. Scale note: Spark
    plans partial sort + window; for very hot keys, pre-aggregate a
    per-partition top-k first (same idiom over mapPartitions output)."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        t.events.select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "q_wf_trailing_7d",
    oracle="""
    SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS od_us,
           round(sum(o_totalprice) OVER w, 2)  AS trail_sum,
           CAST(count(*) OVER w AS BIGINT)     AS trail_n
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("batch", "window"),
)
def q_wf_trailing_7d(spark, sf_dir):
    """E4b: trailing TIME-range frame — each order's 7-day-lookback
    revenue per customer. The frame is RANGE over epoch-µs (numeric, so
    the identical frame spec runs on both engines; Spark's interval
    rangeBetween is equivalent but not textually portable). The
    real-time twin is a sliding window aggregate; at 100 TB one shuffle
    on the partition key, sort amortized within partitions."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-604_800_000_000, 0)
    )
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("trail_sum"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )


@register(
    "q_wf_nth",
    oracle="""
    SELECT c_custkey,
           nth_value(c_name, 2) OVER w AS second_poorest,
           first_value(c_name)  OVER w AS poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("batch", "window"),
)
def q_wf_nth(spark, sf_dir):
    """E6 extension: nth_value / first_value over a full-partition frame
    (per-nation 2nd-lowest-balance customer) — PARTITIONED window, frame
    spans the whole partition so every row sees the same answer. The
    unique (acctbal, custkey) ordering makes it deterministic."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t.customer.select(
        "c_custkey",
        F.nth_value("c_name", 2).over(w).alias("second_poorest"),
        F.first("c_name").over(w).alias("poorest"),
    )


@register(
    "q_wf_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    anchored AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor
      FROM days
    ),
    runs AS (
      SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS run_len,
             min(d) AS run_start
      FROM anchored GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(sum(run_len) AS BIGINT) AS n_active_days,
           CAST(max(run_len) AS BIGINT) AS longest_streak,
           min(CASE WHEN run_len = mx THEN run_start END) AS best_streak_start
    FROM (SELECT *, max(run_len) OVER (PARTITION BY user_id) AS mx FROM runs) r
    GROUP BY user_id
    """,
    tags=("batch", "window_fn"),
)
def q_wf_streaks(spark, sf_dir):
    """E-ext: longest consecutive-day activity streak per user — the
    retention/engagement metric, and the canonical gaps-and-islands
    window idiom: distinct active dates, then ``date - row_number``
    collapses each consecutive run to a constant anchor, a group-by on
    the anchor measures run lengths, and a per-user max picks the best
    streak (earliest start date as tie-break).

    Scale shape: the distinct collapses events to at most one row per
    (user, day) — the dominant reduction — then every later stage
    (row_number window, two hash aggregates) runs over that compact
    table, all partitioned by user_id so one shuffle's partitioning is
    reused by the window and both aggregates."""
    t = tables(spark, sf_dir)
    days = t.events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    anchored = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    runs = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("run_len"), F.min("d").alias("run_start")
    )
    mxw = Window.partitionBy("user_id")
    r = runs.select(
        "user_id",
        "run_len",
        "run_start",
        F.max("run_len").over(mxw).alias("mx"),
    )
    return r.groupBy("user_id").agg(
        F.sum("run_len").alias("n_active_days"),
        F.max("run_len").alias("longest_streak"),
        F.min(
            F.when(F.col("run_len") == F.col("mx"), F.col("run_start"))
        ).alias("best_streak_start"),
    )
