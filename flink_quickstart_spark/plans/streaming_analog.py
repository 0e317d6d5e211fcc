"""Batch-analog keys for the streaming operator surface (SURVEY.md §2.I).

Reference surface [PK]: the core of a Flink quickstart — event-time
tumbling/sliding/session windows, keyed dedup, count windows, CEP-lite
pattern detection (checkout empty — see SURVEY.md §0).

Spark's ``window``/``session_window`` evaluate identically on batch and
streaming DataFrames, so each key here is the exact batch twin of a
streaming query in ``flink_quickstart_spark/streaming`` — the streaming
tests assert equivalence against these results, and the DuckDB oracle
hash-checks the semantics.

Window starts are emitted as epoch-microsecond bigints: exact integers on
both engines, immune to timestamp-rendering differences. Spark tumbling/
sliding windows align to the 1970 epoch; DuckDB ``time_bucket`` aligns to
2000-01-01 — both are whole multiples of the window sizes used here, so
the grids coincide.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_quickstart_spark.plans.registry import register, tables


@register(
    "q_window_tumbling",
    oracle="""
    SELECT epoch_us(time_bucket(INTERVAL '10 minutes', ts)) AS ws_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("batch", "streaming-analog", "headline"),
)
def q_window_tumbling(spark, sf_dir):
    """I1: event-time tumbling window (Flink
    ``TumblingEventTimeWindows.of(10 min)``) — 10-minute buckets per
    event_type. Streams through the same expression with a watermark."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("ws_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_window_sliding",
    oracle="""
    SELECT ws_us, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS sum_value
    FROM (
      SELECT unnest([epoch_us(time_bucket(INTERVAL '5 minutes', ts)),
                     epoch_us(time_bucket(INTERVAL '5 minutes', ts)) - 300000000]) AS ws_us,
             event_type, value
      FROM events
    )
    GROUP BY ws_us, event_type
    """,
    tags=("batch", "streaming-analog"),
)
def q_window_sliding(spark, sf_dir):
    """I2: sliding window 10min/5min (Flink ``SlidingEventTimeWindows``).
    Each event lands in 2 windows; the oracle materializes both window
    starts per event (the 5-min bucket and the one 5 min earlier)."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("ws_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_window_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) > 300000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + 300000000 AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("batch", "streaming-analog", "headline"),
)
def q_window_session(spark, sf_dir):
    """I3: session window, 5-minute gap (Flink
    ``EventTimeSessionWindows.withGap``). Spark merges events whose gap is
    of at MOST 5 min (an event exactly ``gap`` after the previous one
    MERGES — verified by the boundary property test in
    tests/test_property_session.py); window end = last event + gap. The
    oracle is the gaps-and-islands formulation with the same strict
    ``> gap`` split rule."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_dedup_events",
    oracle="""
    SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
    FROM (SELECT user_id, event_type, event_id, ts,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
    tags=("batch", "streaming-analog"),
)
def q_dedup_events(spark, sf_dir):
    """I6: keyed dedup — first event per (user, type), deterministic
    tie-break. The streaming twin is ``dropDuplicatesWithinWatermark``
    (bounded state); batch uses the row_number=1 idiom because
    ``dropDuplicates`` keeps an arbitrary row."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t.events.select(
            "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "q_count_window",
    oracle="""
    SELECT user_id, CAST((rn - 1) // 20 AS BIGINT) AS block_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM (SELECT user_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
    GROUP BY user_id, block_id
    """,
    tags=("batch", "streaming-analog"),
)
def q_count_window(spark, sf_dir):
    """I10: count window (Flink ``countWindow(20)``) — per-user blocks of
    20 events in event-time order. The streaming twin is a
    transformWithStateInPandas processor in ``streaming/stateful.py``."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t.events.select(
            "user_id", "value", ((F.row_number().over(w) - 1) / 20).cast("long").alias("block_id")
        )
        .groupBy("user_id", "block_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "q_pattern_click_then_purchase",
    oracle="""
    SELECT user_id,
           event_id            AS click_id,
           epoch_us(ts)        AS click_ts_us,
           next_id             AS purchase_id,
           next_ts_us          AS purchase_ts_us
    FROM (SELECT user_id, event_id, ts, event_type,
                 lead(event_type) OVER w AS next_type,
                 lead(event_id)   OVER w AS next_id,
                 lead(epoch_us(ts)) OVER w AS next_ts_us
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    WHERE event_type = 'click' AND next_type = 'purchase'
      AND next_ts_us - epoch_us(ts) <= 600000000
    """,
    tags=("batch", "streaming-analog"),
)
def q_pattern_click_then_purchase(spark, sf_dir):
    """I11: CEP-lite — click immediately followed by a purchase within 10
    minutes, per user (Flink CEP ``next`` + time constraint analog). The
    stateful streaming twin lives in ``streaming/stateful.py``."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    enriched = t.events.select(
        "user_id",
        "event_id",
        "event_type",
        ts_us.alias("ts_us"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("event_id").over(w).alias("next_id"),
        F.lead(ts_us).over(w).alias("next_ts_us"),
    )
    return enriched.where(
        (F.col("event_type") == "click")
        & (F.col("next_type") == "purchase")
        & (F.col("next_ts_us") - F.col("ts_us") <= 600_000_000)
    ).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("click_ts_us"),
        F.col("next_id").alias("purchase_id"),
        F.col("next_ts_us").alias("purchase_ts_us"),
    )


@register(
    "q_upsert_latest",
    oracle="""
    SELECT user_id,
           arg_max(event_type, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                               || lpad(CAST(event_id AS VARCHAR), 10, '0')) AS last_type,
           arg_max(event_id, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                             || lpad(CAST(event_id AS VARCHAR), 10, '0'))   AS last_event_id,
           epoch_us(max(ts))        AS last_ts_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
    tags=("batch", "streaming-analog"),
)
def q_upsert_latest(spark, sf_dir):
    """Upsert / changelog materialization (Flink retract-stream analog,
    Spark streaming ``update``-mode analog): the LATEST state per key —
    via max_by over a zero-padded (epoch_us, event_id) string sort key
    (deterministic under ts ties, portable: DuckDB 1.0 arg_max rejects
    struct ordering keys), a single map-side-combined aggregate. This is
    the batch twin of maintaining a keyed materialized view over a CDC
    stream; at 100 TB it is one shuffle on the key and O(keys) state,
    the cheapest possible formulation (no window sort)."""
    t = tables(spark, sf_dir)
    sort_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )
    return t.events.groupBy("user_id").agg(
        F.max_by("event_type", sort_key).alias("last_type"),
        F.max_by("event_id", sort_key).alias("last_event_id"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_rollup_multires",
    oracle="""
    SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS hour_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS sum_v,
           round(min(value), 4)     AS min_v,
           round(max(value), 4)     AS max_v
    FROM events GROUP BY 1, 2
    """,
    tags=("batch", "streaming-analog"),
)
def q_rollup_multires(spark, sf_dir):
    """Hypertable-style continuous aggregate: raw → 10-min rollup →
    1-hour rollup, where the hour level is computed FROM the 10-min
    level (counts sum, sums sum, min/max merge — all algebraic). The
    oracle computes the hour level directly from raw, so the hash-match
    proves hierarchical re-aggregation is exact. At 100 TB this is the
    materialized-rollup pattern: each resolution reads the previous one
    (1/6th, then 1/60th of the data), not the raw table; the 10-min
    tier would be a stored table updated incrementally by the streaming
    twin of this query."""
    t = tables(spark, sf_dir)
    ten_min = t.events.groupBy(
        F.window("ts", "10 minutes").alias("w10"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    return (
        ten_min.groupBy(
            F.window(F.col("w10.start"), "1 hour").alias("w60"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_v"), 2).alias("sum_v"),
            F.round(F.min("min_v"), 4).alias("min_v"),
            F.round(F.max("max_v"), 4).alias("max_v"),
        )
        .select(
            F.unix_micros("w60.start").alias("hour_us"),
            "event_type",
            "n",
            "sum_v",
            "min_v",
            "max_v",
        )
    )


@register(
    "q_funnel",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view')  AS t_view,
             min(ts) FILTER (WHERE event_type = 'click') AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_view) AS BIGINT) AS n_view,
           CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS n_view_then_click,
           CAST(count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS BIGINT)
             AS n_full_funnel
    FROM stages
    """,
    tags=("batch", "streaming-analog"),
)
def q_funnel(spark, sf_dir):
    """Product-analytics funnel (the composite workload a stream
    processor's users actually run): per user, earliest view/click/
    purchase; count users who progressed view→click→purchase in strict
    event-time order. Two aggregates, both map-side combined; the
    per-user stage table is O(users) regardless of event volume — the
    right shape at 100 TB. Conditional aggregation replaces a 3-way
    self-join (which would be 3 shuffles of the full event table)."""
    t = tables(spark, sf_dir)
    stages = t.events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias(
            "n_view_then_click"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "q_merge_upsert",
    oracle="""
    WITH latest AS (
      SELECT user_id,
             arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                            || lpad(CAST(event_id AS VARCHAR), 10, '0')) AS new_value
      FROM events GROUP BY user_id
    )
    SELECT coalesce(c_custkey, user_id) AS key,
           round(c_acctbal, 2)          AS old_value,
           round(new_value, 2)          AS new_value,
           round(coalesce(new_value, c_acctbal), 2) AS merged,
           CASE WHEN c_custkey IS NULL THEN 'insert'
                WHEN new_value IS NULL THEN 'keep'
                ELSE 'update' END       AS op
    FROM customer FULL OUTER JOIN latest ON c_custkey = user_id
    """,
    tags=("batch", "streaming-analog"),
)
def q_merge_upsert(spark, sf_dir):
    """SCD-1 / MERGE INTO semantics without a transactional table
    format: base (customer) ⊔ change set (latest event value per user)
    as a full-outer join — rows classify as update/insert/keep and the
    merged value is coalesce(new, old). This is the batch formulation of
    a CDC apply step; at 100 TB it is one shuffle of each side on the
    key (or zero with bucketed layouts), and the changelog side is
    usually far smaller — broadcast it when it fits."""
    t = tables(spark, sf_dir)
    sort_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )
    latest = t.events.groupBy("user_id").agg(
        F.max_by("value", sort_key).alias("new_value")
    )
    merged = t.customer.join(
        latest, F.col("c_custkey") == F.col("user_id"), "full_outer"
    )
    return merged.select(
        F.coalesce("c_custkey", "user_id").alias("key"),
        F.round("c_acctbal", 2).alias("old_value"),
        F.round("new_value", 2).alias("new_value"),
        F.round(F.coalesce("new_value", "c_acctbal"), 2).alias("merged"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("new_value").isNull(), "keep")
        .otherwise("update")
        .alias("op"),
    )


@register(
    "q_scd2_history",
    oracle="""
    SELECT user_id,
           event_type   AS state,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        AS valid_to_us
    FROM events
    """,
    tags=("batch", "streaming-analog"),
)
def q_scd2_history(spark, sf_dir):
    """SCD-2 / temporal-table history (the batch twin of Flink's
    versioned temporal tables): each per-key state change becomes a
    validity interval [valid_from, valid_to), open-ended for the current
    state — one lead() window per key, one shuffle. The as-of join
    (q_join_asof) is the lookup side of this same pattern."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t.events.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("valid_to_us"),
    )


@register(
    "q_snapshot_diff",
    oracle="""
    WITH k AS (
      SELECT user_id, event_type, ts,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 10, '0') AS sk
      FROM events
    ),
    s1 AS (SELECT user_id, arg_max(event_type, sk) AS state FROM k
           WHERE ts < TIMESTAMP '2024-01-16' GROUP BY user_id),
    s2 AS (SELECT user_id, arg_max(event_type, sk) AS state FROM k
           GROUP BY user_id)
    SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
           s1.state AS state_before,
           s2.state AS state_after,
           CASE WHEN s1.user_id IS NULL THEN 'added'
                WHEN s1.state <> s2.state THEN 'changed'
                ELSE 'same' END AS diff
    FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
    """,
    tags=("batch", "streaming-analog"),
)
def q_snapshot_diff(spark, sf_dir):
    """Snapshot diff — the audit twin of CDC apply (q_merge_upsert):
    materialize the latest-state view at two points in time (mid-month
    cut vs full range) and classify each key as added/changed/same via a
    full-outer join. At 100 TB both snapshots come from the same scan
    (the t1 aggregate is a filtered twin), diff is one co-partitioned
    join; with bucketed state tables it is shuffle-free."""
    t = tables(spark, sf_dir)
    sk = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )
    cut = F.lit("2024-01-16").cast("timestamp")

    def latest(df):
        return df.groupBy("user_id").agg(F.max_by("event_type", sk).alias("state"))

    s1 = latest(t.events.where(F.col("ts") < cut)).select(
        F.col("user_id").alias("u1"), F.col("state").alias("state_before")
    )
    s2 = latest(t.events).select(
        F.col("user_id").alias("u2"), F.col("state").alias("state_after")
    )
    return s1.join(s2, F.col("u1") == F.col("u2"), "full_outer").select(
        F.coalesce("u1", "u2").alias("user_id"),
        "state_before",
        "state_after",
        F.when(F.col("u1").isNull(), "added")
        .when(F.col("state_before") != F.col("state_after"), "changed")
        .otherwise("same")
        .alias("diff"),
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(floor(epoch_us(min(ts)) / 604800000000) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id,
             f.cohort_week,
             CAST(floor(epoch_us(e.ts) / 604800000000) AS BIGINT) - f.cohort_week
               AS weeks_since
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, weeks_since,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity GROUP BY cohort_week, weeks_since
    """,
    tags=("batch", "streaming-analog"),
)
def q_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix (the second canonical product-analytics
    workload after the funnel): users grouped by first-seen epoch-week,
    counted as active per week-offset since their cohort. Two aggregates
    plus one join on user_id — the cohort table is O(users) and
    broadcastable when small; week ids are epoch-µs integer division so
    both engines bucket identically (no calendar-week ambiguity)."""
    t = tables(spark, sf_dir)
    week = lambda c: F.floor(F.unix_micros(c) / F.lit(604_800_000_000)).cast("long")  # noqa: E731
    firsts = t.events.groupBy("user_id").agg(
        week(F.min("ts")).alias("cohort_week")
    )
    activity = (
        t.events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (week(F.col("ts")) - F.col("cohort_week")).alias("weeks_since"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@register(
    "q_sessionize_gaps_islands",
    # Same independent oracle as q_window_session — two different Spark
    # formulations must agree with one external definition of a session.
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) > 300000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) + 300000000 AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tags=("batch", "streaming-analog"),
)
def q_sessionize_gaps_islands(spark, sf_dir):
    """I3 alternative formulation: gaps-and-islands sessionization with
    lag + running sum of session-break flags — the portable SQL idiom
    (works on any engine; no session_window builtin needed) and the
    fallback when the gap rule is data-dependent (session_window only
    takes static/column gaps). Same 5-min strict-``> gap`` rule as
    q_window_session, so both formulations must hash-match the same
    oracle. All windows are PARTITIONED by user_id — parallel at any
    scale."""
    t = tables(spark, sf_dir)
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = 300_000_000
    flagged = t.events.select(
        "user_id",
        "ts",
        "value",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w_ord) > gap_us,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            (F.unix_micros(F.max("ts")) + F.lit(gap_us)).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .drop("session_id")
        .select(
            "user_id", "session_start_us", "session_end_us", "n_events", "sum_value"
        )
    )


@register(
    "q_window_distinct_users",
    oracle="""
    SELECT epoch_us(time_bucket(INTERVAL '1 day', ts)) AS day_us,
           CAST(count(DISTINCT user_id) AS BIGINT)     AS dau,
           CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN user_id END) AS BIGINT)
             AS purchasing_dau,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
    tags=("batch", "streaming-analog"),
)
def q_window_distinct_users(spark, sf_dir):
    """DAU — distinct users per tumbling day window (+ the conditional
    distinct: purchasers only), the single most common streaming metric.
    Exact COUNT(DISTINCT) expands to Catalyst's two-phase expand+agg;
    the streaming twin replaces it with approx_count_distinct so state
    stays a fixed-size HLL per open window (see q_agg_approxcd's
    contract). Conditional distinct uses the CASE-inside-distinct form
    so both engines dedup the same (window, user) pairs."""
    t = tables(spark, sf_dir)
    day = F.window("ts", "1 day").alias("w")
    return (
        t.events.groupBy(day)
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.countDistinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            ).alias("purchasing_dau"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.unix_micros("w.start").alias("day_us"),
            "dau",
            "purchasing_dau",
            "n_events",
        )
    )


@register(
    "q_window_topk_types",
    oracle="""
    SELECT ws_us, event_type, n_events, rk FROM (
      SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us,
             event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(row_number() OVER (
               PARTITION BY time_bucket(INTERVAL '1 hour', ts)
               ORDER BY count(*) DESC, event_type) AS BIGINT) AS rk
      FROM events
      GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
    ) WHERE rk <= 3
    """,
    tags=("batch", "streaming-analog", "window"),
)
def q_window_topk_types(spark, sf_dir):
    """I-ext: trending-now — top-3 event types per tumbling hour. The
    canonical two-stage streaming leaderboard: windowed count agg (one
    shuffle on (window, type), partial+final), then a rank window
    partitioned BY THE TIME WINDOW — parallel across windows, never a
    global sort. Deterministic tie-break on event_type.

    At 100 TB the rank stage's per-window group is |event_type| rows
    (small by construction after the agg), so the heavy lifting stays
    in the map-side-combined count; this is the shape to reach for
    instead of a global top-k whenever 'top per time slice' is the real
    question."""
    t = tables(spark, sf_dir)
    counts = t.events.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    rankw = Window.partitionBy("w").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rk", F.row_number().over(rankw).cast("long"))
        .where(F.col("rk") <= 3)
        .select(
            F.unix_micros("w.start").alias("ws_us"),
            "event_type",
            "n_events",
            "rk",
        )
    )


@register(
    "q_window_ohlc",
    oracle="""
    WITH keyed AS (
      SELECT event_type, ts, value,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 12, '0') AS arrival_key
      FROM events
    )
    SELECT event_type,
           epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us,
           round(arg_min(value, arrival_key), 2) AS open,
           round(max(value), 2)                  AS high,
           round(min(value), 2)                  AS low,
           round(arg_max(value, arrival_key), 2) AS close,
           CAST(count(*) AS BIGINT)              AS n_events
    FROM keyed
    GROUP BY event_type, time_bucket(INTERVAL '1 hour', ts)
    """,
    tags=("batch", "streaming-analog", "timeseries"),
)
def q_window_ohlc(spark, sf_dir):
    """I-ext: OHLC bars — the canonical market-data downsample (open /
    high / low / close per key per hour), equally the shape of any
    'first/last/extremes per window' rollup. Open and close are
    struct-ordered min/max aggregates over (ts, event_id, value) — one
    hash aggregation, partial+final, NO window function and NO
    per-window sort; ties at the same microsecond break
    deterministically on event_id on both engines (DuckDB arg_min/
    arg_max over the [ts, id] list key)."""
    t = tables(spark, sf_dir)
    key = F.struct(
        F.unix_micros("ts").alias("t"),
        F.col("event_id").alias("i"),
        F.col("value").alias("v"),
    )
    return (
        t.events.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.round(F.min(key).getField("v"), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max(key).getField("v"), 2).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.unix_micros("w.start").alias("ws_us"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


@register(
    "q_window_rate_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_windows,
             avg(CAST(n AS DOUBLE)) AS mu,
             sqrt(avg(CAST(n AS DOUBLE) * n) - avg(CAST(n AS DOUBLE))
                  * avg(CAST(n AS DOUBLE))) AS sigma
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, h.ws_us, h.n,
           round((h.n - m.mu) / m.sigma, 6) AS zscore
    FROM hourly h JOIN m ON h.event_type = m.event_type
    WHERE m.n_windows >= 24 AND m.sigma > 0
      AND (h.n - m.mu) / m.sigma > 3.0
    """,
    tags=("batch", "streaming-analog"),
)
def q_window_rate_anomaly(spark, sf_dir):
    """I-ext: traffic-rate anomaly detection — the ops-monitoring
    staple: bucket events into tumbling hours per type, fit the
    per-type rate distribution (mean/σ from explicit raw moments), and
    emit the hours whose count sits more than 3σ above the mean. The
    streaming twin keeps the per-type running moments in keyed state
    and scores each closing window against them.

    Scale shape: the hourly rollup is the big reduction (one hash
    aggregate over (type, hour)); the moment fit runs over the rollup
    (O(types × hours) rows), and the score join is broadcast-sized on
    the per-type moment table. Types with <24 observed windows are
    excluded (no meaningful fit)."""
    t = tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.window("ts", "1 hour").alias("w")
    ).agg(F.count(F.lit(1)).alias("n"))
    hourly = hourly.select(
        "event_type", F.unix_micros("w.start").alias("ws_us"), "n"
    )
    nd = F.col("n").cast("double")
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.avg(nd).alias("mu"),
        F.sqrt(F.avg(nd * nd) - F.avg(nd) * F.avg(nd)).alias("sigma"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        hourly.join(F.broadcast(m), "event_type")
        .where((F.col("n_windows") >= 24) & (F.col("sigma") > 0) & (z > 3.0))
        .select("event_type", "ws_us", "n", F.round(z, 6).alias("zscore"))
    )


@register(
    "q_pattern_timeout",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_us
      FROM events
    )
    SELECT user_id, event_id, ts_us,
           CASE WHEN next_us IS NULL THEN -1
                ELSE next_us - ts_us END AS gap_us
    FROM seq
    WHERE event_type = 'click'
      AND (next_us IS NULL OR next_us - ts_us > 3600000000)
    """,
    tags=("batch", "streaming-analog", "cep"),
)
def q_pattern_timeout(spark, sf_dir):
    """I11b: CEP timeout / absence pattern — clicks followed by NOTHING
    from the same user within one hour (abandonment, stalled funnel,
    dead-session detection). In Flink this is the timer branch of a
    KeyedProcessFunction: register click_ts + 1h, fire if no event
    arrives first; the batch analog is a per-key lead() — the very next
    event's timestamp, whatever its type — with the gap test as a
    filter. gap_us = -1 encodes "no later event at all" (end-of-stream
    timeout), keeping the column non-null for hashing.

    Scale shape: one shuffle on user_id for the sequence window, then a
    narrow filter — same cost as any per-key ordering; no join against
    the future needed. The streaming twin lives in streaming/timers.py
    (event-time timers over transformWithStateInPandas)."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    return (
        seq.where(
            (F.col("event_type") == "click")
            & (
                F.col("next_us").isNull()
                | (F.col("next_us") - F.col("ts_us") > 3600000000)
            )
        )
        .select(
            "user_id",
            "event_id",
            "ts_us",
            F.when(F.col("next_us").isNull(), F.lit(-1).cast("long"))
            .otherwise(F.col("next_us") - F.col("ts_us"))
            .alias("gap_us"),
        )
    )


@register(
    "q_session_stats",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    marked AS (
      SELECT user_id, ts_us, event_id,
             CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END
               AS is_start
      FROM seq
    ),
    sessions AS (
      SELECT user_id,
             sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING) AS session_no,
             ts_us
      FROM marked
    ),
    per_session AS (
      SELECT user_id, session_no,
             CAST(count(*) AS BIGINT) AS n_events,
             max(ts_us) - min(ts_us) AS dur_us
      FROM sessions GROUP BY user_id, session_no
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounce,
           round(avg(CAST(n_events AS DOUBLE)), 6) AS avg_events,
           CAST(max(n_events) AS BIGINT) AS max_events,
           round(avg(CAST(dur_us AS DOUBLE)) / 1000000.0, 6)
             AS avg_dur_s
    FROM per_session GROUP BY user_id
    """,
    tags=("batch", "streaming-analog"),
)
def q_session_stats(spark, sf_dir):
    """I3b: per-user session QUALITY rollup — sessionize with a 30-min
    inactivity gap (the lag-then-running-sum gaps-and-islands form, the
    portable twin of F.session_window), then the engagement report:
    session count, bounce count (single-event sessions), mean/max
    events per session, mean duration. This is the aggregate the
    session window feeds in every product-analytics pipeline.

    Scale shape: one shuffle on user_id serves the lag window, the
    running session counter, and BOTH aggregates — four stages, one
    partitioning; nothing global anywhere. Session durations use exact
    integer epoch-microsecond arithmetic until the final rounding."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    )
    marked = seq.select(
        "user_id",
        "ts_us",
        "event_id",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") > 1800000000),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    runw = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.select(
        "user_id",
        F.sum("is_start").over(runw).alias("session_no"),
        "ts_us",
    )
    per_session = sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
            "n_bounce"
        ),
        F.round(F.avg(F.col("n_events").cast("double")), 6).alias(
            "avg_events"
        ),
        F.max("n_events").alias("max_events"),
        F.round(
            F.avg(F.col("dur_us").cast("double")) / 1000000.0, 6
        ).alias("avg_dur_s"),
    )


@register(
    "q_agg_stickiness",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM active),
    mau AS (
      SELECT days.d,
             CAST(count(DISTINCT a.user_id) AS BIGINT) AS mau
      FROM days JOIN active a
        ON a.d <= days.d AND a.d > days.d - 28
      GROUP BY days.d
    ),
    dau AS (
      SELECT d, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY d
    )
    SELECT CAST(dau.d AS VARCHAR) AS day,
           dau.dau, mau.mau,
           round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
    FROM dau JOIN mau ON dau.d = mau.d
    """,
    tags=("batch", "streaming-analog"),
)
def q_agg_stickiness(spark, sf_dir):
    """I-ext: DAU/MAU stickiness — daily actives over trailing-28-day
    monthly actives, the canonical engagement ratio. Exact trailing
    COUNT(DISTINCT) over a sliding range is the expensive part; it
    runs over the COMPACTED activity table (distinct user-days — the
    dominant reduction) joined to the day grid with a 28-day band, so
    the widest intermediate is activity × 28, bounded by the rollup
    size, never by raw events.

    Scale shape: distinct user-days first (one shuffle), then each
    activity row EXPLODES to the <= 28 grid days it counts toward
    (sequence + explode — a constant-factor row expansion that keeps
    the join an EQUI-join on the grid day, never a range-predicate
    nested loop), a semi-join restricts the grid to observed days, and
    the distinct count per grid day is the standard expand + two-phase
    aggregate. The streaming twin maintains a 28-slot HLL ring per day
    (q_agg_hll_rollup's merge path)."""
    t = tables(spark, sf_dir)
    active = t.events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    days = active.select("d").distinct().withColumnRenamed("d", "grid_d")
    attributed = active.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 27))
        ).alias("grid_d"),
    )
    mau = (
        attributed.join(days, "grid_d", "left_semi")
        .groupBy("grid_d")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    dau = active.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(mau, dau.d == mau.grid_d)
        .select(
            F.col("d").cast("string").alias("day"),
            "dau",
            "mau",
            F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
    )


@register(
    "q_pattern_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    outdeg AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS total
      FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n,
           round(CAST(t.n AS DOUBLE) / o.total, 6) AS p
    FROM trans t JOIN outdeg o ON t.from_type = o.from_type
    """,
    tags=("batch", "streaming-analog", "cep"),
)
def q_pattern_transitions(spark, sf_dir):
    """I11c: first-order behavior transition matrix — for every ordered
    pair of event types, how often does B directly follow A within a
    user's timeline, and with what conditional probability? The Markov
    chain the CEP patterns (q_pattern_click_then_purchase,
    q_pattern_timeout) are hand-picked cells of; the full matrix is
    what funnel designers and anomaly baselines start from.

    Scale shape: one lead() window on the user_id partitioning, a hash
    aggregate onto the O(#types^2) matrix, and the row-normalization
    join runs on that constant-size table."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    outdeg = trans.groupBy("from_type").agg(F.sum("n").alias("total"))
    return (
        trans.join(F.broadcast(outdeg), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "p"
            ),
        )
    )
