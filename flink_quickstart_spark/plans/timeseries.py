"""Time-series query keys (SURVEY.md §2.K9 — the declared stretch row).

Reference surface [PK]: keyed event-time processing over sensor-style
streams is the Flink quickstart's home turf (checkout empty — SURVEY.md
§0); the similarity tier follows the public subsequence-matching
literature (z-normalized Euclidean distance, cf. PAPERS.md time-series
entry).

``q_ts_features`` is the JVM-side feature-extraction tier: windowed
statistics including least-squares slope and correlation against time,
all built-in aggregates (partial+final, map-side combined). The time
regressor is epoch seconds computed identically on both engines as
``epoch_us(ts)/1e6`` so slope magnitudes are human-scale and survive
6-decimal rounding.

``q_ts_znorm_match`` is the shape tier over
``operators.timeseries.sliding_znorm_distance`` — NumPy strided windows
per key via ``applyInPandas``. Fully sql-oracled since round 3 (the
DuckDB twin recomputes the z-normalized distances with window
aggregates); a NumPy-reference equivalence test in
tests/test_timeseries.py additionally pins the operator itself.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_quickstart_spark.operators.timeseries import sliding_znorm_distance
from flink_quickstart_spark.plans.registry import register, tables

# Fixed query shape for the znorm match key: rise-then-fall pulse.
ZNORM_PATTERN = [0.0, 1.0, 2.0, 3.0, 2.0, 1.0, 0.0, -1.0]


@register(
    "q_ts_features",
    oracle="""
    SELECT user_id,
           epoch_us(time_bucket(INTERVAL '1 day', ts)) AS ws_us,
           CAST(count(*) AS BIGINT)                          AS n,
           round(avg(value), 4)                              AS mean_v,
           round(stddev_pop(value), 4)                       AS std_v,
           round(min(value), 4)                              AS min_v,
           round(max(value), 4)                              AS max_v,
           round(regr_slope(value, epoch_us(ts) / 1000000.0), 6) AS slope,
           round(corr(value, epoch_us(ts) / 1000000.0), 4)   AS corr_vt
    FROM events
    GROUP BY 1, 2
    HAVING count(*) >= 3
    """,
    tags=("batch", "timeseries"),
)
def q_ts_features(spark, sf_dir):
    """K9 feature tier: per (user, 1-day window) statistical features —
    mean/std/extremes plus least-squares slope and correlation of value
    against time. Everything is a built-in aggregate: one shuffle on
    (user, window), partial aggregation before it, whole plan in
    codegen. The n>=3 guard keeps corr/slope well-defined on both
    engines; day buckets match the testdata's event density (~2 events
    per user-day). Both engines' day grids align to midnight UTC."""
    t = tables(spark, sf_dir)
    sec = F.unix_micros("ts") / F.lit(1000000.0)
    return (
        t.events.groupBy(
            "user_id", F.window("ts", "1 day").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("mean_v"),
            F.round(F.stddev_pop("value"), 4).alias("std_v"),
            F.round(F.min("value"), 4).alias("min_v"),
            F.round(F.max("value"), 4).alias("max_v"),
            F.round(F.regr_slope(F.col("value"), sec), 6).alias("slope"),
            F.round(F.corr(F.col("value"), sec), 4).alias("corr_vt"),
        )
        .where(F.col("n") >= 3)
        .select(
            "user_id",
            F.unix_micros("w.start").alias("ws_us"),
            "n",
            "mean_v",
            "std_v",
            "min_v",
            "max_v",
            "slope",
            "corr_vt",
        )
    )


# ZNORM_PATTERN z-normalized (mean 0, population std 1), as exact double
# literals shared by the DuckDB oracle below.
_Q_LIT = "[-0.8164965809277261, 0.0, 0.8164965809277261, 1.6329931618554523, 0.8164965809277261, 0.0, -0.8164965809277261, -1.6329931618554523]"


@register(
    "q_ts_znorm_match",
    # The oracle recomputes the full distance profile relationally:
    # length-8 list windows via a ROWS frame, z-norm + distance via list
    # lambdas against the same normalized pattern literal. Verified 0
    # mismatches over all 8 950 windows at sf0.01 — the NumPy kernel is
    # value-checked by an independent engine, not just by its own
    # reference implementation.
    oracle=f"""
    WITH ordered AS (
      SELECT user_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, value
                               ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, value) - 1 AS win_pos
      FROM events
    ), wins AS (
      SELECT user_id, win_pos, w FROM ordered WHERE len(w) = 8
    ), stats AS (
      SELECT user_id, win_pos, w, list_avg(w) AS mu,
             sqrt(list_avg(list_transform(w, x -> (x - list_avg(w))^2))) AS sd
      FROM wins
    )
    SELECT user_id, win_pos,
           round(sqrt(list_sum(list_transform(list_zip(
             list_transform(w, x -> CASE WHEN sd = 0 THEN 0.0 ELSE (x - mu) / sd END),
             {_Q_LIT}), p -> (p[1] - p[2])^2))), 6) AS dist
    FROM stats
    """,
    tags=("batch", "timeseries", "pandas-udf"),
)
def q_ts_znorm_match(spark, sf_dir):
    """K9 shape tier: the full z-normalized distance profile between a
    fixed pulse pattern and every sliding window of each user's series
    (UCR-style subsequence search). One shuffle on user_id; per-key work
    is one vectorized NumPy pass over Arrow batches. Top-k selection
    (``best_match_per_key``) is layered on this profile and tested in
    tests/test_timeseries.py — the key emits the whole profile so the
    oracle compares every window, not a tie-sensitive top-3."""
    t = tables(spark, sf_dir)
    dists = sliding_znorm_distance(
        t.events, ZNORM_PATTERN, key_col="user_id", ts_col="ts", value_col="value"
    )
    return dists.select(
        F.col("key").alias("user_id"),
        "win_pos",
        F.round("dist", 6).alias("dist"),
    )


@register(
    "q_ts_znorm_topk",
    # Selection runs on the ROUNDED distance on BOTH sides (the rounded
    # values are proven identical by q_ts_znorm_match's hash match;
    # full-precision order could disagree across engines inside a
    # 1e-6 tie), tiebreak win_pos — fully deterministic top-3.
    oracle=f"""
    WITH ordered AS (
      SELECT user_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, value
                               ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, value) - 1 AS win_pos
      FROM events
    ), wins AS (
      SELECT user_id, win_pos, w FROM ordered WHERE len(w) = 8
    ), stats AS (
      SELECT user_id, win_pos, w, list_avg(w) AS mu,
             sqrt(list_avg(list_transform(w, x -> (x - list_avg(w))^2))) AS sd
      FROM wins
    ), dists AS (
      SELECT user_id, win_pos,
             round(sqrt(list_sum(list_transform(list_zip(
               list_transform(w, x -> CASE WHEN sd = 0 THEN 0.0 ELSE (x - mu) / sd END),
               {_Q_LIT}), p -> (p[1] - p[2])^2))), 6) AS dist
      FROM stats
    )
    SELECT user_id, win_pos, dist FROM dists
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY dist, win_pos) <= 3
    """,
    tags=("batch", "timeseries", "pandas-udf"),
)
def q_ts_znorm_topk(spark, sf_dir):
    """K9 selection tier (r9 — closes the last undeclared SURVEY §2
    row): top-3 best-matching windows per user for the fixed pulse
    pattern — the UCR-style "where does this shape occur" query a
    monitoring pipeline actually asks, layered on the full distance
    profile of q_ts_znorm_match via operators/timeseries.
    best_match_per_key (row_number ≤ k over (dist, win_pos) —
    WindowGroupLimit pushes the per-key limit below the sort at scale,
    so no key materializes its whole profile in the window buffer).
    Selection compares ROUNDED distances (identical across engines,
    proven by the profile key's hash match) with a win_pos tiebreak, so
    the top-3 is deterministic on both sides."""
    from flink_quickstart_spark.operators.timeseries import best_match_per_key

    t = tables(spark, sf_dir)
    dists = sliding_znorm_distance(
        t.events, ZNORM_PATTERN, key_col="user_id", ts_col="ts", value_col="value"
    ).withColumn("dist", F.round("dist", 6))
    return best_match_per_key(dists, k=3).select(
        F.col("key").alias("user_id"), "win_pos", "dist"
    )


@register(
    "q_ts_ffill",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS last_purchase_value
    FROM events
    """,
    tags=("batch", "timeseries"),
)
def q_ts_ffill(spark, sf_dir):
    """Forward-fill (the time-series gap-fill staple): carry each user's
    most recent purchase value forward across their event timeline —
    ``last(col, ignorenulls=True)`` over a running per-key frame. The
    window is PARTITIONED by user_id (thousands of groups), so the sort
    is per-key and parallel — the scale-safe sessionized-state shape, and
    the batch analog of keyed ValueState lookup in a Flink process
    function."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return t.events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 2).alias(
            "last_purchase_value"
        ),
    )


@register(
    "q_ts_resample_interp",
    oracle="""
    WITH e AS (SELECT user_id, ts, value,
                      lead(ts)    OVER w AS t1,
                      lead(value) OVER w AS v1
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    seg AS (SELECT user_id, ts AS t0, value AS v0, t1, v1 FROM e
            WHERE t1 IS NOT NULL AND t1 > ts
              AND date_trunc('day', ts) + INTERVAL 1 DAY <= date_trunc('day', t1)),
    ticks AS (SELECT user_id, t0, v0, t1, v1,
                     unnest(generate_series(date_trunc('day', t0) + INTERVAL 1 DAY,
                                            date_trunc('day', t1),
                                            INTERVAL 1 DAY)) AS tick
              FROM seg)
    SELECT user_id, epoch_us(tick) AS tick_us,
           round(v0 + (v1 - v0)
                 * (CAST(epoch_us(tick) - epoch_us(t0) AS DOUBLE)
                    / CAST(epoch_us(t1) - epoch_us(t0) AS DOUBLE)), 6) AS value
    FROM ticks
    """,
    tags=("batch", "timeseries"),
)
def q_ts_resample_interp(spark, sf_dir):
    """TS-ext: resample each user's irregular event series onto a daily
    grid with LINEAR INTERPOLATION between neighboring observations (the
    companion to q_ts_ffill's step-function fill; what monitoring /
    feature stores call gap-filling with interp).

    Shape: one partitioned lead() window builds consecutive-observation
    segments; ``sequence()`` explodes each segment into its covered
    day-aligned ticks; the interpolation itself is arithmetic on epoch
    microseconds. Work is proportional to segments × covered ticks, all
    partition-local after one shuffle on user_id — no global sort, no
    Python. Zero-length segments (duplicate timestamps) drop out before
    the explode, so the division is always well-defined."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = t.events.select(
        "user_id",
        "ts",
        "value",
        F.lead("ts").over(w).alias("t1"),
        F.lead("value").over(w).alias("v1"),
    )
    day = "INTERVAL 1 DAY"
    seg = (
        e.where(F.col("t1").isNotNull() & (F.col("t1") > F.col("ts")))
        .select(
            "user_id",
            F.col("ts").alias("t0"),
            F.col("value").alias("v0"),
            "t1",
            "v1",
        )
        .where(
            F.expr(f"date_trunc('DAY', t0) + {day}")
            <= F.expr("date_trunc('DAY', t1)")
        )
    )
    ticks = seg.select(
        "user_id",
        "t0",
        "v0",
        "t1",
        "v1",
        F.explode(
            F.expr(
                f"sequence(date_trunc('DAY', t0) + {day}, "
                f"date_trunc('DAY', t1), {day})"
            )
        ).alias("tick"),
    )
    frac = (
        (F.unix_micros("tick") - F.unix_micros("t0")).cast("double")
        / (F.unix_micros("t1") - F.unix_micros("t0")).cast("double")
    )
    return ticks.select(
        "user_id",
        F.unix_micros("tick").alias("tick_us"),
        F.round(F.col("v0") + (F.col("v1") - F.col("v0")) * frac, 6).alias("value"),
    )


# Truncated-EWMA weights: (1-alpha)^k for alpha=0.3, k=0..7, written as
# exact literals so Spark and the oracle build bit-identical doubles.
_EWMA_W = (1.0, 0.7, 0.49, 0.343, 0.2401, 0.16807, 0.117649, 0.0823543)


def _ewma_oracle() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {k}) OVER w, 0.0) * {w!r}"
        for k, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0.0 ELSE {w!r} END)"
        for k, w in enumerate(_EWMA_W)
    )
    return f"""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           round(value, 2) AS value,
           round(({num}) / ({den}), 4) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register(
    "q_ts_ewma",
    oracle=_ewma_oracle(),
    tags=("batch", "timeseries", "window"),
)
def q_ts_ewma(spark, sf_dir):
    """TS-ext: trailing exponentially-weighted moving average per key —
    the smoothing primitive of monitoring/anomaly pipelines. True EWMA
    is a per-row recursion (unbounded memory of the past); this is the
    standard truncated-FIR form: 8 taps of (1-α)^k (α=0.3, weight
    beyond tap 8 < 6% of mass), normalized over the taps present so
    series heads are unbiased (pandas ``ewm(adjust=True)`` semantics,
    truncated).

    Scale shape: one window over (user_id, ts) — a single shuffle, no
    recursion, no UDF; each tap is a ``lag`` read from the already-
    sorted frame. The weighted sum is written as one left-associated
    double expression with literal weights so both engines produce
    bit-identical doubles before the 4-decimal round."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", k).over(w) for k in range(len(_EWMA_W))]
    num = None
    den = None
    for lagc, wt in zip(lags, _EWMA_W):
        term = F.coalesce(lagc, F.lit(0.0)) * F.lit(wt)
        wterm = F.when(lagc.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        num = term if num is None else num + term
        den = wterm if den is None else den + wterm
    return t.events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("value", 2).alias("value"),
        F.round(num / den, 4).alias("ewma"),
    )


@register(
    "q_ts_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT user_id, median(value) AS med
      FROM events GROUP BY user_id
    ),
    dev AS (
      SELECT e.user_id, e.event_id, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.user_id = m.user_id
    ),
    mad AS (
      SELECT user_id, median(adev) AS mad FROM dev GROUP BY user_id
    )
    SELECT d.user_id, d.event_id, round(d.value, 2) AS value,
           round(d.med, 4) AS med, round(m.mad, 4) AS mad,
           CAST(abs(d.value - d.med) > 3 * 1.4826 * m.mad AS BOOLEAN)
             AS is_outlier
    FROM dev d JOIN mad m ON d.user_id = m.user_id
    WHERE m.mad > 0
    """,
    tags=("batch", "timeseries", "agg"),
)
def q_ts_outlier_mad(spark, sf_dir):
    """TS-ext: robust outlier flagging via Median Absolute Deviation —
    the monitoring-pipeline alternative to z-scores that a single spike
    cannot poison (breakdown point 50% vs 0%). Two grouped exact-median
    passes (per-key median, then median of absolute deviations) and a
    3·1.4826·MAD cut (1.4826 scales MAD to σ under normality).

    Scale shape: two shuffles on user_id (medians) + the deviations
    join — all exact `percentile(0.5)`; at extreme cardinality swap in
    `approx_percentile` per the q_agg_approx_percentile contract. The
    mad > 0 guard drops keys whose majority value is constant, where
    the MAD cut is undefined (division-free form keeps it a multiply)."""
    t = tables(spark, sf_dir)
    med = t.events.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = t.events.join(med, "user_id").select(
        "user_id",
        "event_id",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .where(F.col("mad") > 0)
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            (
                F.abs(F.col("value") - F.col("med"))
                > 3 * 1.4826 * F.col("mad")
            ).alias("is_outlier"),
        )
    )


@register(
    "q_ts_lateness",
    oracle="""
    WITH arr AS (
      SELECT event_type, ts,
             max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS high_water
      FROM events
    ),
    late AS (
      SELECT event_type,
             epoch_us(high_water) - epoch_us(ts) AS late_us
      FROM arr
    ),
    ranked AS (
      SELECT event_type, late_us,
             row_number() OVER (PARTITION BY event_type ORDER BY late_us) AS rn,
             count(*)    OVER (PARTITION BY event_type) AS n
      FROM late
    )
    SELECT event_type,
           CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(min(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                         THEN late_us END) AS BIGINT) AS p95_late_us,
           CAST(max(late_us) AS BIGINT) AS max_late_us
    FROM ranked
    GROUP BY event_type
    """,
    tags=("batch", "timeseries", "streaming-analog"),
)
def q_ts_lateness(spark, sf_dir):
    """TS/I4-ext: out-of-orderness quantification — THE design input for
    a watermark bound. Arrival order is the append sequence (event_id);
    each event's lateness = running max event-time at its arrival minus
    its own event-time (0 for in-order arrivals). Per type: how many
    events arrived late, the p95 lateness (discrete value-at-rank, same
    convention as q_agg_quantile_rollup), and the worst case. A
    ``withWatermark(ts, p95_late)`` bound then provably admits ≥95% of
    events; max shows the tail you'd drop.

    Scale shape: two windows over the same (event_type, order) shuffle —
    partition-parallel, no global sort; exactly the profile job to run
    on a sample before fixing a production watermark."""
    t = tables(spark, sf_dir)
    arrw = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = t.events.select(
        "event_type",
        (
            F.unix_micros(F.max("ts").over(arrw)) - F.unix_micros("ts")
        ).alias("late_us"),
    )
    rw = Window.partitionBy("event_type").orderBy("late_us")
    ranked = late.select(
        "event_type",
        "late_us",
        F.row_number().over(rw).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0)).alias("n_late"),
        F.min(
            F.when(F.col("rn") == F.ceil(0.95 * F.col("n")), F.col("late_us"))
        ).cast("long").alias("p95_late_us"),
        F.max("late_us").alias("max_late_us"),
    )


@register(
    "q_ts_autocorr",
    oracle="""
    WITH paired AS (
      SELECT user_id, value AS x,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
      FROM events
    ),
    p AS (SELECT user_id, x, y FROM paired WHERE y IS NOT NULL),
    m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             avg(x) AS mx, avg(y) AS my,
             avg(x * y) AS mxy, avg(x * x) AS mxx, avg(y * y) AS myy
      FROM p GROUP BY user_id
    )
    SELECT user_id, n,
           round((mxy - mx * my)
                 / sqrt((mxx - mx * mx) * (myy - my * my)), 6) AS acf1
    FROM m
    WHERE n >= 10 AND (mxx - mx * mx) * (myy - my * my) > 0
    """,
    tags=("batch", "timeseries"),
)
def q_ts_autocorr(spark, sf_dir):
    """TS-ext: lag-1 autocorrelation per key — the memory/seasonality
    probe (near 0 = white noise, positive = trending/sticky metric,
    negative = oscillating). Pairs each value with its predecessor via
    one lag window, then Pearson r from EXPLICIT raw moments
    (E[xy]−E[x]E[y] over the product of standard deviations) — the
    corr() built-ins agree across engines only up to sample/population
    conventions, so the formula is written out once and identically.

    Scale shape: one shuffle on user_id for the lag window, then a
    grouped moment aggregate — partial+final, map-side combined. Keys
    with n<10 pairs or zero variance are excluded (r undefined)."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paired = t.events.select(
        "user_id",
        F.col("value").alias("x"),
        F.lag("value").over(w).alias("y"),
    ).where(F.col("y").isNotNull())
    m = paired.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    varx = F.col("mxx") - F.col("mx") * F.col("mx")
    vary = F.col("myy") - F.col("my") * F.col("my")
    cov = F.col("mxy") - F.col("mx") * F.col("my")
    return (
        m.where((F.col("n") >= 10) & (varx * vary > 0))
        .select(
            "user_id",
            "n",
            F.round(cov / F.sqrt(varx * vary), 6).alias("acf1"),
        )
    )


@register(
    "q_ts_cusum",
    oracle="""
    WITH m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             avg(value) AS mu,
             sqrt(avg(value * value) - avg(value) * avg(value)) AS sigma
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT e.user_id, m.n, e.event_id,
             round(abs(sum((e.value - m.mu) / m.sigma) OVER (
               PARTITION BY e.user_id ORDER BY e.ts, e.event_id
               ROWS UNBOUNDED PRECEDING)), 6) AS cusum_abs
      FROM events e JOIN m ON e.user_id = m.user_id
      WHERE m.n >= 20 AND m.sigma > 0
    ),
    mx AS (
      SELECT user_id, n, max(cusum_abs) AS max_cusum
      FROM s GROUP BY user_id, n
    )
    SELECT s.user_id, mx.n, mx.max_cusum,
           CAST(min(s.event_id) AS BIGINT) AS at_event_id
    FROM s JOIN mx
      ON s.user_id = mx.user_id AND s.cusum_abs = mx.max_cusum
    GROUP BY s.user_id, mx.n, mx.max_cusum
    """,
    tags=("batch", "timeseries"),
)
def q_ts_cusum(spark, sf_dir):
    """TS-ext: CUSUM changepoint score per key — the classic mean-shift
    detector: the running sum of standardized deviations from the key
    mean drifts away from zero exactly when the level shifts, and the
    location of max |S_i| is the change-point estimate. Mean and sigma
    come from explicit raw moments (population sqrt(E[x^2]-E[x]^2),
    written identically on both engines); the running sum accumulates in
    the SAME defined order (ts, event_id) on both, and the score is
    rounded to 6 decimals BEFORE the argmax so near-tie resolution is
    engine-stable, with min(event_id) as the final tie-break.

    Scale shape: two shuffles on user_id — one hash aggregate for the
    moments (joined back broadcast-side since the moment table is one
    row per key), one ordered window for the running sum. The argmax is
    a per-key max plus a self-equi-join on the (tiny) per-key max table.
    Keys with n<20 or zero variance excluded (score undefined)."""
    t = tables(spark, sf_dir)
    m = t.events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mu"),
        F.sqrt(
            F.avg(F.col("value") * F.col("value"))
            - F.avg("value") * F.avg("value")
        ).alias("sigma"),
    )
    joined = (
        t.events.alias("e")
        .join(m.alias("m"), "user_id")
        .where((F.col("m.n") >= 20) & (F.col("m.sigma") > 0))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = joined.select(
        "user_id",
        F.col("m.n").alias("n"),
        "event_id",
        F.round(
            F.abs(
                F.sum((F.col("value") - F.col("mu")) / F.col("sigma")).over(w)
            ),
            6,
        ).alias("cusum_abs"),
    )
    mx = (
        s.groupBy("user_id", "n")
        .agg(F.max("cusum_abs").alias("max_cusum"))
        .withColumnRenamed("user_id", "mx_user_id")
        .withColumnRenamed("n", "mx_n")
    )
    return (
        s.alias("s")
        .join(
            mx.alias("mx"),
            (F.col("s.user_id") == F.col("mx.mx_user_id"))
            & (F.col("s.cusum_abs") == F.col("mx.max_cusum")),
        )
        .groupBy(
            F.col("s.user_id").alias("user_id"),
            F.col("mx.mx_n").alias("n"),
            F.col("mx.max_cusum").alias("max_cusum"),
        )
        .agg(F.min("s.event_id").alias("at_event_id"))
    )


@register(
    "q_ts_seasonal_profile",
    oracle="""
    WITH hourly AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, hr, n,
             max(n) OVER (PARTITION BY event_type) AS peak_n,
             min(n) OVER (PARTITION BY event_type) AS trough_n
      FROM hourly
    )
    SELECT event_type,
           CAST(min(CASE WHEN n = peak_n THEN hr END) AS BIGINT)
             AS peak_hour,
           CAST(min(CASE WHEN n = trough_n THEN hr END) AS BIGINT)
             AS trough_hour,
           CAST(max(peak_n) AS BIGINT) AS peak_n,
           CAST(max(trough_n) AS BIGINT) AS trough_n,
           round(CAST(max(peak_n) AS DOUBLE) / max(trough_n), 6)
             AS peak_trough_ratio
    FROM ranked GROUP BY event_type
    """,
    tags=("batch", "timeseries"),
)
def q_ts_seasonal_profile(spark, sf_dir):
    """TS-ext: hour-of-day seasonality profile per stream — the shape
    check behind capacity planning and anomaly thresholds: event counts
    folded onto the 24-hour clock, then the peak hour, trough hour
    (earliest hour as tie-break) and peak/trough amplitude ratio per
    type. A ratio near 1 means no diurnal pattern; large ratios say
    the anomaly detector (q_window_rate_anomaly) needs hour-conditioned
    baselines.

    Scale shape: one hash aggregate folds any number of rows onto
    (type, 24 hours); the argmax/argmin run as windows over that
    constant-size profile table. Single data pass."""
    t = tables(spark, sf_dir)
    hourly = t.events.groupBy(
        "event_type", F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    ranked = hourly.select(
        "event_type",
        "hr",
        "n",
        F.max("n").over(w).alias("peak_n"),
        F.min("n").over(w).alias("trough_n"),
    )
    return ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("n") == F.col("peak_n"), F.col("hr")))
        .cast("long")
        .alias("peak_hour"),
        F.min(F.when(F.col("n") == F.col("trough_n"), F.col("hr")))
        .cast("long")
        .alias("trough_hour"),
        F.max("peak_n").alias("peak_n"),
        F.max("trough_n").alias("trough_n"),
        F.round(
            F.max("peak_n").cast("double") / F.max("trough_n"), 6
        ).alias("peak_trough_ratio"),
    )


@register(
    "q_ts_decimate_minmax",
    oracle="""
    WITH b AS (
      SELECT user_id,
             epoch_us(ts) - ((epoch_us(ts) % 21600000000 + 21600000000)
                             % 21600000000) AS ws_us,
             epoch_us(ts) AS ts_us, value,
             min(value) OVER (PARTITION BY user_id,
               epoch_us(ts) - ((epoch_us(ts) % 21600000000 + 21600000000)
                               % 21600000000)) AS min_v,
             max(value) OVER (PARTITION BY user_id,
               epoch_us(ts) - ((epoch_us(ts) % 21600000000 + 21600000000)
                               % 21600000000)) AS max_v
      FROM events
    )
    SELECT user_id, ws_us,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 4) AS min_v,
           round(max(value), 4) AS max_v,
           min(CASE WHEN value = min_v THEN ts_us END) AS ts_at_min_us,
           min(CASE WHEN value = max_v THEN ts_us END) AS ts_at_max_us
    FROM b GROUP BY user_id, ws_us
    """,
    tags=("batch", "timeseries"),
)
def q_ts_decimate_minmax(spark, sf_dir):
    """TS-ext: min-max decimation — the plot/archive downsample that
    preserves envelopes and spike visibility (what naive averaging
    destroys): per (key, 6-hour bucket), the extreme values and the
    EARLIEST instant each extreme occurred (CASE-conditional min over
    the bucket's per-row running extremes — identical tie policy on
    both engines; the equality test compares unmodified stored doubles,
    so it is exact). Buckets come from PURE INTEGER floor arithmetic
    (``ts_us - pmod(ts_us, 6h)``) on both engines — no fp division, no
    truncating cast, and floor semantics that stay correct for
    pre-1970 (negative-epoch) timestamps; the same grid as
    F.window(ts, '6 hours').

    Scale shape: one window pass and one hash aggregate, both on the
    same (user, bucket) partitioning — the window's shuffle is reused
    by the aggregate; output is two points per bucket regardless of
    input density, the fixed-size result that makes dashboards over
    raw 100 TB feasible."""
    t = tables(spark, sf_dir)
    ts_us = F.unix_micros("ts")
    ws_us = ts_us - F.pmod(ts_us, F.lit(21600000000))
    w = Window.partitionBy("user_id", "ws_us")
    b = t.events.select(
        "user_id",
        ws_us.alias("ws_us"),
        ts_us.alias("ts_us"),
        "value",
    ).select(
        "user_id",
        "ws_us",
        "ts_us",
        "value",
        F.min("value").over(w).alias("min_v"),
        F.max("value").over(w).alias("max_v"),
    )
    return b.groupBy("user_id", "ws_us").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("min_v"),
        F.round(F.max("value"), 4).alias("max_v"),
        F.min(F.when(F.col("value") == F.col("min_v"), F.col("ts_us"))).alias(
            "ts_at_min_us"
        ),
        F.min(F.when(F.col("value") == F.col("max_v"), F.col("ts_us"))).alias(
            "ts_at_max_us"
        ),
    )


@register(
    "q_ts_outlier_rolling",
    oracle="""
    WITH win AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
             count(*) OVER w AS n_win,
             avg(value) OVER w AS mu,
             sqrt(avg(value * value) OVER w
                  - avg(value) OVER w * avg(value) OVER w) AS sigma
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ts_us,
           round(value, 4) AS value,
           round((value - mu) / sigma, 4) AS zscore
    FROM win
    WHERE n_win >= 10 AND sigma > 0
      AND abs((value - mu) / sigma) > 3.0
    """,
    tags=("batch", "timeseries"),
)
def q_ts_outlier_rolling(spark, sf_dir):
    """TS-ext: TRAILING-window outlier detection — each point scored
    against the 30 observations BEFORE it (frame ends at 1 PRECEDING,
    so the point never contaminates its own baseline — the casual
    mistake that halves detection power). Complements q_ts_outlier_mad
    (whole-history robust baseline): the rolling form adapts to drift
    and is exactly what the streaming twin computes from keyed state.
    Moments are explicit raw sums over the frame — engine-identical.

    Scale shape: one shuffle on user_id, one windowed pass, a narrow
    filter; the frame is ROWS-bounded so state per key is O(31) on the
    streaming side."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-30, -1)
    )
    mu = F.avg("value").over(w)
    sigma = F.sqrt(
        F.avg(F.col("value") * F.col("value")).over(w) - mu * mu
    )
    z = (F.col("value") - mu) / sigma
    return (
        t.events.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
            F.count(F.lit(1)).over(w).alias("n_win"),
            mu.alias("mu"),
            sigma.alias("sigma"),
        )
        .where(
            (F.col("n_win") >= 10)
            & (F.col("sigma") > 0)
            & (
                F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
                > 3.0
            )
        )
        .select(
            "user_id",
            "event_id",
            "ts_us",
            F.round("value", 4).alias("value"),
            F.round(
                (F.col("value") - F.col("mu")) / F.col("sigma"), 4
            ).alias("zscore"),
        )
    )
