"""Aggregation query keys (SURVEY.md §2.D).

Reference surface [PK]: Flink ``keyBy().reduce/aggregate``, Table API
``GROUP BY`` / ``HAVING`` / ``GROUPING SETS`` / UDAF ``AggregateFunction``
(checkout empty — see SURVEY.md §0; no file:line citable).

Scale notes: every groupBy here plans as partial (map-side) + final
HashAggregate, so the shuffle carries pre-aggregated rows — the right shape
at 100 TB. Cardinalities of the grouping keys are tiny-to-moderate, so no
skew handling is needed; for high-cardinality keys the same plans hold
because AQE coalesces/splits post-shuffle partitions.

FP discipline: every double aggregate is ROUNDed identically on both the
Spark and DuckDB side — summation order differs between engines, so raw
double sums differ in final ulps (SURVEY.md §5.1).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_quickstart_spark.plans.registry import register, tables

_Q1_CUTOFF = "2001-09-01"


@register(
    "q_agg_global",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)        AS n_rows,
           round(sum(l_quantity), 2)       AS sum_qty,
           round(sum(l_extendedprice), 2)  AS sum_price,
           round(min(l_extendedprice), 2)  AS min_price,
           round(max(l_extendedprice), 2)  AS max_price,
           round(avg(l_discount), 6)       AS avg_disc
    FROM lineitem
    """,
    tags=("batch", "agg"),
)
def q_agg_global(spark, sf_dir):
    """D1: non-keyed global aggregate (Flink ``stream.sum/min/max`` analog)."""
    t = tables(spark, sf_dir)
    return t.lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@register(
    "q_agg_group",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                          AS sum_qty,
           round(sum(l_extendedprice), 2)                                     AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
           round(avg(l_quantity), 4)                                          AS avg_qty,
           round(avg(l_extendedprice), 4)                                     AS avg_price,
           round(avg(l_discount), 4)                                          AS avg_disc,
           CAST(count(*) AS BIGINT)                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("batch", "agg", "flagship"),
)
def q_agg_group(spark, sf_dir):
    """D2 FLAGSHIP: grouped hash agg, TPC-H Q1 shape (partial+final agg)."""
    t = tables(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.where(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q_agg_having",
    oracle="""
    SELECT n_nationkey, n_name, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    HAVING count(*) > 50
    """,
    tags=("batch", "agg"),
)
def q_agg_having(spark, sf_dir):
    """D3: post-aggregation filter (Table API ``having``)."""
    t = tables(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey
        )
        .groupBy("n_nationkey", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .where(F.col("n_customers") > 50)
    )


@register(
    "q_distinct",
    oracle="SELECT DISTINCT event_type, user_id FROM events",
    tags=("batch", "agg"),
)
def q_distinct(spark, sf_dir):
    """D4: distinct (Flink ``DataSet.distinct``) — planned as hash agg."""
    t = tables(spark, sf_dir)
    return t.events.select("event_type", "user_id").distinct()


@register(
    "q_agg_countdistinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT)                AS n_events
    FROM events GROUP BY event_type
    """,
    tags=("batch", "agg"),
)
def q_agg_countdistinct(spark, sf_dir):
    """D5: exact COUNT(DISTINCT) — expands to two-phase agg in Catalyst."""
    t = tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q_agg_approxcd",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
    tags=("batch", "agg", "approx"),
)
def q_agg_approxcd(spark, sf_dir):
    """D5b: approx_count_distinct (HLL++) — the 100 TB path for
    count-distinct: fixed-size sketch per group, mergeable map-side, no
    exact-distinct expansion shuffle.

    The estimate itself is engine-specific, so the oracle checks the
    operator's ACCURACY CONTRACT instead: per group, the HLL++ estimate
    (rsd=0.01) must land within 5% of the exact count (measured max
    relative error on this data: 0.67%); the oracle asserts the exact
    counts and ``approx_ok = TRUE``. A drifting sketch flips the boolean
    and fails the value hash.
    """
    t = tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.01)
                - F.countDistinct("user_id")
            )
            <= 0.05 * F.countDistinct("user_id")
        ).alias("approx_ok"),
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(count(*) AS BIGINT)      AS n_customers,
           round(sum(c_acctbal), 2)      AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("batch", "agg"),
)
def q_agg_rollup(spark, sf_dir):
    """D6: rollup region→nation→grand-total (Table API GROUPING SETS)."""
    t = tables(spark, sf_dir)
    joined = t.customer.join(
        F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey
    ).join(F.broadcast(t.region), t.nation.n_regionkey == t.region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("batch", "agg"),
)
def q_agg_cube(spark, sf_dir):
    """D6: cube over returnflag × linestatus."""
    t = tables(spark, sf_dir)
    return t.lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q_agg_groupingsets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    tags=("batch", "agg"),
)
def q_agg_groupingsets(spark, sf_dir):
    """D6: explicit GROUPING SETS via DataFrame.groupingSets (Spark 4.x) —
    the general form behind rollup/cube."""
    t = tables(spark, sf_dir)
    return t.lineitem.groupingSets(
        [["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "q_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"CAST(count(*) FILTER (WHERE event_type = '{et}') AS BIGINT) AS {et}" for et in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
    tags=("batch", "agg"),
)
def q_pivot(spark, sf_dir):
    """D7: pivot with an explicit value list (determinism requirement)."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
    )


@register(
    "q_udaf_wavg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("batch", "agg", "udf"),
)
def q_udaf_wavg(spark, sf_dir):
    """D8: UDAF (Flink ``AggregateFunction``) as a GROUPED_AGG pandas UDF.

    Quantity-weighted average price per returnflag; Arrow-batched, one
    partial per group partition. The oracle is the algebraic identity
    ``sum(x*w)/sum(w)``.
    """
    t = tables(spark, sf_dir)

    @F.pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


@register(
    "q_agg_percentile",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 4) AS p25,
           round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.75), 4) AS p75,
           round(quantile_cont(value, 0.95), 4) AS p95
    FROM events GROUP BY event_type
    """,
    tags=("batch", "agg"),
)
def q_agg_percentile(spark, sf_dir):
    """D-family extension: exact interpolated percentiles per key — the
    latency-quantile staple of stream analytics. Spark ``percentile`` and
    DuckDB ``quantile_cont`` share linear-interpolation semantics. Scale
    note: exact percentile sorts each group's values in the aggregate
    buffer; at 100 TB swap in ``approx_percentile`` (t-digest, mergeable,
    bounded memory) — declared engine-specific like q_agg_approxcd."""
    t = tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )


@register(
    "q_agg_histogram",
    oracle="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT)            AS n,
           round(min(value), 4)                AS lo,
           round(max(value), 4)                AS hi
    FROM events GROUP BY 1
    """,
    tags=("batch", "agg"),
)
def q_agg_histogram(spark, sf_dir):
    """D-family extension: fixed-width histogram via floor-division
    binning — fully portable SQL, one map-side-combined shuffle on the
    bucket id. The distributed-histogram primitive for data-quality
    dashboards over 100 TB (bucket cardinality is constant, so the
    reduce side is trivially small)."""
    t = tables(spark, sf_dir)
    return (
        t.events.withColumn(
            "bucket", F.floor(F.col("value") / F.lit(50.0)).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


@register(
    "q_agg_stats_family",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)               AS sd_qty,
           round(var_samp(l_quantity), 4)                  AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4)     AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_pq
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("batch", "agg"),
)
def q_agg_stats_family(spark, sf_dir):
    """D-family extension: statistical aggregates (stddev/variance/
    correlation/covariance/regression slope) — single-pass co-moment
    aggregates, partial+final planned like any hash agg (map-side
    combine), so the family scales exactly as count/sum does. Rounded on
    both sides: parallel summation order differs between engines."""
    t = tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qp"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope_pq"),
    )


@register(
    "q_agg_salted",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS sum_value
    FROM events GROUP BY event_type
    """,
    tags=("batch", "agg", "skew"),
)
def q_agg_salted(spark, sf_dir):
    """Skew-safe two-phase aggregation (operators/skew.py): partial agg
    on (key, salt16) then final merge on key — the manual fallback for
    algebraic aggregates when one hot key would pin a stage on a single
    task and AQE cannot split it (e.g. a pre-AQE cluster or a
    non-splittable agg). Result is bit-equal to the direct groupBy,
    which the shared oracle certifies; the plan has two paired
    HashAggregate stages instead of one, trading one extra (tiny,
    16×keys-row) shuffle for 16-way spread of every hot key."""
    from flink_quickstart_spark.operators.skew import salted_agg

    t = tables(spark, sf_dir)
    merged = salted_agg(
        t.events.select("event_type", "value"),
        key_cols=["event_type"],
        aggs={"n": F.count(F.lit(1)), "sum_value_raw": F.sum("value")},
        n_salts=16,
    )
    return merged.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("sum_value_raw", 2).alias("sum_value"),
    )


@register(
    "q_unpivot",
    oracle="""
    WITH per AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2)      AS qty,
             round(sum(l_extendedprice), 2) AS price,
             round(sum(l_discount), 2)      AS discount
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, metric, val
    FROM per UNPIVOT (val FOR metric IN (qty, price, discount))
    """,
    tags=("batch", "agg"),
)
def q_unpivot(spark, sf_dir):
    """D7 complement: unpivot/melt — wide per-key metrics to long
    (key, metric, value) rows via DataFrame.unpivot (Spark's native
    melt; planned as an Expand node: one pass, rows×metrics output, no
    shuffle beyond the feeding aggregate). The long layout is what
    metric stores and plotting layers ingest."""
    t = tables(spark, sf_dir)
    per = t.lineitem.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
        F.round(F.sum("l_discount"), 2).alias("discount"),
    )
    return per.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "discount"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "q_agg_bool",
    oracle="""
    SELECT user_id,
           CAST(bool_and(value > 10) AS INT)           AS all_gt10,
           CAST(bool_or(event_type = 'error') AS INT)  AS any_error,
           CAST(count(*) FILTER (WHERE value > 100) AS BIGINT) AS n_big
    FROM events GROUP BY user_id
    """,
    tags=("batch", "agg"),
)
def q_agg_bool(spark, sf_dir):
    """D-ext: boolean aggregates (every/any) + FILTERed count — the
    assertion-style aggregate family (Flink users express these as
    reduce over booleans). Emitted as INT for portable hashing; planned
    partial+final like any hash agg."""
    t = tables(spark, sf_dir)
    return t.events.groupBy("user_id").agg(
        F.bool_and(F.col("value") > 10).cast("int").alias("all_gt10"),
        F.bool_or(F.col("event_type") == "error").cast("int").alias("any_error"),
        F.count_if(F.col("value") > 100).alias("n_big"),
    )


@register(
    "q_agg_collect",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(array_agg(DISTINCT event_type)), ',')
             AS types_sorted,
           CAST(len(array_agg(DISTINCT event_type)) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
    tags=("batch", "agg"),
)
def q_agg_collect(spark, sf_dir):
    """D-ext: collection aggregate (collect_set) with a CANONICAL sorted
    rendering — collect order is engine- and partition-dependent, so the
    only oracle-safe emission is sort + join (same trick as q_fn_map).
    The Flink analog is a ListState-accumulating window function."""
    t = tables(spark, sf_dir)
    types = F.collect_set("event_type")
    return t.events.groupBy("user_id").agg(
        F.array_join(F.array_sort(types), ",").alias("types_sorted"),
        F.size(types).cast("long").alias("n_types"),
    )


@register(
    "q_agg_approx_percentile",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 4) AS exact_p50,
           round(quantile_cont(value, 0.95), 4) AS exact_p95,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
    tags=("batch", "agg", "approx"),
)
def q_agg_approx_percentile(spark, sf_dir):
    """D-family: approx_percentile (Greenwald-Khanna sketch) — the
    mergeable bounded-memory quantile path that replaces exact percentile
    at 100 TB (exact sorts every group's values; GK keeps an ε-summary).

    Contract oracle (same pattern as q_agg_approxcd): the sketch's p50
    and p95 must land inside the exact [p45,p55] / [p93,p97] quantile
    bands; the oracle asserts the exact interpolated quantiles and
    ``approx_ok = TRUE``. At accuracy=10000 the sketch's rank error is
    1/10000 — far inside the band on any group size."""
    t = tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("exact_p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("exact_p95"),
        (
            F.expr("approx_percentile(value, 0.50, 10000)").between(
                F.expr("percentile(value, 0.45)"), F.expr("percentile(value, 0.55)")
            )
            & F.expr("approx_percentile(value, 0.95, 10000)").between(
                F.expr("percentile(value, 0.93)"), F.expr("percentile(value, 0.97)")
            )
        ).alias("approx_ok"),
    )


@register(
    "q_agg_argminmax",
    oracle="""
    WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
               FROM events GROUP BY user_id, event_type),
    m AS (SELECT user_id, event_type AS modal_type, cnt AS modal_cnt,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY cnt DESC, event_type) AS rn
          FROM c),
    h AS (SELECT user_id, event_type AS hi_type, round(value, 2) AS hi_value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id DESC) AS rn
          FROM events)
    SELECT m.user_id, m.modal_type, m.modal_cnt, h.hi_type, h.hi_value
    FROM m JOIN h USING (user_id)
    WHERE m.rn = 1 AND h.rn = 1
    """,
    tags=("batch", "agg"),
)
def q_agg_argminmax(spark, sf_dir):
    """D-family: argmax/argmin + deterministic MODE — 'which value attains
    the group extreme', the lookup every last-event / top-product query
    needs. Implemented as struct-ordered min/max aggregates (one shuffle,
    partial+final, NO window sort): mode = min over (-cnt, type) structs
    after a (user, type) pre-count; argmax(value) = max over
    (value, event_id, type) structs with event_id as the deterministic
    tie-break. At 100 TB this beats the row_number() formulation — a pure
    hash aggregate instead of a partitioned sort."""
    t = tables(spark, sf_dir)
    counts = t.events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mode = (
        counts.groupBy("user_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("neg_cnt"),
                    F.col("event_type").alias("et"),
                )
            ).alias("m")
        )
        .select(
            "user_id",
            F.col("m.et").alias("modal_type"),
            (-F.col("m.neg_cnt")).alias("modal_cnt"),
        )
    )
    hi = (
        t.events.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    F.col("value").alias("v"),
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("et"),
                )
            ).alias("h")
        )
        .select(
            "user_id",
            F.col("h.et").alias("hi_type"),
            F.round(F.col("h.v"), 2).alias("hi_value"),
        )
    )
    return mode.join(hi, "user_id")


@register(
    "q_agg_hll_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users,
           TRUE AS merged_ok
    FROM events
    GROUP BY event_type
    """,
    tags=("batch", "agg", "approx"),
)
def q_agg_hll_rollup(spark, sf_dir):
    """D5c: mergeable-sketch re-aggregation — the property that makes
    approximate distinct-counting viable at 100 TB. Per (event_type,
    day) we build an Apache DataSketches HLL sketch (``hll_sketch_agg``,
    fixed lgK=14); the per-type count is then obtained by MERGING the
    daily sketches (``hll_union_agg``) — never rescanning the raw rows.
    This is the layout of a sketch rollup table: daily sketch partitions
    stay fixed-size, and any coarser grain (weekly, all-time) is a
    cheap union over them.

    The estimate is engine-specific, so (as with q_agg_approxcd) the
    oracle checks the ACCURACY CONTRACT: the merged estimate must land
    within 5% of the exact distinct count per type (measured max
    relative error at lgK=14 on this data: <1%). A drifting or wrongly
    merged sketch flips ``merged_ok`` and fails the value hash."""
    t = tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(False))).alias("est")
    )
    exact = t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_exact_users",
        (
            F.abs(F.col("est") - F.col("n_exact_users"))
            <= 0.05 * F.col("n_exact_users")
        ).alias("merged_ok"),
    )


@register(
    "q_agg_entropy",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    tot AS (SELECT user_id, sum(c) AS n FROM per GROUP BY user_id)
    SELECT p.user_id,
           CAST(t.n AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)), 4)
             AS entropy
    FROM per p JOIN tot t ON p.user_id = t.user_id
    GROUP BY p.user_id, t.n
    """,
    tags=("batch", "agg"),
)
def q_agg_entropy(spark, sf_dir):
    """D-ext: Shannon entropy of each user's event-type distribution —
    the behavioral-diversity / anomaly feature (entropy 0 = monomaniac
    key, ln(k) = uniform over k types). Two chained hash aggregates
    (per (user, type) counts, then per-user entropy over the counts) —
    both partial+final, map-side combined; no window, no UDF. The same
    shape computes label-distribution entropy per shard in a training
    pipeline's balance audit."""
    t = tables(spark, sf_dir)
    per = t.events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_tot = per.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        per.join(w_tot, "user_id")
        .groupBy("user_id", "n")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
        )
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            "n_types",
            "entropy",
        )
    )


@register(
    "q_agg_quantile_rollup",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*)    OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           round(min(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                          THEN value END), 4)  AS exact_p50,
           round(min(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                          THEN value END), 4)  AS exact_p95,
           TRUE AS p50_ok, TRUE AS p95_ok
    FROM ranked
    GROUP BY event_type
    """,
    tags=("batch", "agg", "approx"),
)
def q_agg_quantile_rollup(spark, sf_dir):
    """D-ext: mergeable QUANTILE rollup — the percentile twin of
    q_agg_hll_rollup. Per (event_type, day) the values are sketched as
    a fixed 512-bin uniform histogram (global [min,max] from one scalar
    pass); the per-type percentile is then estimated by MERGING the
    daily histograms (bin-wise count sum — associative, any grain) and
    reading the cumulative distribution. A rollup table of histogram
    partitions answers p50/p95 at every coarser grain without
    rescanning raw data — constant size per partition, one narrow merge.

    Histogram estimates carry a strict ±bin_width guarantee against the
    DISCRETE quantile (the value at rank ⌈q·n⌉ — a real data point,
    which by construction lies inside the located bin; the midpoint
    read-out errs by at most one width). Interpolated quantiles don't
    admit this bound on sparse tails (the interpolation midpoint can
    fall between distant order statistics), so both engines compute the
    same explicit value-at-rank — and the oracle checks the CONTRACT:
    per type, |merged-histogram estimate − discrete percentile| ≤
    bin_width for p50 and p95. A mis-merged or mis-bounded sketch flips
    the booleans and fails the value hash."""
    t = tables(spark, sf_dir)
    bounds = t.events.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = (
        t.events.select("event_type", F.date_trunc("day", "ts").alias("day"), "value")
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            "day",
            "lo",
            "hi",
            F.least(
                F.lit(511),
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / 512)
                ).cast("int"),
            ).alias("bin"),
        )
    )
    # Daily sketch partitions: count per (type, day, bin).
    daily = binned.groupBy("event_type", "day", "bin", "lo", "hi").agg(
        F.count(F.lit(1)).alias("c")
    )
    # Merge across days: bin-wise sum — the rollup step.
    merged = daily.groupBy("event_type", "bin", "lo", "hi").agg(
        F.sum("c").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("bin")
    cum = merged.select(
        "event_type",
        "bin",
        "lo",
        "hi",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / 512
    est_bin = lambda q: F.min(  # first bin whose cumulative reaches q·n
        F.when(F.col("cum") >= q * F.col("n"), F.col("bin"))
    )
    ests = cum.groupBy("event_type", "lo", "hi").agg(
        est_bin(0.5).alias("b50"), est_bin(0.95).alias("b95")
    ).select(
        "event_type",
        (F.col("lo") + (F.col("b50") + 0.5) * width).alias("est50"),
        (F.col("lo") + (F.col("b95") + 0.5) * width).alias("est95"),
        width.alias("bw"),
    )
    rw = Window.partitionBy("event_type").orderBy("value")
    ranked = t.events.select(
        "event_type",
        "value",
        F.row_number().over(rw).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    exact = ranked.groupBy("event_type").agg(
        F.min(
            F.when(F.col("rn") == F.ceil(0.5 * F.col("n")), F.col("value"))
        ).alias("x50"),
        F.min(
            F.when(F.col("rn") == F.ceil(0.95 * F.col("n")), F.col("value"))
        ).alias("x95"),
    )
    return exact.join(ests, "event_type").select(
        "event_type",
        F.round("x50", 4).alias("exact_p50"),
        F.round("x95", 4).alias("exact_p95"),
        (F.abs(F.col("est50") - F.col("x50")) <= F.col("bw")).alias("p50_ok"),
        (F.abs(F.col("est95") - F.col("x95")) <= F.col("bw")).alias("p95_ok"),
    )


@register(
    "q_agg_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             avg(l_extendedprice)     AS mu,
             avg(l_extendedprice * l_extendedprice) AS m2r
      FROM lineitem GROUP BY l_returnflag
    ),
    c AS (
      SELECT l.l_returnflag, m.n, m.mu,
             avg(pow(l.l_extendedprice - m.mu, 2)) AS m2,
             avg(pow(l.l_extendedprice - m.mu, 3)) AS m3,
             avg(pow(l.l_extendedprice - m.mu, 4)) AS m4
      FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
      GROUP BY l.l_returnflag, m.n, m.mu
    )
    SELECT l_returnflag, n,
           round(mu, 4)                      AS mean_price,
           round(sqrt(m2), 4)                AS stddev_pop,
           round(m3 / pow(m2, 1.5), 6)       AS skewness,
           round(m4 / (m2 * m2) - 3.0, 6)    AS excess_kurtosis
    FROM c
    """,
    tags=("batch", "agg"),
)
def q_agg_moments(spark, sf_dir):
    """D-ext: higher central moments — population skewness and excess
    kurtosis per group, computed from EXPLICIT central moments (two
    passes: mean, then avg((x−µ)^k) with the group means joined back).
    Built-in skewness()/kurtosis() differ between engines on the
    sample-vs-population convention, so both sides compute the same
    explicit formula — the portable way to pin distribution-shape
    metrics in a cross-engine pipeline.

    Scale shape: two grouped hash aggregates over the same key plus a
    broadcast-sized join of per-group means (|groups| rows) back onto
    the facts — the standard two-pass moment recipe when Welford-style
    single-pass co-moments aren't available as built-ins for k>2."""
    t = tables(spark, sf_dir)
    m = t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("l_extendedprice").alias("mu"),
    )
    d = F.col("l_extendedprice") - F.col("mu")
    c = (
        t.lineitem.join(F.broadcast(m), "l_returnflag")
        .groupBy("l_returnflag", "n", "mu")
        .agg(
            F.avg(d * d).alias("m2"),
            F.avg(d * d * d).alias("m3"),
            F.avg(d * d * d * d).alias("m4"),
        )
    )
    return c.select(
        "l_returnflag",
        "n",
        F.round("mu", 4).alias("mean_price"),
        F.round(F.sqrt("m2"), 4).alias("stddev_pop"),
        F.round(F.col("m3") / F.pow("m2", 1.5), 6).alias("skewness"),
        F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0, 6).alias(
            "excess_kurtosis"
        ),
    )


@register(
    "q_agg_bitops",
    oracle="""
    SELECT event_type,
           CAST(bit_or(user_id % 256) AS BIGINT)  AS flags_any,
           CAST(bit_and(user_id % 256) AS BIGINT) AS flags_all,
           CAST(bit_xor(user_id % 256) AS BIGINT) AS flags_parity
    FROM events
    GROUP BY event_type
    """,
    tags=("batch", "agg"),
)
def q_agg_bitops(spark, sf_dir):
    """D-ext: bitwise aggregates — OR-fold ("any row set this flag"),
    AND-fold ("every row set it"), XOR-fold (parity/checksum) over a
    flag byte. The compact idiom for permission masks, feature-flag
    rollups and Merkle-ish parity checks; all three are associative +
    commutative, so Catalyst plans the usual partial+final hash
    aggregate and the shuffle carries one long per group."""
    t = tables(spark, sf_dir)
    flags = F.col("user_id") % 256
    return t.events.groupBy("event_type").agg(
        F.bit_or(flags).alias("flags_any"),
        F.bit_and(flags).alias("flags_all"),
        F.bit_xor(flags).alias("flags_parity"),
    )


@register(
    "q_ab_welch_ttest",
    oracle="""
    WITH assigned AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             value
      FROM events
    ),
    m AS (
      SELECT event_type, variant,
             CAST(count(*) AS BIGINT) AS n,
             avg(value) AS mean, avg(value * value) AS m2
      FROM assigned GROUP BY event_type, variant
    ),
    v AS (
      SELECT event_type, variant, n, mean,
             (CAST(n AS DOUBLE) / (n - 1)) * (m2 - mean * mean) AS var
      FROM m WHERE n >= 2
    ),
    w AS (
      SELECT a.event_type,
             a.n AS n_a, b.n AS n_b,
             a.mean AS mean_a, b.mean AS mean_b,
             a.var / a.n + b.var / b.n AS se2,
             a.var / a.n AS sa, b.var / b.n AS sb,
             a.n AS na, b.n AS nb
      FROM v a JOIN v b
        ON a.event_type = b.event_type AND a.variant = 'A' AND b.variant = 'B'
    )
    SELECT event_type, n_a, n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round((mean_a - mean_b) / sqrt(se2), 6) AS t_stat,
           round(se2 * se2 / (sa * sa / (na - 1) + sb * sb / (nb - 1)), 6)
             AS welch_df
    FROM w WHERE se2 > 0
    """,
    tags=("batch", "agg", "stats"),
)
def q_ab_welch_ttest(spark, sf_dir):
    """D-ext: Welch's two-sample t-test per experiment cell — the A/B
    readout every event pipeline ends in. Variant assignment is the
    deterministic ``user_id % 2`` split; per (event_type, variant) one
    pass computes count and raw moments, sample variance comes from the
    explicit ``n/(n-1) * (E[x^2] - E[x]^2)`` formula (written out
    identically on both engines — ``var_samp`` conventions differ), then
    the Welch statistic and Satterthwaite degrees of freedom are pure
    per-row arithmetic on the tiny per-cell table.

    Scale shape: one partial+final hash aggregate over (event_type,
    variant) — the shuffle carries 3 doubles per cell regardless of row
    count — then a self-join on the post-agg table whose size is
    O(#event_types), broadcast by AQE. No second pass over the data."""
    t = tables(spark, sf_dir)
    assigned = t.events.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"),
        "value",
    )
    m = assigned.groupBy("event_type", "variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mean"),
        F.avg(F.col("value") * F.col("value")).alias("m2"),
    )
    v = m.where(F.col("n") >= 2).select(
        "event_type",
        "variant",
        "n",
        "mean",
        (
            (F.col("n").cast("double") / (F.col("n") - 1))
            * (F.col("m2") - F.col("mean") * F.col("mean"))
        ).alias("var"),
    )
    a = v.where(F.col("variant") == "A").alias("a")
    b = v.where(F.col("variant") == "B").alias("b")
    sa = F.col("a.var") / F.col("a.n")
    sb = F.col("b.var") / F.col("b.n")
    se2 = sa + sb
    return (
        a.join(b, F.col("a.event_type") == F.col("b.event_type"))
        .where(se2 > 0)
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round("a.mean", 6).alias("mean_a"),
            F.round("b.mean", 6).alias("mean_b"),
            F.round((F.col("a.mean") - F.col("b.mean")) / F.sqrt(se2), 6).alias(
                "t_stat"
            ),
            F.round(
                se2 * se2
                / (sa * sa / (F.col("a.n") - 1) + sb * sb / (F.col("b.n") - 1)),
                6,
            ).alias("welch_df"),
        )
    )


@register(
    "q_agg_skew_audit",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c, o_custkey) AS i FROM per_key
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS total_rows,
             CAST(max(c) AS BIGINT) AS max_rows,
             sum(CAST(i AS DOUBLE) * c) AS iwsum
      FROM ranked
    )
    SELECT n_keys, total_rows, max_rows,
           round(CAST(total_rows AS DOUBLE) / n_keys, 6) AS avg_rows,
           round(CAST(max_rows AS DOUBLE) * n_keys / total_rows, 6)
             AS skew_ratio,
           round(2.0 * iwsum / (n_keys * total_rows)
                 - CAST(n_keys + 1 AS DOUBLE) / n_keys, 6) AS gini
    FROM g
    """,
    tags=("batch", "agg", "profiling"),
)
def q_agg_skew_audit(spark, sf_dir):
    """D-ext: join-key skew audit — the pre-flight check before any big
    shuffle: per-key row counts for a join key, then the global skew
    picture (max/avg hot-key ratio and the Gini coefficient of the key
    distribution, via the rank identity G = 2*sum(i*x_i)/(n*sum x) -
    (n+1)/n). This is the report that decides between a plain shuffle
    join, AQE skew splitting, and the salted join (q_join_skew_salted).

    Scale shape: one hash aggregate collapses the fact table to one row
    per key; ranking runs over that DISTINCT-KEY table (orders-of-
    magnitude smaller than the input) through the two-phase
    ``global_row_number`` — range-bucketed partial sort + prefix-summed
    offsets, never a single-reducer window; the final reduction is a
    scalar aggregate."""
    from flink_quickstart_spark.operators.rank import global_row_number

    t = tables(spark, sf_dir)
    per_key = t.orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("c"))
    ranked = global_row_number(
        per_key,
        order_by=[F.col("c").asc(), F.col("o_custkey").asc()],
        bucket_col="c",
        out_col="i",
    )
    g = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("total_rows"),
        F.max("c").alias("max_rows"),
        F.sum(F.col("i").cast("double") * F.col("c")).alias("iwsum"),
    )
    return g.select(
        "n_keys",
        "total_rows",
        "max_rows",
        F.round(F.col("total_rows").cast("double") / F.col("n_keys"), 6).alias(
            "avg_rows"
        ),
        F.round(
            F.col("max_rows").cast("double") * F.col("n_keys") / F.col("total_rows"),
            6,
        ).alias("skew_ratio"),
        F.round(
            2.0 * F.col("iwsum") / (F.col("n_keys") * F.col("total_rows"))
            - (F.col("n_keys") + 1).cast("double") / F.col("n_keys"),
            6,
        ).alias("gini"),
    )


@register(
    "q_agg_regression",
    oracle="""
    SELECT event_type,
           CAST(regr_count(value, epoch_us(ts) / 86400000000.0) AS BIGINT)
             AS n,
           round(regr_slope(value, epoch_us(ts) / 86400000000.0), 6)
             AS slope_per_day,
           round(regr_intercept(value, epoch_us(ts) / 86400000000.0), 4)
             AS intercept,
           round(regr_r2(value, epoch_us(ts) / 86400000000.0), 6) AS r2,
           round(regr_avgx(value, epoch_us(ts) / 86400000000.0), 4)
             AS avg_day,
           round(regr_avgy(value, epoch_us(ts) / 86400000000.0), 4)
             AS avg_value
    FROM events GROUP BY event_type
    """,
    tags=("batch", "agg", "stats"),
)
def q_agg_regression(spark, sf_dir):
    """D-ext: the full OLS regression aggregate family (regr_count /
    slope / intercept / r2 / avgx / avgy) — trend-per-stream in one
    aggregate pass, the SQL-standard bivariate toolkit
    (q_ts_features uses slope+corr per window; this is the per-key
    whole-history fit with the complete coefficient set). Time is
    rescaled to DAYS (epoch_us / 86.4e9) so slopes are human-readable
    and survive 6-decimal rounding.

    Scale shape: every regr_* is an algebraic aggregate (sums of
    products) — partial+final hash aggregation, shuffle carries six
    doubles per group."""
    t = tables(spark, sf_dir)
    day = F.unix_micros("ts") / F.lit(86400000000.0)
    v = F.col("value")
    return t.events.groupBy("event_type").agg(
        F.regr_count(v, day).cast("long").alias("n"),
        F.round(F.regr_slope(v, day), 6).alias("slope_per_day"),
        F.round(F.regr_intercept(v, day), 4).alias("intercept"),
        F.round(F.regr_r2(v, day), 6).alias("r2"),
        F.round(F.regr_avgx(v, day), 4).alias("avg_day"),
        F.round(F.regr_avgy(v, day), 4).alias("avg_value"),
    )


@register(
    "q_agg_pareto",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS rev_cents
      FROM orders GROUP BY o_custkey
    ),
    run AS (
      SELECT o_custkey, rev_cents,
             sum(rev_cents) OVER (
               ORDER BY rev_cents DESC, o_custkey
               ROWS UNBOUNDED PRECEDING) AS running
      FROM per_cust
    ),
    tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS total FROM per_cust)
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN (running - rev_cents) * 5 < total * 4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_top80,
           round(CAST(sum(CASE WHEN (running - rev_cents) * 5 < total * 4
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS frac_top80,
           CAST(max(total) AS BIGINT) AS total_rev_cents
    FROM run CROSS JOIN tot
    """,
    tags=("batch", "agg", "profiling"),
)
def q_agg_pareto(spark, sf_dir):
    """D-ext: revenue-concentration (Pareto) report — the smallest set
    of customers covering 80% of revenue: per-customer totals in exact
    integer CENTS, a GLOBAL running sum over the revenue-desc order,
    and an integer predicate (5 * cumulative-before < 4 * total ⇔ the
    row is still needed to reach 80%) so the cut is engine-exact with
    no floating-point thresholds.

    Scale shape: the per-customer aggregate collapses the fact table;
    the global running sum uses the two-phase distributed prefix sum
    (operators/rank.global_row_number's sibling: range buckets →
    aggregate-sized offsets → PARTITIONED intra-bucket windows — no
    single-reducer WindowExec); the report is one row."""
    from flink_quickstart_spark.operators.rank import global_running_sum
    from flink_quickstart_spark.session import tracked_persist

    t = tables(spark, sf_dir)
    per_cust = tracked_persist(
        t.orders.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("rev_cents")
        )
    )
    # Session-lifetime cache entry — same ACCEPTED CONCESSION as
    # q_agg_rfm above (r12-opt): four consumers read per_cust (the
    # quantile probe, the bucket-sum collect, the window pass, and the
    # total subtree); unpersisted, each re-runs the orders aggregation
    # (measured 14.3 s → 4.4 s at sf0.1, noop sink). Bounded: one
    # customer-sized entry per sf_dir, deduped across re-runs by the
    # cache manager, spills under pressure. Tracked (r13):
    # session.release_tracked_persists() drains it.
    per_cust.count()
    run = global_running_sum(
        per_cust,
        value_col="rev_cents",
        order_by=[F.col("rev_cents").desc(), F.col("o_custkey").asc()],
        bucket_col="rev_cents",
        out_col="running",
    )
    tot = per_cust.agg(F.sum("rev_cents").alias("total"))
    needed = F.when(
        (F.col("running") - F.col("rev_cents")) * 5 < F.col("total") * 4, 1
    ).otherwise(0)
    return (
        run.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(needed).alias("n_top80"),
            F.round(
                F.sum(needed).cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_top80"),
            F.max("total").alias("total_rev_cents"),
        )
    )


@register(
    "q_agg_rfm",
    oracle="""
    WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
    per_cust AS (
      SELECT o_custkey,
             CAST(date_diff('day', max(o_orderdate), max(anchor.mx))
                  AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders CROSS JOIN anchor
      GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
                AS BIGINT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency, o_custkey)
                AS BIGINT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary, o_custkey)
                AS BIGINT) AS m_score
    FROM per_cust
    """,
    tags=("batch", "agg"),
)
def q_agg_rfm(spark, sf_dir):
    """D-ext: RFM segmentation — the classic customer scoring: days
    since last order (vs the corpus max date), order count, and total
    spend, each quintiled into 1-5 scores (higher = better: recency
    ranked DESC so the most recent buyers land in quintile 5). Tie
    order pinned by custkey so ntile is engine-deterministic.

    Scale shape: one hash aggregate to per-customer rows; each quintile
    then comes from the TWO-PHASE global rank (operators/rank.py) —
    range-bucket on the score column, O(buckets) offsets to the driver,
    partitioned window inside each bucket — so there is NO
    single-partition WindowExec even though the ordering is global.
    ANSI-ntile-exact because the ordering is made unique with the
    custkey tiebreak (rank == row_number).

    The three quintiles are INDEPENDENT orderings of the same
    per-customer table, so they come from ONE fused multi-ordering rank
    (operators/rank.py global_ntiles, r8): one approxQuantile job over
    all three score columns, one grouping-sets aggregate for all bucket
    counts, then all three ntile columns in a single lazy plan. The
    former chained form (rank(rank(rank(per_cust)))) re-executed every
    upstream rank for each stage's driver-side probes, recomputing the
    orders aggregation ~7× — measured 5.9 s at sf0.01 where fixed cost
    is everything. per_cust is materialized once (columnar cache,
    spills; identical plans across calls reuse the entry) so the two
    probe jobs scan the tiny per-customer table, not orders."""
    from flink_quickstart_spark.operators.rank import global_ntiles
    from flink_quickstart_spark.session import tracked_persist

    t = tables(spark, sf_dir)
    anchor = t.orders.agg(F.max("o_orderdate").alias("mx"))
    per_cust = tracked_persist(
        t.orders.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("mx"), F.max("o_orderdate"))
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    # Session-lifetime cache entry — ACCEPTED CONCESSION (r8 ADVICE):
    # the returned lazy plan still references per_cust, so unpersisting
    # here would force the final collect to recompute the orders
    # aggregation the cache exists to amortize (the r7→r8 5.9 s → 2.5 s
    # win). Bounded: one per-customer-sized entry per distinct sf_dir,
    # deduped across re-runs by the cache manager, spills under
    # pressure. The release discipline (_release after supersession)
    # applies to LOOP snapshots, not to a single entry the result
    # depends on.
    per_cust.count()
    out = global_ntiles(
        per_cust,
        [
            (
                "r_score",
                [F.col("recency_days").desc(), F.col("o_custkey").asc()],
                "recency_days",
            ),
            (
                "f_score",
                [F.col("frequency").asc(), F.col("o_custkey").asc()],
                "frequency",
            ),
            (
                "m_score",
                [F.col("monetary").asc(), F.col("o_custkey").asc()],
                "monetary",
            ),
        ],
        ntile=5,
    )
    return out.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    )


@register(
    "q_agg_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             date_trunc('month', min(o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    joined AS (
      SELECT f.cohort_month,
             CAST(date_diff('month', f.cohort_month,
                            date_trunc('month', o.o_orderdate))
                  AS BIGINT) AS month_offset,
             o.o_totalprice, o.o_custkey
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT CAST(CAST(cohort_month AS DATE) AS VARCHAR) AS cohort,
           month_offset,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS active_customers,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM joined
    GROUP BY cohort_month, month_offset
    """,
    tags=("batch", "agg"),
)
def q_agg_cohort_ltv(spark, sf_dir):
    """D-ext: cohort lifetime-value triangle — customers grouped by
    first-order month, revenue and active-customer counts laid out by
    month offset since acquisition: the retention-revenue matrix every
    subscription/commerce dashboard is built on (q_retention_cohorts
    does the activity half on events; this is the MONETARY half on
    orders). Calendar-month cohorting via date_trunc on both engines.

    Scale shape: one aggregate finds each customer's cohort (min-date
    per key), a hash join attributes every order to its cohort —
    per-customer table broadcast-or-shuffle by AQE — and one final
    aggregate onto the O(months^2 / 2) triangle. Two shuffles total,
    both on natural keys."""
    t = tables(spark, sf_dir)
    firsts = t.orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    joined = t.orders.join(firsts, "o_custkey").select(
        "cohort_month",
        (
            (F.year("o_orderdate") - F.year("cohort_month")) * 12
            + (F.month("o_orderdate") - F.month("cohort_month"))
        )
        .cast("long")
        .alias("month_offset"),
        "o_totalprice",
        "o_custkey",
    )
    return joined.groupBy("cohort_month", "month_offset").agg(
        F.countDistinct("o_custkey").alias("active_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    ).select(
        F.col("cohort_month").cast("date").cast("string").alias("cohort"),
        "month_offset",
        "active_customers",
        "n_orders",
        "revenue",
    )
