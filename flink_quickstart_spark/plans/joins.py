"""Join query keys (SURVEY.md §2.C).

Reference surface [PK]: Flink ``DataSet.join/coGroup/cross``, Table API
inner/outer/semi/anti joins, ``KeyedStream.intervalJoin``, and the temporal
(as-of) join (checkout empty — see SURVEY.md §0).

Scale notes per key are on the builders. The recurring decisions:
- dimensions (region/nation/supplier) are broadcast explicitly — no shuffle
  of the fact side;
- fact-fact joins shuffle on the equi key and rely on AQE for skew
  splitting;
- the theta join is a BroadcastNestedLoopJoin and is only sane because one
  side is a dimension — flagged in the docstring as the anti-pattern to
  avoid on two fact tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_quickstart_spark.operators.joins import asof_join, interval_join
from flink_quickstart_spark.plans.registry import register, tables


@register(
    "q_join_orders_customer",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name, c_mktsegment, round(o_totalprice, 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'O'
    """,
    tags=("batch", "join"),
)
def q_join_orders_customer(spark, sf_dir):
    """C1: equi inner join — Catalyst picks SMJ/shuffled-hash; at 100 TB
    both sides shuffle on custkey (co-partitioned bucketing would remove
    the shuffle for repeated joins)."""
    t = tables(spark, sf_dir)
    return (
        t.orders.where(F.col("o_orderstatus") == "O")
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.round("o_totalprice", 2).alias("total"),
        )
    )


@register(
    "q_join_broadcast",
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders, round(sum(o_totalprice), 2) AS sum_total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("batch", "join"),
)
def q_join_broadcast(spark, sf_dir):
    """C2: broadcast join — nation (25 rows at any SF) ships to every
    executor; the orders⋈customer equi join shuffles once."""
    t = tables(spark, sf_dir)
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
    )


@register(
    "q_join_star",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    tags=("batch", "join", "headline"),
)
def q_join_star(spark, sf_dir):
    """C3: multi-way star join, TPC-H Q5 shape. Dims broadcast; the
    region filter prunes via the broadcasted dim before the fact shuffle;
    AQE reorders/adjusts at runtime."""
    t = tables(spark, sf_dir)
    dims = F.broadcast(
        t.nation.join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        t.customer.join(dims, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            t.orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q_join_outer",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS sum_total
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("batch", "join"),
)
def q_join_outer(spark, sf_dir):
    """C4: left outer join — customers with zero orders kept (count=0)."""
    t = tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias("sum_total"),
        )
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    tags=("batch", "join"),
)
def q_join_semi(spark, sf_dir):
    """C5: left-semi join (EXISTS rewrite) — probe side never duplicates."""
    t = tables(spark, sf_dir)
    big = t.orders.where(F.col("o_totalprice") > 300000)
    return t.customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    tags=("batch", "join"),
)
def q_join_anti(spark, sf_dir):
    """C6: left-anti join (NOT EXISTS rewrite) — customers with no urgent orders."""
    t = tables(spark, sf_dir)
    urgent = t.orders.where(F.col("o_orderpriority") == "1-URGENT")
    return t.customer.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    tags=("batch", "join"),
)
def q_join_cross(spark, sf_dir):
    """C7: cross join (Flink ``DataSet.cross``) — only ever dim×dim; a
    fact-side cross product is quadratic and never shipped."""
    t = tables(spark, sf_dir)
    return t.region.select("r_name").crossJoin(t.nation.select("n_name"))


@register(
    "q_join_theta",
    oracle="""
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_poorer_customers
    FROM supplier JOIN customer ON s_acctbal > c_acctbal
    GROUP BY s_suppkey, s_name
    """,
    tags=("batch", "join"),
)
def q_join_theta(spark, sf_dir):
    """C8: theta/non-equi join whose consumer is a per-row COUNT —
    evaluated as a merge-count (operators/theta.py) instead of the
    BroadcastNestedLoopJoin the naive form plans to (the r3-r5 waived
    shape). ``count(c_acctbal < s_acctbal)`` is s_acctbal's position in
    the sorted customer balances: union probes (weight 0) with values
    (weight 1), distributed prefix-sum, read each probe's running
    total. Linear in |supplier| + |customer|, one hash shuffle,
    partitioned windows only — survives fact-sized BOTH sides, where
    the BNLJ form needed a broadcastable dim. Inner-join semantics
    (suppliers with zero poorer customers drop) via ``n > 0``.
    Band predicates with pair-level output still route through
    q_join_range_binned's binned equi-join."""
    from flink_quickstart_spark.operators.theta import theta_count_below

    t = tables(spark, sf_dir)
    counted = theta_count_below(
        t.supplier.select("s_suppkey", "s_name", "s_acctbal"),
        t.customer.select("c_acctbal"),
        "s_acctbal",
        "c_acctbal",
        out_col="n_poorer_customers",
        strict=True,
    )
    return counted.where(F.col("n_poorer_customers") > 0).select(
        "s_suppkey", "s_name", "n_poorer_customers"
    )


@register(
    "q_join_interval",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           epoch_us(c.ts) AS click_ts_us, epoch_us(p.ts) AS purchase_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 10 MINUTE
    """,
    tags=("batch", "join"),
)
def q_join_interval(spark, sf_dir):
    """C9: interval join (Flink ``intervalJoin().between(0, 10min)``):
    purchase within 10 minutes after a click, same user. Equi key carries
    the shuffle; the time predicate filters matches in-join."""
    t = tables(spark, sf_dir)
    clicks = t.events.where(F.col("event_type") == "click")
    purchases = t.events.where(F.col("event_type") == "purchase")
    joined = interval_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower=F.expr("INTERVAL 0 SECONDS"),
        upper=F.expr("INTERVAL 10 MINUTES"),
    )
    return joined.select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
        F.unix_micros("l.ts").alias("click_ts_us"),
        F.unix_micros("r.ts").alias("purchase_ts_us"),
    )


@register(
    "q_join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           c.r_event_id AS click_id,
           c.r_ts_us AS click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT event_id AS r_event_id, user_id, ts,
                           epoch_us(ts) AS r_ts_us
                    FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("batch", "join"),
)
def q_join_asof(spark, sf_dir):
    """C10: as-of join (Flink temporal-join analog): each purchase gets the
    most recent click at-or-before it, per user. Implemented via the
    union+window operator (single shuffle, no pandas) —
    :func:`flink_quickstart_spark.operators.joins.asof_join`.

    DuckDB's native ASOF LEFT JOIN is the oracle. Ties (equal ts) match,
    i.e. non-strict.
    """
    t = tables(spark, sf_dir)
    purchases = t.events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = t.events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id", "ts"],
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("r_event_id").alias("click_id"),
        F.unix_micros("r_ts").alias("click_ts_us"),
    )


@register(
    "q_cogroup_stats",
    oracle="""
    SELECT coalesce(o.k, e.k) AS custkey,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(e.n_events, 0) AS BIGINT) AS n_events
    FROM (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
    FULL JOIN (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY user_id) e
      ON o.k = e.k
    """,
    tags=("batch", "join", "udf"),
)
def q_cogroup_stats(spark, sf_dir):
    """C11: coGroup (Flink ``DataSet.coGroup``) via
    ``groupBy().cogroup().applyInArrow`` — both sides shuffle once on the
    key, each key's two row-groups meet as Arrow tables. Counting could
    of course be done relationally (that's the oracle); the point is the
    cogroup surface for genuinely non-relational per-key logic.
    r12-opt (guide §4.2): the function is still called once per key —
    cogroup semantics — but Arrow tables replace the per-key pandas
    DataFrame construction (the dominant cost at 15 k keys: measured
    16.6 s → 2.1 s at sf0.1, noop sink, identical rows)."""
    import pyarrow as pa

    t = tables(spark, sf_dir)

    def stats(key, orders_t: pa.Table, events_t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": pa.array([key[0].as_py()], type=pa.int64()),
                "n_orders": pa.array([orders_t.num_rows], type=pa.int64()),
                "n_events": pa.array([events_t.num_rows], type=pa.int64()),
            }
        )

    orders = t.orders.select(F.col("o_custkey").alias("k"))
    events = t.events.select(F.col("user_id").alias("k"))
    return (
        orders.groupBy("k")
        .cogroup(events.groupBy("k"))
        .applyInArrow(stats, "custkey bigint, n_orders bigint, n_events bigint")
    )


@register(
    "q_join_range_binned",
    oracle="""
    SELECT s_suppkey,
           CAST(count(*) AS BIGINT)  AS n_close,
           round(min(c_acctbal), 2)  AS closest_lo,
           round(max(c_acctbal), 2)  AS closest_hi
    FROM supplier JOIN customer ON abs(s_acctbal - c_acctbal) <= 2.5
    GROUP BY s_suppkey
    """,
    tags=("batch", "join"),
)
def q_join_range_binned(spark, sf_dir):
    """C8 scale path: |s_acctbal − c_acctbal| ≤ ε as a BINNED EQUI-JOIN
    (operators/range_join.py) — bucket by floor(v/ε), replicate one side
    into neighbor buckets, hash-join on the bucket, re-check exactly.
    Same semantics as the naive inequality join (the oracle), but plans
    as BroadcastHashJoin/SMJ instead of BroadcastNestedLoopJoin: linear
    not quadratic, which is the difference between minutes and never at
    100 TB. Plan asserted nested-loop-free in tests/test_plans.py."""
    from flink_quickstart_spark.operators.range_join import range_join

    t = tables(spark, sf_dir)
    pairs = range_join(
        t.supplier.select("s_suppkey", "s_acctbal"),
        t.customer.select("c_custkey", "c_acctbal"),
        "s_acctbal",
        "c_acctbal",
        eps=2.5,
    )
    return pairs.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_close"),
        F.round(F.min("c_acctbal"), 2).alias("closest_lo"),
        F.round(F.max("c_acctbal"), 2).alias("closest_hi"),
    )


@register(
    "q_join_bucketed",
    oracle="""
    SELECT c_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_total
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("batch", "join", "scale"),
)
def q_join_bucketed(spark, sf_dir):
    """C1 at the storage layer: the same equi-join routed through
    BUCKETED tables (sources/bucketing.py) — both sides pre-hashed into
    8 co-located buckets at write time, so the join plans with NO
    Exchange on either side (asserted in tests/test_plans.py). This is
    the pay-once-per-dataset answer to the fact⋈fact shuffle at 100 TB;
    the oracle certifies the layout change never changes results. The
    bucketed write happens inside the key (idempotent overwrite) so the
    query is self-contained at gate scale."""
    import os
    import tempfile

    from flink_quickstart_spark.sources.bucketing import (
        read_table,
        write_bucketed,
    )

    t = tables(spark, sf_dir)
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), "fqs_scratch", "bucketed", tag)
    write_bucketed(
        t.customer.select("c_custkey", "c_name"),
        f"fqs_b_customer_{tag}",
        os.path.join(base, "customer"),
        "c_custkey",
        8,
    )
    write_bucketed(
        t.orders.select("o_custkey", "o_totalprice"),
        f"fqs_b_orders_{tag}",
        os.path.join(base, "orders"),
        "o_custkey",
        8,
    )
    c = read_table(spark, f"fqs_b_customer_{tag}")
    o = read_table(spark, f"fqs_b_orders_{tag}")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
    )


@register(
    "q_join_nullsafe",
    oracle="""
    WITH a AS (SELECT event_id, nullif(user_id % 7, 0) AS k, value
               FROM events WHERE event_type = 'click'),
    b AS (SELECT nullif(user_id % 7, 0) AS k,
                 CAST(count(*) AS BIGINT) AS n_purch
          FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT a.event_id, a.k AS bucket, b.n_purch
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("batch", "join"),
)
def q_join_nullsafe(spark, sf_dir):
    """C-ext: NULL-safe equi join (``<=>`` / IS NOT DISTINCT FROM) —
    NULL keys MATCH each other instead of silently dropping, the
    semantic needed when joining on nullable business keys. Crucially
    Spark still plans this as a HASH join (null-safe equality is an
    equi-condition, not a theta join), so the shape survives scale; a
    naive ``a.k = b.k OR (a.k IS NULL AND b.k IS NULL)`` predicate
    would fall to nested-loop."""
    t = tables(spark, sf_dir)
    a = t.events.where(F.col("event_type") == "click").select(
        "event_id", F.nullif(F.col("user_id") % 7, F.lit(0)).alias("k"), "value"
    )
    b = (
        t.events.where(F.col("event_type") == "purchase")
        .select(F.nullif(F.col("user_id") % 7, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_purch"))
    )
    return a.join(b, a.k.eqNullSafe(b.k)).select(
        "event_id", a.k.alias("bucket"), "n_purch"
    )


@register(
    "q_join_skew_salted",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT)  AS n_events,
           round(sum(value), 2)      AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation   n ON c.c_nationkey = n.n_nationkey
    GROUP BY n_name
    """,
    tags=("batch", "join", "skew"),
)
def q_join_skew_salted(spark, sf_dir):
    """C-ext: explicit salted skew join — the manual fallback when AQE's
    skew splitting cannot help (e.g. a single hot key larger than any
    split threshold, or a non-AQE engine). The big (fact) side gets a
    deterministic per-row salt in [0, 8); the small side is replicated
    once per salt via a broadcast cross of the 8-row salt table, and the
    join key becomes (user_id, salt) — the hot user spreads over 8
    tasks. Result is provably identical to the plain join (property
    test in tests/test_sources_skew.py); the oracle is the plain join.

    At 100 TB: replication cost = small side × n_salts shuffled once;
    pick n_salts ≈ (hot-key rows / target-partition rows). The salt is
    xxhash64-derived, not rand(), so task retries are deterministic."""
    from flink_quickstart_spark.operators.skew import salted_join

    t = tables(spark, sf_dir)
    events = t.events.select("user_id", "value")
    cust = t.customer.select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    joined = salted_join(events, cust, on="user_id", n_salts=8)
    return (
        joined.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "q_join_asof_tolerance",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 30 MINUTE
                THEN c.event_id END AS click_id,
           CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 30 MINUTE
                THEN epoch_us(c.ts) END AS click_ts_us
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    tags=("batch", "join", "timeseries"),
)
def q_join_asof_tolerance(spark, sf_dir):
    """C10-ext: as-of join with a match tolerance — the pandas
    ``merge_asof(tolerance=...)`` / kdb ``wj`` semantic: each purchase
    takes the latest prior click of the same user ONLY if it is within
    30 minutes; otherwise the match is NULL (stale quotes must not
    leak). Same single-shuffle union+window operator as q_join_asof,
    with the tolerance applied as a post-filter on the matched
    timestamp — no second join, no extra shuffle."""
    t = tables(spark, sf_dir)
    purchases = t.events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = t.events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id", "ts"],
    )
    within = F.col("r_ts").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("r_ts") <= 30 * 60 * 1_000_000
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.when(within, F.col("r_event_id")).alias("click_id"),
        F.when(within, F.unix_micros("r_ts")).alias("click_ts_us"),
    )


@register(
    "q_join_pit_features",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           epoch_us(p.ts) AS ts_us,
           CAST(count(c.event_id) AS BIGINT) AS n_clicks_60m,
           round(coalesce(sum(c.value), 0.0), 2) AS click_value_60m
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 60 MINUTE
     AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
    tags=("batch", "join", "timeseries"),
)
def q_join_pit_features(spark, sf_dir):
    """C9-ext: point-in-time feature join — the feature-store
    primitive: for each anchor (purchase) compute trailing aggregates
    of another stream (clicks in the strictly-prior 60 minutes, same
    user). The strict ``c.ts < p.ts`` bound is the leakage guard: no
    information at-or-after the anchor instant enters the feature.
    Anchors with no prior clicks are kept with zero features (LEFT
    join semantics) — silently dropping them would bias any model
    trained on the output.

    Scale shape: an equi-join on user_id with the time predicate as
    residual condition (hash join, not nested-loop) followed by one
    hash aggregation on the anchor key. Candidate fan-out is bounded
    by per-user activity within the 60-minute horizon; for extreme
    horizons the binned range-join operator
    (operators/range_join.py) caps candidates by time bucket."""
    t = tables(spark, sf_dir)
    p = (
        t.events.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .alias("p")
    )
    c = (
        t.events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
        )
        .alias("c")
    )
    joined = p.join(
        c,
        (F.col("p.user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p.ts") - F.expr("INTERVAL 60 MINUTES"))
        & (F.col("c_ts") < F.col("p.ts")),
        "left",
    )
    return joined.groupBy(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("ts"),
    ).agg(
        F.count("c_event_id").alias("n_clicks_60m"),
        F.round(F.coalesce(F.sum("c_value"), F.lit(0.0)), 2).alias(
            "click_value_60m"
        ),
    ).select(
        "purchase_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "n_clicks_60m",
        "click_value_60m",
    )


@register(
    "q_dq_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS relation,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT count(*) FROM customer) AS BIGINT),
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
    UNION ALL
    SELECT 'supplier->nation',
           CAST((SELECT count(*) FROM supplier) AS BIGINT),
           CAST((SELECT count(*) FROM supplier s
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = s.s_nationkey))
                AS BIGINT)
    """,
    tags=("batch", "join", "dq"),
)
def q_dq_referential_integrity(spark, sf_dir):
    """DQ-ext: referential-integrity audit across the warehouse's FK
    edges — child count and orphan count per relation, the check that
    runs after every ingest and before every join-dependent pipeline
    (an orphan rate > 0 silently deletes rows from inner joins).

    Scale shape: each orphan count is a LEFT ANTI hash join (fact side
    streams, dimension side broadcast when small — customer/nation —
    or shuffled hash for orders); the four audits are independent and
    union into a 4-row report. No row-level output, so the result is
    constant-size at any scale."""
    t = tables(spark, sf_dir)

    def audit(name, child, ckey, parent, pkey):
        # Lazy 1-row report: total via agg, orphans via LEFT ANTI + agg.
        n_child = child.agg(F.count(F.lit(1)).alias("n_child"))
        n_orphan = child.join(
            parent, child[ckey] == parent[pkey], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        return (
            n_child.crossJoin(n_orphan)
            .select(
                F.lit(name).alias("relation"), "n_child", "n_orphans"
            )
        )

    reports = [
        audit("lineitem->orders", t.lineitem, "l_orderkey", t.orders,
              "o_orderkey"),
        audit("orders->customer", t.orders, "o_custkey", t.customer,
              "c_custkey"),
        audit("customer->nation", t.customer, "c_nationkey", t.nation,
              "n_nationkey"),
        audit("supplier->nation", t.supplier, "s_nationkey", t.nation,
              "n_nationkey"),
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
