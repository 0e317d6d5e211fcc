"""Round-6 additions: the order-theta aggregate family.

`operators/theta.py` (new this round) evaluates inequality-join COUNT
consumers as a merge-count over the distributed prefix-sum — this
module registers the keys that exercise it beyond `q_join_theta`'s
rewrite.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_quickstart_spark.plans.registry import register, tables


@register(
    "q_join_theta_pctile",
    oracle="""
    SELECT s_suppkey, s_name,
           round(CAST((SELECT count(*) FROM customer c
                       WHERE c.c_acctbal < s.s_acctbal) AS DOUBLE)
                 / (SELECT count(*) FROM customer), 6) AS pctile
    FROM supplier s
    """,
    tags=("batch", "join", "theta"),
)
def q_join_theta_pctile(spark, sf_dir):
    """C8-ext: theta PERCENTILE join — each supplier's balance placed as
    a fraction of customers strictly below it. The naive form is a
    correlated count subquery (the oracle) ≡ an inequality join +
    count; evaluated as merge-count via the distributed prefix-sum
    (operators/theta.py: one hash shuffle, partitioned windows,
    O(buckets) driver state — no BroadcastNestedLoopJoin, no pair
    materialization), then normalized by the 1-row customer-count
    scalar (broadcast; the waived single-row BNLJ pattern). Unlike
    `q_join_theta`, zero-count suppliers stay (left-style semantics:
    percentile 0.0), so the key also pins the operator's behavior for
    probes below every value."""
    from flink_quickstart_spark.operators.theta import theta_count_below

    t = tables(spark, sf_dir)
    counted = theta_count_below(
        t.supplier.select("s_suppkey", "s_name", "s_acctbal"),
        t.customer.select("c_acctbal"),
        "s_acctbal",
        "c_acctbal",
        out_col="_n_below",
    )
    total = t.customer.agg(F.count(F.lit(1)).alias("_n_cust"))
    return counted.crossJoin(F.broadcast(total)).select(
        "s_suppkey",
        "s_name",
        F.round(
            F.col("_n_below").cast("double") / F.col("_n_cust"), 6
        ).alias("pctile"),
    )


@register(
    "q_join_theta_sum",
    oracle="""
    SELECT s_suppkey, s_name,
           CAST(count(*) AS BIGINT) AS n_poorer,
           round(sum(c_acctbal), 2) AS sum_poorer
    FROM supplier JOIN customer ON s_acctbal > c_acctbal
    GROUP BY s_suppkey, s_name
    """,
    tags=("batch", "join", "theta"),
)
def q_join_theta_sum(spark, sf_dir):
    """C8-ext: theta SUM join — total balance held by the customers
    strictly poorer than each supplier, plus their count. Two passes of
    the merge-count/merge-sum machinery (operators/theta.py), chained:
    the count output is the sum pass's probe payload, so the whole
    thing is two hash shuffles and zero pair materialization (the
    oracle's JOIN would build |pairs| rows first). Inner-join semantics
    via ``n_poorer > 0`` — the count, not the sum, carries the
    existence test (a poorer-customer balance sum could legitimately be
    0.00 with negative balances in range). Double prefix-sums round to
    2 like every float aggregate (summation-order convention)."""
    from flink_quickstart_spark.operators.theta import (
        theta_count_below,
        theta_sum_below,
    )

    t = tables(spark, sf_dir)
    counted = theta_count_below(
        t.supplier.select("s_suppkey", "s_name", "s_acctbal"),
        t.customer.select("c_acctbal"),
        "s_acctbal",
        "c_acctbal",
        out_col="n_poorer",
    )
    summed = theta_sum_below(
        counted,
        t.customer.select("c_acctbal"),
        "s_acctbal",
        "c_acctbal",
        out_col="_sum_below",
    )
    return summed.where(F.col("n_poorer") > 0).select(
        "s_suppkey",
        "s_name",
        "n_poorer",
        F.round(F.col("_sum_below"), 2).alias("sum_poorer"),
    )
