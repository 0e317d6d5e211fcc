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
