"""Round-7 additions.

``q_cogroup_stats_agg`` is the JVM-side twin of ``q_cogroup_stats``
(VERDICT r6 #6): the applyInPandas coGroup key is the faithful Flink
``DataSet.coGroup`` API-parity demo, but its per-key Python hop is the
heaviest Python stage in the sf1 sweep (27–32 s). When the per-key
logic is expressible relationally — as the counting demo is — the
scale path is two partial-aggregates + one full-outer join, entirely
inside whole-stage codegen. Registering the twin makes the documented
scale path for SURVEY §2.C11 executable and benched, not just argued;
tests/test_invariants_r7.py cross-checks both shapes row-for-row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_quickstart_spark.plans.registry import register, tables

_COGROUP_ORACLE = """
    SELECT coalesce(o.k, e.k) AS custkey,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(e.n_events, 0) AS BIGINT) AS n_events
    FROM (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
    FULL JOIN (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY user_id) e
      ON o.k = e.k
    """


@register(
    "q_cogroup_stats_agg",
    oracle=_COGROUP_ORACLE,
    tags=("batch", "join"),
)
def q_cogroup_stats_agg(spark, sf_dir):
    """C11 scale path: the coGroup counting demo as two partial
    aggregates + a full-outer join — the JVM-side twin of
    ``q_cogroup_stats`` (same oracle, byte-identical results asserted
    in tests/test_invariants_r7.py). Each side map-side-combines to one
    row per key BEFORE the join shuffle, so the full-outer join moves
    |keys| rows, not |rows| — and the whole plan stays inside
    whole-stage codegen (zero Python). At 100 TB this is the shape to
    run; reach for the applyInPandas coGroup surface only when the
    per-key logic genuinely cannot be said relationally."""
    t = tables(spark, sf_dir)
    orders = t.orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    events = t.events.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return orders.join(events, "k", "full_outer").select(
        F.col("k").alias("custkey"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
