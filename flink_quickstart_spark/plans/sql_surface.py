"""SQL-string entry point (SURVEY.md §3.2 lifecycle 2).

The engine registers every testdata table as a temp view, so ``spark.sql``
is a first-class query surface (Flink Table API / SQL analog [PK]). These
keys run ANSI SQL through Spark's parser — near-identical text runs on
DuckDB as the oracle, demonstrating dialect-portable SQL authoring.
"""

from __future__ import annotations

from flink_quickstart_spark.plans.registry import register
from flink_quickstart_spark.sources.tables import register_views

_Q3_SPARK = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(CAST(o_orderdate AS DATE) AS STRING)         AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register(
    "q_sql_q3",
    oracle=_Q3_SPARK.replace("AS STRING", "AS VARCHAR"),
    tags=("batch", "sql"),
)
def q_sql_q3(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority) authored as a SQL STRING —
    exercises parser → analyzer → same Catalyst pipeline as the DataFrame
    API. The oracle is the identical text modulo STRING/VARCHAR."""
    register_views(spark, sf_dir)
    return spark.sql(_Q3_SPARK)


_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT)                    AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "q_sql_q6",
    oracle=_Q6_SQL,
    tags=("batch", "sql"),
)
def q_sql_q6(spark, sf_dir):
    """TPC-H Q6 shape (forecast revenue change): pure filter+aggregate
    with every predicate pushable to the parquet scan — byte-identical
    SQL text runs on both engines. At 100 TB this query is scan-bound
    and its cost is set entirely by row-group skipping."""
    register_views(spark, sf_dir)
    return spark.sql(_Q6_SQL)


_WINDOW_SQL_SPARK = """
SELECT user_id, event_type, n,
       CAST(rank() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS BIGINT) AS rnk
FROM (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
)
"""


@register(
    "q_sql_window",
    oracle=_WINDOW_SQL_SPARK,
    tags=("batch", "sql"),
)
def q_sql_window(spark, sf_dir):
    """Nested aggregate + OVER window as a SQL string — identical text on
    both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_WINDOW_SQL_SPARK)


_Q10_SQL = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       n_name, round(c_acctbal, 2) AS acctbal
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "q_sql_q10",
    oracle=_Q10_SQL,
    tags=("batch", "sql"),
)
def q_sql_q10(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): 3-table fact join +
    broadcast dim + grouped revenue + top-20 — byte-identical SQL on
    both engines. Catalyst broadcasts nation automatically and plans
    TakeOrderedAndProject for the limit."""
    register_views(spark, sf_dir)
    return spark.sql(_Q10_SQL)


_Q14_SQL = """
SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


@register(
    "q_sql_q14",
    oracle=_Q14_SQL,
    tags=("batch", "sql"),
)
def q_sql_q14(spark, sf_dir):
    """TPC-H Q14 shape (promotion revenue share): conditional aggregate
    over a fact⋈dim join with a tight date filter — the filter prunes at
    the scan, part broadcasts."""
    register_views(spark, sf_dir)
    return spark.sql(_Q14_SQL)


_CORR_SUBQ_SQL = """
SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c_custkey
"""


@register(
    "q_sql_corr_subquery",
    oracle=_CORR_SUBQ_SQL,
    tags=("batch", "sql"),
)
def q_sql_corr_subquery(spark, sf_dir):
    """Correlated scalar subquery (customers above their nation's mean
    balance) — byte-identical SQL on both engines. Catalyst DECORRELATES
    it into an aggregate + join (RewriteCorrelatedScalarSubquery), so the
    plan is one shuffle per side instead of a per-row subquery — the
    rewrite that makes this shape viable at 100 TB."""
    register_views(spark, sf_dir)
    return spark.sql(_CORR_SUBQ_SQL)


_EXISTS_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


@register(
    "q_sql_exists",
    oracle=_EXISTS_SQL,
    tags=("batch", "sql"),
)
def q_sql_exists(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS — Catalyst rewrites it to a
    LEFT SEMI join (RewritePredicateSubquery), so the probe side never
    duplicates and the plan is one equi-join shuffle — the rewrite that
    keeps EXISTS viable on a fact table at 100 TB. Byte-identical SQL on
    both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


_CTE_TOPK_SQL = """
WITH nation_orders AS (
  SELECT c_nationkey, o_orderkey, o_totalprice
  FROM customer JOIN orders ON c_custkey = o_custkey
),
ranked AS (
  SELECT c_nationkey, o_orderkey, round(o_totalprice, 2) AS total,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM nation_orders
)
SELECT c_nationkey, o_orderkey, total, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 3
"""


@register(
    "q_sql_cte_topk",
    oracle=_CTE_TOPK_SQL,
    tags=("batch", "sql"),
)
def q_sql_cte_topk(spark, sf_dir):
    """Chained CTEs + partitioned window in pure SQL (top-3 orders per
    nation): the WindowExec is PARTITIONED (25 nation groups), and
    Catalyst pushes the rn <= 3 rank limit into a per-partition top-k
    (WindowGroupLimit) before the final filter — the at-scale shape."""
    register_views(spark, sf_dir)
    return spark.sql(_CTE_TOPK_SQL)
