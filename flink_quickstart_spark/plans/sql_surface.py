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


_Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register(
    "q_sql_q5",
    oracle=_Q5_SQL,
    tags=("batch", "sql"),
)
def q_sql_q5(spark, sf_dir):
    """TPC-H Q5 shape (local-supplier volume): six-way join where the
    c_nationkey = s_nationkey condition rides on the supplier join —
    Catalyst broadcasts supplier/nation/region and shuffles only
    customer⋈orders⋈lineitem; join reordering picks the dim-first order.
    Byte-identical SQL on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q5_SQL)


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "q_sql_q7",
    oracle=_Q7_SQL,
    tags=("batch", "sql"),
)
def q_sql_q7(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): the nation dim joins TWICE under
    different aliases (supplier side and customer side) with a disjunctive
    cross-filter — self-aliased dim joins both broadcast, and the
    disjunction stays a post-join filter rather than exploding the plan.
    Byte-identical SQL on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q7_SQL)


_Q8_SQL = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register(
    "q_sql_q8",
    oracle=_Q8_SQL,
    tags=("batch", "sql"),
)
def q_sql_q8(spark, sf_dir):
    """TPC-H Q8 shape (national market share): eight-way join with nation
    aliased on both the customer and supplier paths, then a conditional
    share ratio per year. Every dim broadcasts; the only shuffles are the
    fact-side equi-joins and the final year agg. Byte-identical SQL."""
    register_views(spark, sf_dir)
    return spark.sql(_Q8_SQL)


_Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey
       AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register(
    "q_sql_q13",
    oracle=_Q13_SQL,
    tags=("batch", "sql"),
)
def q_sql_q13(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with a non-key predicate in the ON clause (kept on the join, not
    pushed to WHERE — semantics differ), then a two-level aggregate.
    count(o_orderkey) counts only matched rows, so no-order customers
    land in the c_count=0 bucket. Byte-identical SQL on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q13_SQL)


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register(
    "q_sql_q15",
    oracle=_Q15_SQL,
    tags=("batch", "sql"),
)
def q_sql_q15(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): a CTE referenced twice — once as
    the join input and once inside a scalar MAX subquery. Spark plans the
    scalar subquery as a broadcast ReusedExchange over the same aggregate,
    so the fact table is scanned once, not twice. Byte-identical SQL."""
    register_views(spark, sf_dir)
    return spark.sql(_Q15_SQL)


_Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@register(
    "q_sql_q17",
    oracle=_Q17_SQL,
    tags=("batch", "sql"),
)
def q_sql_q17(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): correlated scalar
    AVG subquery against the same fact table — Catalyst decorrelates it
    into a per-partkey aggregate joined back (one extra shuffle, not a
    per-row re-scan), which is what keeps this shape viable at 100 TB.
    Byte-identical SQL on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS STRING) AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(sum(l_quantity), 1) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
"""


@register(
    "q_sql_q18",
    oracle=_Q18_SQL.replace("AS STRING", "AS VARCHAR"),
    tags=("batch", "sql"),
)
def q_sql_q18(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): IN over a grouped HAVING
    subquery on the fact table — rewritten to a LEFT SEMI join against
    the aggregated orderkeys, so the fact table joins a pre-shrunk key
    set instead of re-scanning per row. Identical text modulo
    STRING/VARCHAR."""
    register_views(spark, sf_dir)
    return spark.sql(_Q18_SQL)


_Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


@register(
    "q_sql_q19",
    oracle=_Q19_SQL,
    tags=("batch", "sql"),
)
def q_sql_q19(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    OR-of-ANDs mixing columns from both join sides. Catalyst extracts the
    common p_partkey equi-key so this stays a hash join (not a nested
    loop), and pushes the per-side conjunct unions (p_brand IN …,
    l_quantity ranges) below the join as scan filters. Byte-identical
    SQL on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_Q19_SQL)


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


# ---------------------------------------------------------------------------
# Round 3: the remaining TPC-H query shapes, adapted to this schema (no
# partsupp table, no l_commitdate/l_receiptdate/l_shipmode — lateness is
# l_shipdate vs o_orderdate; supply cost proxied by p_retailprice). Every
# query is byte-identical ANSI SQL on Spark and DuckDB.

_Q2_SQL = """
SELECT p_partkey, p_name, s_name, round(s_acctbal, 2) AS s_acctbal
FROM part, supplier, lineitem, nation, region
WHERE p_partkey = l_partkey
  AND s_suppkey = l_suppkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND p_size = 10
  AND p_type = 'SMALL'
  AND s_acctbal = (SELECT min(s2.s_acctbal)
                   FROM supplier s2, lineitem l2, nation n2, region r2
                   WHERE l2.l_partkey = p_partkey
                     AND s2.s_suppkey = l2.l_suppkey
                     AND s2.s_nationkey = n2.n_nationkey
                     AND n2.n_regionkey = r2.r_regionkey
                     AND r2.r_name = 'EUROPE')
GROUP BY p_partkey, p_name, s_name, s_acctbal
ORDER BY s_acctbal, p_partkey, s_name
"""


@register(
    "q_sql_q2",
    oracle=_Q2_SQL,
    tags=("batch", "sql"),
)
def q_sql_q2(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier; partsupp-less adaptation: the
    part↔supplier link is DISTINCT shipping history from lineitem, the
    minimized measure is s_acctbal). Exercises a correlated scalar MIN
    subquery that Catalyst decorrelates into an aggregate + join — the
    only shape that scales, since a per-row subquery over a 100 TB fact
    link is quadratic. GROUP BY dedups the multi-shipment fanout."""
    register_views(spark, sf_dir)
    return spark.sql(_Q2_SQL)


_Q9_SQL = """
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.5 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN part     ON p_partkey = l_partkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%') profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register(
    "q_sql_q9",
    oracle=_Q9_SQL,
    tags=("batch", "sql"),
)
def q_sql_q9(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation and year; supply
    cost proxied as 0.5·p_retailprice·l_quantity — no partsupp table).
    A 5-way star join where only `part` carries the selective predicate:
    the LIKE filter prunes before the join, dims broadcast, and the fact
    shuffles once — the Q9 plan that survives 100 TB."""
    register_views(spark, sf_dir)
    return spark.sql(_Q9_SQL)


_Q11_SQL = """
SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS value
FROM lineitem
GROUP BY l_partkey
HAVING sum(l_extendedprice * (1 - l_discount)) >
       (SELECT 0.0007 * sum(l_extendedprice * (1 - l_discount)) FROM lineitem)
ORDER BY value DESC, l_partkey
"""


@register(
    "q_sql_q11",
    oracle=_Q11_SQL,
    tags=("batch", "sql"),
)
def q_sql_q11(spark, sf_dir):
    """TPC-H Q11 shape (important-stock scan; partsupp-less: per-part
    revenue share from lineitem). The uncorrelated scalar subquery in
    HAVING becomes one extra global-agg stage whose single row broadcasts
    into the filter — two scans of the fact, zero joins, both with
    map-side partial aggregation."""
    register_views(spark, sf_dir)
    return spark.sql(_Q11_SQL)


_Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@register(
    "q_sql_q12",
    oracle=_Q12_SQL,
    tags=("batch", "sql"),
)
def q_sql_q12(spark, sf_dir):
    """TPC-H Q12 shape (late shipments by priority class; no l_shipmode /
    l_receiptdate — lateness is shipdate > orderdate + 60 days). The
    date-range filter pushes to the lineitem scan; the non-equi lateness
    predicate evaluates as a post-join filter on the single equi-join."""
    register_views(spark, sf_dir)
    return spark.sql(_Q12_SQL)


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register(
    "q_sql_q16",
    oracle=_Q16_SQL,
    tags=("batch", "sql"),
)
def q_sql_q16(spark, sf_dir):
    """TPC-H Q16 shape (supplier count by part attributes; the
    part↔supplier relation comes from lineitem shipping history). COUNT
    DISTINCT expands to a two-phase agg — dedup on (group, suppkey) then
    count — so the fact shuffles on the group key once, never collecting
    per-group sets."""
    register_views(spark, sf_dir)
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
SELECT s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT l_suppkey
                    FROM lineitem
                    JOIN part ON p_partkey = l_partkey
                    WHERE p_name LIKE '%red%'
                      AND l_shipdate >= TIMESTAMP '1997-01-01'
                    GROUP BY l_suppkey
                    HAVING sum(l_quantity) > 1400)
ORDER BY s_name
"""


@register(
    "q_sql_q20",
    oracle=_Q20_SQL,
    tags=("batch", "sql"),
)
def q_sql_q20(spark, sf_dir):
    """TPC-H Q20 shape (suppliers with significant shipped volume of a
    part class; partsupp-less: availqty proxied by shipped quantity).
    The IN subquery rewrites to LEFT SEMI on the aggregated subquery
    result — the tiny dim side probes it after its own agg, so the fact
    is touched exactly once."""
    register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


_Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders     ON o_orderkey = l1.l_orderkey
JOIN nation     ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register(
    "q_sql_q21",
    oracle=_Q21_SQL,
    tags=("batch", "sql"),
)
def q_sql_q21(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who alone delayed multi-supplier
    orders; lateness is shipdate > orderdate + 60d). The EXISTS and NOT
    EXISTS both correlate on l_orderkey — Catalyst rewrites them to LEFT
    SEMI and LEFT ANTI joins on that key, three co-partitioned shuffles
    of the same fact instead of per-row probes. The NOT EXISTS also
    references the outer o_orderdate: decorrelation carries it into the
    anti-join condition."""
    register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)


_Q22_SQL = """
SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM (SELECT c_nationkey AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')) inactive
GROUP BY cntrycode
ORDER BY cntrycode
"""


@register(
    "q_sql_q22",
    oracle=_Q22_SQL,
    tags=("batch", "sql"),
)
def q_sql_q22(spark, sf_dir):
    """TPC-H Q22 shape (wealthy inactive customers; cntrycode is
    c_nationkey, inactivity is no orders since 2000 — every customer has
    SOME order in this data). Combines an uncorrelated scalar AVG
    subquery (one broadcast row) with a date-filtered NOT EXISTS (LEFT
    ANTI join after pushing the date filter into the orders scan)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q22_SQL)


_DIVISION_SQL = """
WITH n_types AS (
  SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS total FROM events
),
per_user AS (
  SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
  FROM events GROUP BY user_id
)
SELECT user_id, n_types
FROM per_user CROSS JOIN n_types
WHERE n_types = total
"""


@register(
    "q_sql_division",
    oracle=_DIVISION_SQL,
    tags=("batch", "sql"),
)
def q_sql_division(spark, sf_dir):
    """SQL-surface: relational division — "users who triggered EVERY
    event type", the for-all quantifier the EXISTS/semi-join family
    (q_sql_exists) can't express directly. Authored as the count-match
    rewrite: per-user distinct-type count equals the global
    distinct-type count — the scale-safe form; the textbook
    double-NOT-EXISTS would nest correlated anti-joins.

    Scale shape: one distinct aggregate per user (Catalyst expand +
    two-phase agg) against a 1-row broadcast global count, attached
    AFTER aggregation so the scalar cross touches O(users) rows, not
    the fact scan — linear, one shuffle on user_id."""
    register_views(spark, sf_dir)
    return spark.sql(_DIVISION_SQL)


_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q_sql_q4",
    oracle=_Q4_SQL,
    tags=("batch", "sql"),
)
def q_sql_q4(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking), completing the
    22-query set (Q1 is the flagship ``q_agg_group``). The testdata's
    lineitem carries no commit/receipt dates, so the correlated EXISTS
    predicate is ``l_shipdate > o_orderdate`` (shipped after ordering)
    — same plan shape as the reference query: a date-range scan over
    orders LEFT-SEMI-joined to lineitem on the order key, then a tiny
    5-group aggregate. Catalyst rewrites the EXISTS to a semi-join, so
    no per-row subquery ever executes; at 100 TB both scans prune to
    the quarter via min/max row-group stats and the semi-join shuffles
    only matching keys (r7)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)
