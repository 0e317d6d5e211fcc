"""Iterative-graph query keys (Flink ``DataSet.iterate`` surface).

Reference surface [PK — SURVEY.md §0, checkout empty]: quickstart-era
Flink shipped bulk/delta iterations whose canonical demos are connected
components and PageRank. Both run here as driver-side loops over
DataFrame steps (operators/iterative.py) on a deterministic
customer–supplier bipartite graph derived from orders⋈lineitem.

Iteration cannot be expressed efficiently in a single ANSI query
(recursive CTEs over 10⁴+-edge graphs blow up as transitive closure),
but both keys still carry full sql oracles (DuckDB recursive-CTE /
fixed-iteration twins over the same edge set, converted round 3); their
VALUE checks are additionally pinned by exact single-machine references
in tests/test_iterative.py (union-find; dense power iteration).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_quickstart_spark.operators.iterative import connected_components, pagerank
from flink_quickstart_spark.plans.registry import register, tables


def _bipartite_edges(spark, sf_dir):
    """customer —bought-from— supplier edges; supplier ids offset into
    their own namespace. Distinct edge list, one shuffle.

    The fact-fact join pins MERGE (r7 sf10 decade finding): a 2-column
    orders projection prunes to a few MB of parquet estimate even when
    the table is tens of millions of rows, so static planning chose to
    BROADCAST a fact side at 100× ("Not enough memory to build and
    broadcast"). A fact table is never a broadcast candidate no matter
    what the pruned-scan estimate says."""
    t = tables(spark, sf_dir)
    return (
        t.orders.join(
            t.lineitem.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("dst"),
        )
        .distinct()
    )


@register(
    "q_graph_components",
    # Iterative, but still oracle-checkable: DuckDB's recursive CTE
    # computes min-reachable-label as a transitive closure (quadratic in
    # component size — fine at gate scale, ~20 s; NOT the scale path,
    # which is exactly why the Spark side iterates instead). The
    # union-find reference test in tests/test_iterative.py is the
    # second, independent value check.
    oracle="""
    WITH RECURSIVE
    edges AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000000 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(node, label) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.src, r.label FROM sym s JOIN reach r ON s.dst = r.node
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(count(*) AS BIGINT)  AS n_nodes
    FROM (SELECT node, min(label) AS component FROM reach GROUP BY node)
    GROUP BY component
    """,
    tags=("batch", "graph", "iterative"),
)
def q_graph_components(spark, sf_dir):
    """Connected components by min-label propagation: component sizes.
    Edge table materialized once, labels lineage-truncated every
    iteration (r6 — the per-iteration convergence count otherwise
    recomputes the fact-fact edge join each step); converges in
    O(diameter) steps (hub suppliers keep it small here)."""
    labels = connected_components(_bipartite_edges(spark, sf_dir), max_iter=20)
    return (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.col("n_nodes").desc(), F.col("component"))
    )


def _pagerank_oracle(iterations: int = 8, damping: float = 0.85) -> str:
    """A fixed iteration count makes power iteration ANSI-expressible:
    unroll each step into a CTE computing ranks from the previous one
    (contributions via join+sum, dangling mass via scalar subquery).
    Generated, not hand-written — the loop IS the query plan.

    Every chained CTE is ``AS MATERIALIZED``: each step references the
    previous rank table twice (dangling branch + contribution branch),
    so with DuckDB's default CTE *inlining* the plan doubles per step —
    2^8 copies of the whole chain, which is exactly what made this
    oracle take ~190 s at sf0.01 in round 4. Materialization makes it
    linear in the iteration count (<1 s). The dangling-node set is also
    hoisted out of the loop (it is static — out-degrees don't change)."""
    steps = []
    for i in range(iterations):
        prev = f"r{i}"
        steps.append(f"""
    d{i} AS MATERIALIZED (
      SELECT coalesce(sum(rank), 0.0) AS mass
      FROM {prev} JOIN dang USING (node)),
    r{i + 1} AS MATERIALIZED (
      SELECT n.node,
             (1 - {damping}) / nn.n + {damping} * (SELECT mass FROM d{i}) / nn.n
             + {damping} * coalesce(m.in_mass, 0.0) AS rank
      FROM nodes n CROSS JOIN nc nn
      LEFT JOIN (
        SELECT e.dst AS node, sum(p.rank / g.out_deg) AS in_mass
        FROM edges e
        JOIN {prev} p ON e.src = p.node
        JOIN deg g   ON e.src = g.node
        GROUP BY e.dst
      ) m ON n.node = m.node
    )""")
    return f"""
    WITH
    edges AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000000 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nc AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS DOUBLE) AS out_deg
            FROM edges GROUP BY src),
    dang AS MATERIALIZED (
      SELECT n.node FROM nodes n LEFT JOIN deg g ON n.node = g.node
      WHERE g.node IS NULL),
    r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nc nn),
    {",".join(steps)}
    SELECT CAST(node AS BIGINT) AS node, round(rank, 6) AS rank
    FROM r{iterations}
    """


@register(
    "q_graph_pagerank",
    # Iterative, but the iteration count is FIXED — so the oracle unrolls
    # the 8 power steps into chained CTEs (generated above). Ranks agree
    # to 6 decimals across engines; the power-iteration reference test in
    # tests/test_iterative.py is the second independent check.
    oracle=_pagerank_oracle(iterations=8, damping=0.85),
    tags=("batch", "graph", "iterative"),
)
def q_graph_pagerank(spark, sf_dir):
    """PageRank after 8 fixed power iterations (damping 0.85, dangling
    mass redistributed), all nodes. Deterministic modulo double
    summation order — ranks rounded to 6 decimals; the full vector is
    emitted (no tie-sensitive top-k in the oracle-checked output)."""
    ranks = pagerank(_bipartite_edges(spark, sf_dir), iterations=8)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@register(
    "q_graph_triangles",
    oracle="""
    WITH edges_raw AS (
      SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
    ),
    edges AS (
      SELECT least(a, b) AS u, greatest(a, b) AS v FROM edges_raw
      GROUP BY 1, 2
    ),
    tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM edges e1
      JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
      JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
    ),
    per_node AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM (SELECT x AS node FROM tri UNION ALL
            SELECT y FROM tri UNION ALL
            SELECT z FROM tri)
      GROUP BY node
    )
    SELECT CAST(node AS INT) AS node, n_triangles FROM per_node
    """,
    tags=("batch", "graph", "join"),
)
def q_graph_triangles(spark, sf_dir):
    """Graph-ext: per-node triangle counting on the nation trade graph
    (nations joined by an order shipping between them). Classic
    node-iterator formulation: canonicalize each undirected edge to
    (u < v), then join wedges u-v, u-w (v < w) against the closing edge
    v-w — each triangle found exactly once as u < v < w.

    Scale shape: two shuffles on edge endpoints; candidate wedges are
    bounded by sum(deg²) — at 100 TB the standard mitigation (orient
    edges from low- to high-degree endpoint, which this canonical
    ordering approximates) keeps the wedge set near-linear for
    power-law graphs. No driver-side state; the dense 25-node nation
    projection here is deliberately small so the oracle's cubic check
    stays cheap while the Spark plan is the real distributed one."""
    t = tables(spark, sf_dir)
    # fact-fact join MERGE-pinned (same pruned-scan-estimate law as
    # _bipartite_edges); the dim joins after it stay broadcastable
    raw = (
        t.orders.join(
            t.lineitem.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("u"),
            F.greatest("c_nationkey", "s_nationkey").alias("v"),
        )
        .distinct()
    )
    e1 = raw.alias("e1")
    e2 = raw.alias("e2")
    e3 = raw.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")),
        )
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    nodes = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


@register(
    "q_graph_degree_stats",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000000 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    deg AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY src)
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg
    GROUP BY degree
    """,
    tags=("batch", "graph", "agg"),
)
def q_graph_degree_stats(spark, sf_dir):
    """Graph-ext: degree distribution of the customer–supplier graph —
    the first question asked of any large graph (power-law tail ⇒ hub
    nodes ⇒ skew strategy for every downstream join). Two hash
    aggregates over the symmetrized edge list: per-node degree, then
    nodes per degree. The same histogram drives the wedge-bound
    estimate for q_graph_triangles (Σ deg²) and the salting decision
    for hot-node joins."""
    edges = _bipartite_edges(spark, sf_dir)
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


@register(
    "q_graph_common_neighbors",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    capped AS (
      SELECT cust, supp FROM (
        SELECT cust, supp, count(*) OVER (PARTITION BY cust) AS cdeg
        FROM edges
      ) WHERE cdeg <= 64
    ),
    deg AS (SELECT supp, count(*) AS d FROM capped GROUP BY supp),
    pairs AS (
      SELECT a.supp AS s1, b.supp AS s2,
             CAST(count(*) AS BIGINT) AS n_common
      FROM capped a JOIN capped b ON a.cust = b.cust AND a.supp < b.supp
      GROUP BY a.supp, b.supp
    )
    SELECT s1, s2, n_common,
           round(CAST(n_common AS DOUBLE)
                 / (d1.d + d2.d - n_common), 6) AS jaccard
    FROM pairs JOIN deg d1 ON s1 = d1.supp JOIN deg d2 ON s2 = d2.supp
    WHERE n_common >= 20
    ORDER BY jaccard DESC, s1, s2 LIMIT 50
    """,
    tags=("batch", "graph", "join"),
)
def q_graph_common_neighbors(spark, sf_dir):
    """Graph-ext: common-neighbor link prediction — supplier pairs
    ranked by the Jaccard similarity of their customer bases (top-50
    with >= 20 shared customers, deterministic tiebreak): the
    "suppliers serving the same market" score a co-supplier recommender
    or assortment analysis starts from.

    Scale shape: the pair discovery is an inverted-index self-join on
    the shared CUSTOMER — chosen over the supplier side deliberately:
    candidate wedges are Sum(deg_cust²), and customer degrees are
    small and bounded here (median ~35) where supplier degrees are
    ~500 (the supplier-keyed formulation measured 108 s at sf0.1; this
    one is ~2 s). Hub customers above degree 64 are dropped BEFORE the
    join (the df-cap guard, same policy as the shingle caps — degrees
    and Jaccard are computed consistently over the capped universe),
    so wedge cost stays bounded under any skew. Then one pair hash
    aggregate, two broadcast-sized degree joins, and a
    TakeOrderedAndProject top-50 — never an all-pairs matrix."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    # fact-fact join: MERGE pinned for the same reason as
    # _bipartite_edges (pruned-scan estimate under-sizes a fact side)
    edges = (
        t.orders.join(
            t.lineitem.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    w_c = Window.partitionBy("cust")
    capped = (
        edges.withColumn("cdeg", F.count(F.lit(1)).over(w_c))
        .where(F.col("cdeg") <= 64)
        .drop("cdeg")
    )
    deg = capped.groupBy("supp").agg(F.count(F.lit(1)).alias("d"))
    a = capped.select(F.col("supp").alias("s1"), "cust")
    b = capped.select(F.col("supp").alias("s2"), "cust")
    pairs = (
        a.join(b, "cust")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= 20)
    )
    # degree tables grow with the supplier population — SHUFFLE_HASH
    # with them as the sharded build side, not a broadcast candidate
    d1 = deg.select(F.col("supp").alias("s1"), F.col("d").alias("deg1"))
    d2 = deg.select(F.col("supp").alias("s2"), F.col("d").alias("deg2"))
    return (
        pairs.join(d1.hint("shuffle_hash"), "s1")
        .join(d2.hint("shuffle_hash"), "s2")
        .select(
            "s1",
            "s2",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("deg1") + F.col("deg2") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "s1", "s2")
        .limit(50)
    )
