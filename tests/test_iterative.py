"""Tests for iterative operators (Flink DataSet.iterate analog).

Exact single-machine references computed in-process: union-find for
connected components, dense power iteration for PageRank.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_quickstart_spark.operators.iterative import connected_components, pagerank
from flink_quickstart_spark.sources.tables import load_tables
from tests.conftest import SF_DIR


def union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_cc_two_components(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.node, r.component) for r in connected_components(df).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_cc_matches_union_find_on_testdata_graph(spark):
    """Customer–supplier bipartite graph from orders⋈lineitem."""
    t = load_tables(spark, SF_DIR)
    edges_df = (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("dst"),
        )
        .distinct()
    )
    got = {(r.node, r.component) for r in connected_components(edges_df).collect()}
    ref = union_find([(r.src, r.dst) for r in edges_df.collect()])
    assert got == set(ref.items())


def test_pagerank_matches_power_iteration(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]  # 4 has in-degree 0; 3 is a hub
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iterations=15).collect()}

    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(15):
        nxt = np.zeros(n)
        dangling = sum(r[idx[u]] for u in nodes if u not in out)
        for s, ds in out.items():
            for t_ in ds:
                nxt[idx[t_]] += r[idx[s]] / len(ds)
        r = (1 - d) / n + d * dangling / n + d * nxt
    for node in nodes:
        assert got[node] == pytest.approx(r[idx[node]], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_dangling_mass_conserved(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")  # 2 is dangling
    ranks = {r.node: r.rank for r in pagerank(df, iterations=20).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert ranks[2] > ranks[1]  # 2 receives 1's mass


def test_dedup_groups_cluster_properties(spark):
    """q_llm_dedup_groups invariants on real data: canonical assignment
    equals union-find over the operator's own pair graph; canon_id is
    the cluster minimum; cluster_size counts members; every document
    appears exactly once."""
    from flink_quickstart_spark.operators.dedup import jaccard_neardup_pairs
    from flink_quickstart_spark.plans import load_all
    from flink_quickstart_spark.plans.registry import REGISTRY
    from flink_quickstart_spark.sources.tables import load_tables

    load_all()

    docs = load_tables(spark, SF_DIR).documents
    pairs = [
        (r.d1, r.d2)
        for r in jaccard_neardup_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    ]
    got = {
        r.doc_id: (r.canon_id, r.cluster_size, r.is_canonical)
        for r in REGISTRY["q_llm_dedup_groups"].builder(spark, SF_DIR).collect()
    }
    n_docs = docs.count()
    assert len(got) == n_docs
    # min-reachable reference from the operator's own pair set
    uf = union_find(pairs)
    roots: dict[int, int] = {}
    for node, root in uf.items():
        roots.setdefault(root, node)
        roots[root] = min(roots[root], node)
    from collections import Counter

    canon_of = {n: roots[r] for n, r in uf.items()}
    size_of = Counter(canon_of.values())
    assert pairs, "fixture has no near-dup pairs"
    for doc, (canon, size, is_canon) in got.items():
        want_canon = canon_of.get(doc, doc)
        assert canon == want_canon, (doc, canon, want_canon)
        assert size == size_of.get(want_canon, 1)
        assert is_canon == (1 if canon == doc else 0)


def test_iterative_loops_release_superseded_checkpoints(spark):
    """r7 regression (sf3-probe OOM): every iteration localCheckpoints a
    snapshot; without releasing the superseded one, storage grows by
    O(iterations) blocks per CALL and stacks across calls in a session
    until the heap dies. After the fix, repeated calls must leave the
    persisted-RDD count bounded (the final snapshot + loop statics),
    not grow linearly with call count."""
    from flink_quickstart_spark.operators.iterative import (
        connected_components,
        pagerank,
    )

    def n_persisted():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(100, 101), (101, 102)],
        "src long, dst long",
    )
    counts = []
    for _ in range(3):
        connected_components(edges).collect()
        pagerank(edges, iterations=5).collect()
        counts.append(n_persisted())
    # each round may leave its FINAL snapshots live (the caller holds
    # them transiently), but growth must not be per-iteration: three
    # rounds of (components ~41-iter-capped + 5-iter pagerank) would
    # leak dozens of snapshots unfixed. Allow the bounded residue.
    assert counts[-1] - counts[0] <= 4, counts
    assert counts[-1] <= 12, counts
