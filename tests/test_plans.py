"""Physical-plan quality regression tests (SURVEY.md §4).

Correctness tests prove the right ROWS come back; these prove the right
PLAN produces them — the property that actually matters at 100 TB. Each
test pins an optimizer behavior the engine's scale story depends on:
filters reaching the parquet scan, scans pruned to the projected columns,
dimensions broadcast instead of shuffled, aggregates planned
partial+final (map-side combine), top-N planned without a global sort,
and rank-filter window queries using the WindowGroupLimit pushdown.

If a future query edit regresses one of these (e.g. wrapping a filter in
a non-pushable expression, or dropping a broadcast hint), these fail even
though the row-level oracle still passes.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from flink_quickstart_spark.plans import load_all, registry
from tests.conftest import SF_DIR

load_all()


def plan_of(spark, key: str, mode: str = "formatted") -> str:
    df = registry.REGISTRY[key].builder(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    return [
        line.strip()
        for line in plan.splitlines()
        if "PushedFilters" in line and "PushedFilters: []" not in line
    ]


def read_schemas(plan: str) -> list[str]:
    return [line.strip() for line in plan.splitlines() if "ReadSchema" in line]


def test_filter_reaches_parquet_scan(spark):
    """B3: the predicate must appear in the scan's PushedFilters — at
    100 TB this is the difference between reading row groups and skipping
    them via min/max statistics."""
    plan = plan_of(spark, "q_filter_pred")
    pushed = "\n".join(pushed_filters(plan))
    assert "EqualTo(event_type,purchase)" in pushed
    assert "GreaterThan(value,100.0)" in pushed


def test_flagship_agg_pushdown_pruning_partial_agg(spark):
    """D2 flagship: shipdate filter pushed; scan pruned to the 7 used
    columns (no l_orderkey/l_partkey/l_suppkey); partial+final
    HashAggregate pairs (map-side combine before the shuffle)."""
    plan = plan_of(spark, "q_agg_group")
    assert "LessThanOrEqual(l_shipdate" in "\n".join(pushed_filters(plan))
    schema = "\n".join(read_schemas(plan))
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert col not in schema, f"scan reads unused column {col}"
    # Catalyst plans grouped agg as partial + final HashAggregate.
    assert plan.count("HashAggregate") >= 2


def test_star_join_broadcasts_dims_not_shuffles(spark):
    """C3: every dim join must be a BroadcastHashJoin — shuffling the
    fact table against a 25-row dim is the canonical 100 TB mistake. The
    region filter must also prune the nation dim before broadcast."""
    plan = plan_of(spark, "q_join_star")
    assert plan.count("BroadcastHashJoin") >= 4 * 2  # 4 joins, each named twice in formatted mode
    assert "SortMergeJoin" not in plan
    assert "EqualTo(r_name,ASIA)" in "\n".join(pushed_filters(plan))
    # Scans pruned: lineitem contributes only join key + revenue columns.
    schema = "\n".join(read_schemas(plan))
    assert "l_quantity" not in schema and "l_shipdate" not in schema


def test_global_topn_avoids_total_sort(spark):
    """F2: ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-
    partition heap + driver merge), never a range-partitioned total sort
    followed by a limit."""
    plan = plan_of(spark, "q_limit_topn")
    assert "TakeOrderedAndProject" in plan


def test_topk_pergroup_uses_window_group_limit(spark):
    """E7: the row_number()<=k idiom must trigger Spark's
    WindowGroupLimit pushdown, which keeps only k rows per key per
    partition BEFORE the shuffle — the property that makes top-k-per-
    group survive a 100× scale-up."""
    plan = plan_of(spark, "q_topk_pergroup")
    assert "WindowGroupLimit" in plan


def test_projection_prunes_scan(spark):
    """B1: a 5-column projection over the 11-column lineitem must read
    exactly those 5 columns."""
    plan = plan_of(spark, "q_project_arith")
    schemas = read_schemas(plan)
    assert schemas, "no scan found"
    for col in ("l_returnflag", "l_shipdate", "l_quantity", "l_partkey"):
        assert col not in schemas[0], f"scan reads unused column {col}"


def test_broadcast_join_hint_respected(spark):
    """C2: the explicit broadcast() hint on nation must survive
    planning."""
    plan = plan_of(spark, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize(
    "key",
    ["q_agg_group", "q_join_star", "q_window_tumbling", "q_filter_pred"],
)
def test_hot_paths_stay_in_codegen(spark, key):
    """Hot-path queries must not contain row-at-a-time Python evaluation
    (BatchEvalPython) — everything stays JVM-side in whole-stage
    codegen. Pandas-UDF stages (ArrowEvalPython / MapInPandas) are the
    sanctioned Python escape hatch and only appear in keys that declare
    them. AQE hides codegen markers until the plan is final, so execute
    first and assert on the executed plan."""
    df = registry.REGISTRY[key].builder(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # whole-stage-codegen'd operators carry a "*(n)" prefix
    assert "*(" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-located bucketed join (docs/SCALE_DESIGN.md): two tables
    bucketed on the join key with equal bucket counts must join with ZERO
    Exchange operators — the storage layout replaces the shuffle. This is
    the designed path for repeated 100 TB fact⋈fact joins."""
    from flink_quickstart_spark.plans.registry import tables
    from flink_quickstart_spark.sources.bucketing import read_table, write_bucketed

    t = tables(spark, SF_DIR)
    write_bucketed(t.orders, "b_orders", str(tmp_path / "b_orders"), "o_custkey", 4)
    write_bucketed(
        t.customer, "b_customer", str(tmp_path / "b_customer"), "c_custkey", 4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the shuffle question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "b_orders").join(
            read_table(spark, "b_customer"),
            read_table(spark, "b_orders").o_custkey
            == read_table(spark, "b_customer").c_custkey,
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_range_join_avoids_nested_loop(spark):
    """C8 scale path: the binned range join must plan as a hash/merge
    equi-join on the bucket key — a BroadcastNestedLoopJoin here means
    the rewrite regressed to the quadratic plan."""
    plan = plan_of(spark, "q_join_range_binned", mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_correlated_subquery_is_decorrelated(spark):
    """The correlated scalar subquery must be rewritten to an
    aggregate+join (no per-row subquery execution): the plan contains a
    partial/final aggregate pair and a join, and runs as ordinary
    shuffles."""
    plan = plan_of(spark, "q_sql_corr_subquery", mode="simple")
    assert "Join" in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_sql_exists_plans_semi_join(spark):
    """q_sql_exists: the correlated EXISTS must be rewritten to a LEFT
    SEMI join (RewritePredicateSubquery) — the probe side never
    duplicates, one equi-join shuffle."""
    plan = plan_of(spark, "q_sql_exists")
    assert "LeftSemi" in plan, plan


def test_sql_cte_topk_plans_window_group_limit(spark):
    """q_sql_cte_topk: rn <= 3 must push into WindowGroupLimit (per-
    partition top-k before the full window sort) and the window must be
    partitioned (by nation) — never a single-partition WindowExec."""
    plan = plan_of(spark, "q_sql_cte_topk")
    assert "WindowGroupLimit" in plan, plan


def test_gopher_filters_stay_jvm_side(spark):
    """q_text_gopher_filters: the whole rule battery is expressions +
    two hash aggregates — no Python evaluation anywhere in the plan."""
    plan = plan_of(spark, "q_text_gopher_filters")
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan
    assert plan.count("HashAggregate") >= 4  # partial+final × two aggs


def test_pii_scrub_prunes_scan(spark):
    """q_text_pii_scrub reads only the two columns it needs."""
    schemas = read_schemas(plan_of(spark, "q_text_pii_scrub"))
    assert schemas and all(
        "c_custkey" in s and "c_name" in s and "c_acctbal" not in s
        for s in schemas
    ), schemas


def test_bucketed_join_key_has_no_shuffle_exchange(spark):
    """q_join_bucketed: co-located bucket reads — ZERO shuffle exchanges
    anywhere in the plan. Even the post-join aggregate reuses the bucket
    partitioning on the key (a BroadcastExchange may appear at gate
    scale when one side fits under the threshold — broadcast is not a
    shuffle)."""
    plan = plan_of(spark, "q_join_bucketed", mode="simple")
    assert plan.count("Bucketed: true") == 2, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_sql_q17_decorrelates_to_agg_join(spark):
    """q_sql_q17: the correlated scalar AVG must decorrelate into a
    per-partkey aggregate joined back on the equi-key — never a
    nested-loop re-scan per row."""
    plan = plan_of(spark, "q_sql_q17")
    assert "NestedLoop" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_sql_q19_disjunction_stays_hash_join(spark):
    """q_sql_q19: the OR-of-ANDs mixes columns from both sides, but the
    common p_partkey = l_partkey conjunct must keep this a hash-family
    equi-join (broadcast or sort-merge), not a nested loop."""
    plan = plan_of(spark, "q_sql_q19")
    assert "NestedLoop" not in plan, plan


def test_pack_sequences_windows_partitioned(spark):
    """q_llm_pack_sequences: the distributed prefix sum must plan every
    Window node WITH a partition spec (the rank bucket) — the naive
    Window.orderBy() cumulative sum would be a single-partition
    WindowExec, the scale-killer this operator exists to avoid."""
    df = registry.REGISTRY["q_llm_pack_sequences"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    saw_window = False
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            saw_window = True
            assert "_rank_bucket" in line, line
    assert saw_window, plan


def test_partitioned_scan_prunes_partitions(spark):
    """A-family: the event_type filter over a hive-partitioned layout must
    resolve as PartitionFilters on the scan (directory pruning at planning
    time) — NOT as a data filter evaluated per row. At 100 TB this is what
    turns a full-table scan into reading 2 of N directories."""
    plan = plan_of(spark, "q_scan_partitioned_roundtrip")
    part_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "PartitionFilters: []" not in ln
    ]
    assert part_lines, "expected non-empty PartitionFilters on the scan"
    assert "event_type" in "\n".join(part_lines)


def test_bm25_broadcasts_small_sides(spark):
    """K-ext BM25: the df/avgdl/N sides must broadcast (they are
    vocabulary-sized or scalar); the doc-length join may shuffle on
    doc_id but nothing may plan a cartesian product of facts."""
    plan = plan_of(spark, "q_llm_bm25")
    assert plan.count("BroadcastExchange") >= 3
    assert "CartesianProduct" not in plan


def test_xent_unigram_broadcasts_vocab(spark):
    """K-ext cross-entropy: the unigram count table joins back to the
    token stream as a broadcast — a shuffle join on `tok` would re-key
    the whole corpus by word for no reason."""
    plan = plan_of(spark, "q_llm_xent_unigram")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_argminmax_is_pure_hash_aggregate(spark):
    """D-family argmax/mode: struct-ordered min/max must plan as hash
    aggregates only — the whole point of the formulation is avoiding a
    partitioned window sort."""
    plan = plan_of(spark, "q_agg_argminmax")
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_resample_interp_no_global_sort(spark):
    """TS-ext resample: the lead() window partitions by user_id — there
    must be no empty-partition (global) window and no global Sort outside
    the per-partition window sort."""
    plan = plan_of(spark, "q_ts_resample_interp")
    assert "Window" in plan
    # the formatted plan spells the partition spec inside
    # windowspecdefinition(...); a global window would have no partition
    # column there.
    assert "windowspecdefinition(user_id" in plan, (
        "window must be partitioned by user_id"
    )


def test_nullsafe_join_is_hash_join(spark):
    """C-ext: null-safe equality must plan as a HASH join (broadcast or
    shuffled) — the OR-expanded formulation would fall to
    BroadcastNestedLoopJoin and die at scale."""
    plan = plan_of(spark, "q_join_nullsafe")
    assert "HashJoin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
