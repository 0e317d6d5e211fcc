"""Query registry — the single source of truth wiring SURVEY.md §2 rows to
the driver contract in ``__spark_entry__.py``.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the ANSI-SQL
oracle string DuckDB runs on the same parquet views. Column names are
aliased identically on both sides (the driver sorts columns by name before
value-hashing), every floating aggregate is ROUNDed on both sides (double
summation order differs between engines), and ``events.ts``-derived outputs
are emitted as epoch-microsecond bigints (exact on both engines).

Keys with ``oracle=None`` are declared rows-only (approx/randomized ops the
driver checks by row count alone).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession

from flink_quickstart_spark.sources.tables import load_tables

Builder = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}

# Per-session cache of loaded table namespaces, keyed by sf_dir. Avoids
# re-deriving the events ts-conversion plan on every query build.
_TABLE_CACHE: dict[tuple[int, str], SimpleNamespace] = {}


def tables(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    key = (id(spark), sf_dir.rstrip("/"))
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = load_tables(spark, sf_dir.rstrip("/"))
    return _TABLE_CACHE[key]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str, oracle: str | None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


# Keys with a green driver-side CORRECTNESS row from round 1
# (CORRECTNESS_r01.json covered exactly these 50). The driver caps a
# round at ~50 keys and appears to take them in dict order, so
# ``queries()`` yields the keys WITHOUT prior driver evidence first —
# after round 2, every registered key has at least one driver row.
# q_llm_simhash is deliberately NOT listed: its round-1 row was a
# hash-fail (HUGEINT oracle typing, fixed since), so it must re-run.
_DRIVER_COVERED_R1: frozenset[str] = frozenset(
    {
        "q_agg_global", "q_agg_group", "q_agg_having", "q_distinct",
        "q_agg_countdistinct", "q_agg_approxcd", "q_agg_rollup", "q_agg_cube",
        "q_agg_groupingsets", "q_pivot", "q_udaf_wavg", "q_agg_percentile",
        "q_agg_histogram", "q_fn_string", "q_fn_datetime", "q_fn_math",
        "q_fn_conditional", "q_fn_array", "q_fn_map", "q_fn_json",
        "q_fn_hash", "q_udf_scalar", "q_udtf_split", "q_grouped_map_zscore",
        "q_graph_components", "q_graph_pagerank", "q_join_orders_customer",
        "q_join_broadcast", "q_join_star", "q_join_outer", "q_join_semi",
        "q_join_anti", "q_join_cross", "q_join_theta", "q_join_interval",
        "q_join_asof", "q_cogroup_stats", "q_join_range_binned",
        "q_llm_dedup_exact", "q_llm_neardup", "q_llm_neardup_minhash",
        "q_llm_knn", "q_llm_neardup_cosine", "q_llm_ann_ivf",
        "q_llm_ann_lsh", "q_llm_wordcount", "q_llm_tfidf",
        "q_llm_langstats", "q_llm_lexicon_score",
    }
)


# Keys first registered in round 2 — no driver evidence yet, but younger
# than the round-1 backlog, so they queue BEHIND it: if the driver's
# per-round cap bites, the keys that have waited a full round get their
# CORRECTNESS row first (VERDICT r1 item 3).
_REGISTERED_R2: frozenset[str] = frozenset(
    {
        "q_llm_dedup_groups", "q_llm_decontaminate", "q_text_gopher_filters",
        "q_text_pii_scrub", "q_text_fuzzy_match", "q_agg_stats_family",
        "q_agg_salted", "q_agg_bool", "q_agg_collect", "q_unpivot",
        "q_sql_exists", "q_sql_cte_topk", "q_scan_orc_roundtrip",
        "q_ts_ffill", "q_sessionize_gaps_islands", "q_multimodal_framesample",
        "q_join_bucketed", "q_wf_nth", "q_scan_json_corrupt",
        "q_sql_q5", "q_sql_q7", "q_sql_q8", "q_sql_q13", "q_sql_q15",
        "q_sql_q17", "q_sql_q18", "q_sql_q19", "q_llm_chunk",
        "q_llm_dedup_spans", "q_llm_pack_sequences", "q_llm_sample_balanced",
    }
)


def _driver_order(names) -> list[str]:
    """Three tiers — r1 backlog (uncovered since round 1, incl. the fixed
    simhash re-run), then round-2 newcomers, then r1-covered keys —
    registration order preserved within each tier."""
    names = list(names)

    def tier(n: str) -> int:
        if n in _DRIVER_COVERED_R1:
            return 2
        if n in _REGISTERED_R2:
            return 1
        return 0

    return sorted(names, key=lambda n: (tier(n), names.index(n)))


def queries() -> dict[str, Builder]:
    from flink_quickstart_spark import plans

    plans.load_all()
    return {name: REGISTRY[name].builder for name in _driver_order(REGISTRY)}


def oracle_sql() -> dict[str, str]:
    from flink_quickstart_spark import plans

    plans.load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _driver_order(REGISTRY)
        if REGISTRY[name].oracle is not None
    }
