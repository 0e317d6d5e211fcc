"""End-to-end experimentation/ops-analytics job over the events stream:
the continuation-session operator tier driven through the public
surfaces — fluent API with accumulator-style metrics, async enrichment,
and the registry's A/B + anomaly + session analytics.

Pipeline:
  1. load events with the engine loader (nanos-ts normalization);
  2. attach Observation metrics (rows, distinct users) that ride the
     first action — Flink-accumulator style, zero extra passes;
  3. enrich event types with a bulk-lookup table via async_enrich
     (the AsyncFunction analog; deterministic in-process lookup here);
  4. run the A/B Welch readout, the 3-sigma rate-anomaly scan, and the
     session quality rollup from the registry;
  5. print the reports.

Run: ``python examples/experiment_analysis_job.py [sf_dir]``
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from flink_quickstart_spark.api import StreamExecutionEnvironment
from flink_quickstart_spark.operators.enrich import async_enrich
from flink_quickstart_spark.plans import load_all, registry


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    env = StreamExecutionEnvironment.get_execution_environment()
    load_all()

    # 1-2: source + metrics that piggyback on the first action
    # (observed metrics reject DISTINCT aggregates — use the HLL sketch,
    # the same choice a streaming accumulator would make)
    events = env.read_table("events", sf_dir).with_metrics(
        "ingest",
        n_rows=F.count(F.lit(1)),
        n_users_approx=F.approx_count_distinct("user_id"),
    )

    # 3: AsyncFunction-style enrichment (bulk lookup per Arrow batch)
    catalog = {
        "click": "engagement",
        "view": "engagement",
        "purchase": "revenue",
        "signup": "growth",
    }

    def lookup(keys):
        return {k: catalog.get(k, "other") for k in keys}

    enriched = async_enrich(
        events.to_df(), "event_type", lookup, out_col="funnel_stage"
    )
    stage_mix = (
        enriched.groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("funnel_stage")
    )
    print("== funnel-stage mix ==")
    stage_mix.show(truncate=False)
    print("ingest metrics:", env.metrics("ingest"))

    # 4: registry analytics
    for key in ("q_ab_welch_ttest", "q_window_rate_anomaly", "q_session_stats"):
        df = registry.REGISTRY[key].builder(env._spark, sf_dir)
        print(f"== {key} ==")
        df.orderBy(df.columns[0]).show(5, truncate=False)


if __name__ == "__main__":
    main()
