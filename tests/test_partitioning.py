"""Partitioned-layout tests — the scan-side half of the 100 TB story.

Hive-style partitioned parquet (docs/SCALE_DESIGN.md) is how a 100 TB
events table is actually laid out: partition columns become directories,
and a filter on the partition column must turn into PartitionFilters —
pruning whole directories BEFORE any file is opened — rather than
PushedFilters evaluated against row-group stats.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_quickstart_spark.sources.tables import load_tables
from tests.conftest import SF_DIR


def test_partition_filter_prunes_directories(spark, tmp_path):
    t = load_tables(spark, SF_DIR)
    out = str(tmp_path / "events_by_type")
    t.events.write.partitionBy("event_type").parquet(out)

    filtered = spark.read.parquet(out).where(F.col("event_type") == "purchase")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must be a partition filter, not a data filter
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "purchase" in pf.group(1), f"partition filter missing: {plan[:500]}"

    # semantics preserved vs unpartitioned source
    expected = t.events.where(F.col("event_type") == "purchase").count()
    assert filtered.count() == expected


def test_partitioned_roundtrip_preserves_rows(spark, tmp_path):
    t = load_tables(spark, SF_DIR)
    out = str(tmp_path / "orders_by_status")
    t.orders.write.partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == t.orders.count()
    got = {r.o_orderstatus for r in back.select("o_orderstatus").distinct().collect()}
    exp = {
        r.o_orderstatus for r in t.orders.select("o_orderstatus").distinct().collect()
    }
    assert got == exp


def test_corrupt_json_records_quarantined_not_fatal(spark, tmp_path):
    """Source robustness: a 100 TB ingest WILL contain malformed rows.
    PERMISSIVE mode with a corrupt-record column must load the good rows
    and capture the bad ones for quarantine instead of failing the job."""
    p = tmp_path / "raw.json"
    p.write_text('{"id": 1, "v": "ok"}\n{not json at all}\n{"id": 2, "v": "ok2"}\n')
    df = (
        spark.read.schema("id long, v string, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(str(p))
    ).cache()  # cache: referencing only _corrupt plus the data cols is
    # otherwise disallowed in Spark's one-pass parse
    try:
        good = df.where(F.col("_corrupt").isNull())
        bad = df.where(F.col("_corrupt").isNotNull())
        assert {(r.id, r.v) for r in good.collect()} == {(1, "ok"), (2, "ok2")}
        assert bad.count() == 1
        assert "{not json at all}" in bad.collect()[0]._corrupt
    finally:
        df.unpersist()
