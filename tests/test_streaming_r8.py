"""§2.I13 depth, round 8 (VERDICT r7 #5): extend the RocksDB
kill-and-restart exactly-once coverage from the windowed-aggregation /
dropDuplicates paths to the remaining stateful operators:

- ``dropDuplicatesWithinWatermark`` (streaming/stateful.py
  streaming_dedup — the bounded-state production dedup): phase 2
  replays EXACT duplicates of phase 1's rows after a fresh query object
  restarts from the checkpoint. The watermark delay is set far above
  the data's time span, so none of the phase-2 rows can be discarded as
  late — ONLY the restored dedup state can suppress them.
- stream-stream INTERVAL JOIN: phase 1 feeds only the click side (the
  join buffers clicks in the state store and emits nothing); phase 2
  feeds matching purchases to a FRESH query on the same checkpoint. The
  matches can only be produced from restored click state — losing it
  silently yields zero output, which is the failure this pins.
"""

from __future__ import annotations

import glob
import os
import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def scratch(tmp_path):
    d = {
        "clicks": str(tmp_path / "clicks"),
        "purchases": str(tmp_path / "purchases"),
        "src": str(tmp_path / "src"),
        "sink": str(tmp_path / "sink"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    for k in ("clicks", "purchases", "src"):
        os.makedirs(d[k], exist_ok=True)
    return d


N = 100
BASE_US = 1_700_000_000_000_000  # fixed epoch base (µs)


def _write_rows(spark, rows, schema, dest_dir):
    stage = os.path.join(dest_dir, f"_stage_{uuid.uuid4().hex[:8]}")
    spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    ).drop("ts_us").coalesce(1).write.mode("overwrite").parquet(stage)
    for part in glob.glob(os.path.join(stage, "part-*.parquet")):
        os.rename(part, os.path.join(dest_dir, os.path.basename(part)))


def _clicks(spark, dest):
    rows = [(i, i % 17, BASE_US + i * 1_000_000) for i in range(N)]
    _write_rows(spark, rows, "click_id long, user_id long, ts_us long", dest)


def _purchases(spark, dest):
    # each purchase lands 30 s after its click — inside the 2 min window
    rows = [(1000 + i, i % 17, BASE_US + i * 1_000_000 + 30_000_000) for i in range(N)]
    _write_rows(spark, rows, "purchase_id long, user_id long, ts_us long", dest)


def _run_dedup_within_watermark_once(spark, scratch):
    from flink_quickstart_spark.streaming.stateful import streaming_dedup

    stream = spark.readStream.schema("click_id long, user_id long, ts timestamp").parquet(
        scratch["src"]
    )
    # streaming_dedup keys on (user_id, event_type); synthesize the type
    events = stream.select(
        "user_id", F.lit("click").alias("event_type"), "ts", "click_id"
    )
    out = streaming_dedup(events, watermark="3650 days")
    q = (
        out.writeStream.format("parquet")
        .option("path", scratch["sink"])
        .option("checkpointLocation", scratch["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedup_within_watermark_exactly_once_across_restart(spark, scratch):
    _clicks(spark, scratch["src"])
    _run_dedup_within_watermark_once(spark, scratch)
    phase1 = spark.read.parquet(scratch["sink"]).count()
    assert phase1 == 17, "one row per (user, type) expected"

    # phase 2: exact duplicates, fresh query, same checkpoint. The huge
    # watermark delay guarantees none are droppable as late — only the
    # RESTORED state can suppress them.
    _clicks(spark, scratch["src"])
    _run_dedup_within_watermark_once(spark, scratch)
    out = spark.read.parquet(scratch["sink"])
    assert out.count() == 17, "duplicates leaked: dedup state lost on restart"
    state_files = glob.glob(os.path.join(scratch["ckpt"], "state", "**"), recursive=True)
    assert any(
        f.endswith((".zip", ".sst", ".changelog")) or "rocksdb" in f.lower()
        for f in state_files
    ), "no RocksDB state artifacts under checkpoint"


def _run_interval_join_once(spark, scratch):
    clicks = (
        spark.readStream.schema("click_id long, user_id long, ts timestamp")
        .parquet(scratch["clicks"])
        .withWatermark("ts", "1 hour")
        .alias("c")
    )
    purchases = (
        spark.readStream.schema("purchase_id long, user_id long, ts timestamp")
        .parquet(scratch["purchases"])
        .withWatermark("ts", "1 hour")
        .alias("p")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c.user_id = p.user_id AND "
            "p.ts BETWEEN c.ts AND c.ts + INTERVAL 2 MINUTES AND "
            "p.purchase_id = c.click_id + 1000"
        ),
    ).select("c.click_id", "c.user_id", "p.purchase_id")
    q = (
        joined.writeStream.format("parquet")
        .option("path", scratch["sink"])
        .option("checkpointLocation", scratch["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_interval_join_state_survives_restart(spark, scratch):
    # phase 1: clicks only — the join buffers them as state, emits nothing
    _clicks(spark, scratch["clicks"])
    _run_interval_join_once(spark, scratch)
    assert spark.read.parquet(scratch["sink"]).count() == 0

    # phase 2: matching purchases arrive at a FRESH query on the same
    # checkpoint — every match must come from RESTORED click state
    _purchases(spark, scratch["purchases"])
    _run_interval_join_once(spark, scratch)
    out = spark.read.parquet(scratch["sink"])
    assert out.count() == N, (
        f"expected {N} matches from restored click state, got {out.count()}"
    )
    assert out.select("click_id").distinct().count() == N

    # phase 3 (exactly-once, not just at-least-once): re-running with no
    # new input must add nothing — matched state is not re-emitted
    _run_interval_join_once(spark, scratch)
    assert spark.read.parquet(scratch["sink"]).count() == N


def test_streaming_index_query_matches_batch(spark, tmp_path):
    """Online retrieval over the persisted IVF index: a file stream of
    query vectors, foreachBatch probing the build-once index, must
    produce exactly the batch answer for the same queries — the
    stream-static enrichment shape of SURVEY §2 K4c."""
    from flink_quickstart_spark.operators.similarity import (
        ensure_ivf_index,
        ivf_query_index,
    )
    from flink_quickstart_spark.plans.registry import tables
    from flink_quickstart_spark.streaming.harness import (
        foreach_batch_index_query,
    )
    from tests.conftest import SF_DIR

    emb = tables(spark, SF_DIR).embeddings
    idx = str(tmp_path / "ivf")
    ensure_ivf_index(emb, idx, f"{SF_DIR}/embeddings.parquet", n_clusters=16)

    # stage the query batch as a streamed file source
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    queries = emb.orderBy("vec_id").limit(32)
    queries.write.parquet(src)
    stream = spark.readStream.schema(queries.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_index_query(idx, sink, k=3, n_probe=4)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r.query_id, r.nbr_id, r.rank)
        for r in spark.read.parquet(sink).collect()
    }
    batch = {
        (r.query_id, r.nbr_id, r.rank)
        for r in ivf_query_index(spark, idx, queries, k=3, n_probe=4).collect()
    }
    assert streamed == batch and len(streamed) == 96
