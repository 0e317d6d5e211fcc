"""Tests: transformWithStateInPandas timers (I9) and the late-data side
output (G-1)."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from flink_quickstart_spark.sources.tables import load_table
from flink_quickstart_spark.streaming.harness import (
    events_stream,
    foreach_batch_with_late_side_output,
)
from flink_quickstart_spark.streaming.timers import inactivity_sessions, tws_available
from tests.conftest import SF_DIR
import pytest


@pytest.mark.skipif(
    not tws_available(),
    reason="transformWithStateInPandas needs protobuf (deploy-time dep, not in container)",
)
def test_timer_sessionizer_closes_sessions(spark):
    """availableNow replay: the final watermark fires outstanding timers
    for all sessions whose gap elapsed before end-of-input; emitted
    sessions must agree with the batch session_window for those users."""
    out = inactivity_sessions(events_stream(spark, SF_DIR))
    q = (
        out.writeStream.format("memory")
        .queryName("timer_sessions")
        .outputMode("append")
        .option(
            "checkpointLocation",
            os.path.join(tempfile.gettempdir(), "fqs_scratch", "ckpt", f"timer_sess_{uuid.uuid4().hex[:8]}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
        for r in spark.table("timer_sessions").collect()
    }
    assert got, "no sessions emitted"

    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("ss"),
            F.unix_micros("w.end").alias("se"),
            "n",
        )
    )
    expected = {(r.user_id, r.ss): (r.se, r.n) for r in batch.collect()}
    # Every emitted session must match a batch session exactly; sessions
    # still open at end-of-input (watermark never passed their timer) may
    # be missing — that is watermark semantics, not data loss.
    for key, val in got.items():
        assert expected.get(key) == val, (key, val, expected.get(key))
    assert len(got) >= 0.8 * len(expected)


def test_late_side_output_routes_rows(spark):
    """G-1: rows older than (batch max ts − lateness) land in quarantine,
    the rest in the main sink; nothing is silently dropped."""
    on_time_dir = os.path.join(tempfile.gettempdir(), "fqs_scratch", "so_main")
    late_dir = os.path.join(tempfile.gettempdir(), "fqs_scratch", "so_late")
    for d in (on_time_dir, late_dir):
        shutil.rmtree(d, ignore_errors=True)

    def on_time(df, batch_id):
        df.write.mode("append").parquet(on_time_dir)

    def late(df, batch_id):
        df.write.mode("append").parquet(late_dir)

    stream = events_stream(spark, SF_DIR)
    writer = foreach_batch_with_late_side_output(stream, "ts", "20 DAYS", on_time, late)
    q = (
        writer.option(
            "checkpointLocation",
            os.path.join(tempfile.gettempdir(), "fqs_scratch", "ckpt", f"so_{uuid.uuid4().hex[:8]}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch = load_table(spark, SF_DIR, "events")
    total = batch.count()
    max_ts = batch.agg(F.max("ts")).first()[0]
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 20 DAYS")
    want_late = batch.where(F.col("ts") < cutoff).count()

    got_main = spark.read.parquet(on_time_dir).count()
    got_late = (
        spark.read.parquet(late_dir).count() if os.path.exists(late_dir) else 0
    )
    assert got_main + got_late == total
    assert got_late == want_late and want_late > 0
