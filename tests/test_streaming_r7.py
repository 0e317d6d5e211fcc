"""§2.I13 depth (VERDICT r6 #8): stateful streaming under the RocksDB
state store provider with a stop-and-restart from checkpoint, asserting
exactly-once output.

The stream is a keyed dedup (``dropDuplicates`` on event_id) whose
state — the seen-key set — lives in the state store. The input arrives
in two phases: phase 1 processes file A and the query stops (the
process-death analog: a fresh query object restarts from the same
checkpoint); phase 2 adds file B whose rows are EXACT DUPLICATES of
file A's. Exactly-once then requires the phase-1 state to survive the
restart: if the RocksDB state were lost, every file-B row would pass
the dedup and double the sink. Offsets alone cannot mask that — file B
was never processed before the restart.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import pytest

from flink_quickstart_spark.sources.tables import load_table
from tests.conftest import SF_DIR

N_EVENTS = 500


@pytest.fixture()
def scratch(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "sink": str(tmp_path / "sink"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _stage_file(spark, src_dir, name):
    """Write the SAME N_EVENTS events slice as one parquet file."""
    df = load_table(spark, SF_DIR, "events").orderBy("event_id").limit(N_EVENTS)
    stage = os.path.join(src_dir, f"_stage_{uuid.uuid4().hex[:8]}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.makedirs(src_dir, exist_ok=True)
    shutil.move(part, os.path.join(src_dir, name))
    shutil.rmtree(stage)


def _run_dedup_once(spark, scratch):
    """One availableNow dedup pass: src dir -> parquet sink, checkpointed."""
    schema = load_table(spark, SF_DIR, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(scratch["src"])
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", scratch["sink"])
        .option("checkpointLocation", scratch["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_rocksdb_provider_is_active(spark):
    assert "RocksDBStateStoreProvider" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )


def test_dedup_exactly_once_across_restart(spark, scratch):
    # phase 1: file A alone, run to completion, query object discarded
    _stage_file(spark, scratch["src"], "a.parquet")
    _run_dedup_once(spark, scratch)
    phase1 = spark.read.parquet(scratch["sink"])
    assert phase1.count() == N_EVENTS

    # phase 2: file B = exact duplicates of A; FRESH query, same checkpoint
    _stage_file(spark, scratch["src"], "b.parquet")
    _run_dedup_once(spark, scratch)

    out = spark.read.parquet(scratch["sink"])
    assert out.count() == N_EVENTS, "duplicates leaked: dedup state lost on restart"
    assert out.select("event_id").distinct().count() == N_EVENTS

    # the state that enforced this is on disk under the checkpoint —
    # RocksDB maintains per-partition instance dirs + uploaded snapshots
    state_files = glob.glob(os.path.join(scratch["ckpt"], "state", "**"), recursive=True)
    assert any(
        f.endswith((".zip", ".sst", ".changelog")) or "rocksdb" in f.lower()
        for f in state_files
    ), f"no RocksDB state artifacts under checkpoint: {state_files[:10]}"
