"""Streaming face of the HLL approx-distinct MV (r12, VERDICT r11 #4).

r11 added the ``approx_count_distinct`` MV spec (DataSketches HLL
partial state, hll_union_agg merge) and pinned the batch-incremental
and epoch merge-on-read paths (tests/test_generations_r11.py). This
file pins the remaining face: a REAL Structured Streaming run through
foreachBatch(foreach_batch_mv_refresh) maintaining an HLL MV, the same
way tests/test_matview_stream_r10.py pins sum/count.

Contracts:

1. Streamed (3-file availableNow, maxFilesPerTrigger=1) == one flat
   mv_build over everything: counts exact-equal AND HLL estimates
   EXACT-equal — the DataSketches union is lossless over register
   state, so any drift (double-merged epoch, dropped bucket, wrong lgK
   in the union) shows up as a changed estimate, not just a worse one.
2. A replayed HLL epoch REPLACES its first attempt: the group-partition
   row multiset (sketch bytes included) and the finalized read are both
   unchanged. Union being idempotent would mask a double-merge at read
   time, so the layout-level multiset check is the one that matters.
3. compact_mv on the streamed store folds the sketch epochs into the
   base without changing a single estimate (union associativity,
   re-pinned here on the streaming-written store).
"""

from __future__ import annotations

import os
from collections import Counter

from pyspark.sql import functions as F

from flink_quickstart_spark.operators.matview import (
    compact_mv,
    mv_build,
    mv_read,
    mv_refresh,
)
from flink_quickstart_spark.streaming.harness import (
    foreach_batch_mv_refresh,
)

SPEC_HLL = [
    ("count", "*", "n_rows"),
    ("approx_count_distinct", "u", "nu_est"),
]


def _rows(spark, lo, hi):
    # ~4 users repeat per group key so distinct-counts differ from counts
    return spark.range(lo, hi).select(
        (F.col("id") % 17).cast("bigint").alias("k"),
        F.concat(F.lit("u"), (F.col("id") % 2500).cast("string")).alias("u"),
    )


def _read_map(spark, path):
    return {
        r.k: (r.n_rows, int(r.nu_est))
        for r in mv_read(spark, path).select("k", "n_rows", "nu_est").collect()
    }


def _group_rows(spark, path):
    df = spark.read.parquet(os.path.join(path, "groups"))
    return Counter(tuple(r) for r in df.collect())


def test_streaming_hll_mv_equals_flat_build(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    _rows(spark, 0, 6000).repartition(3).write.parquet(src_dir)
    path = str(tmp_path / "emv")
    mv_build(
        _rows(spark, 0, 1).where(F.lit(False)), path, ["k"], SPEC_HLL,
        n_buckets=8, epoch_partitioned=True,
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_mv_refresh(path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ref = str(tmp_path / "ref")
    mv_build(_rows(spark, 0, 6000), ref, ["k"], SPEC_HLL, n_buckets=8)
    streamed, flat = _read_map(spark, path), _read_map(spark, ref)
    assert streamed == flat
    # and the estimates are honest: within the lgK=12 contract of exact
    exact = {
        r.k: r.nu
        for r in _rows(spark, 0, 6000)
        .groupBy("k")
        .agg(F.countDistinct("u").alias("nu"))
        .collect()
    }
    for k, (_, nu_est) in streamed.items():
        assert abs(nu_est - exact[k]) <= max(1, 0.05 * exact[k])

    # 3. folding the streamed epochs changes nothing
    compact_mv(spark, path)
    assert _read_map(spark, path) == flat


def test_streaming_hll_epoch_replay_replaces(spark, tmp_path):
    path = str(tmp_path / "emv")
    base = _rows(spark, 0, 3000)
    b1, b2 = _rows(spark, 3000, 4000), _rows(spark, 4000, 5000)
    mv_build(base, path, ["k"], SPEC_HLL, n_buckets=8, epoch_partitioned=True)
    mv_refresh(spark, path, b1, epoch=1)
    mv_refresh(spark, path, b2, epoch=2)
    clean_rows = _group_rows(spark, path)
    clean_read = _read_map(spark, path)
    # crash-replay interleavings: epoch 2 alone, then 1 and 2 again
    mv_refresh(spark, path, b2, epoch=2)
    mv_refresh(spark, path, b1, epoch=1)
    mv_refresh(spark, path, b2, epoch=2)
    assert _group_rows(spark, path) == clean_rows
    assert _read_map(spark, path) == clean_read
