"""Epoch-partitioned (streaming) MV maintenance.

The exactly-once story mirrors the admission gate's epoch store:
each micro-batch's partials land in the batch's OWN (_gmod, _epoch)
partitions via dynamic overwrite, so replay REPLACES instead of
double-counting — no marker, no crash window. Contracts:

1. base + delta epochs reads identically to a flat rebuild on the
   union (merge-on-read).
2. A replayed epoch is idempotent: store row multiset and read result
   unchanged — including the replay-after-crash interleavings.
3. Retraction = negative-delta epoch (subtractable specs):
   == rebuild-on-complement; fully-retracted groups vanish at read;
   over-retraction raises before any write.
4. min/max specs refuse epoch retraction (history is immutable and
   extremum subtraction is impossible) but refresh fine (insert-only
   min/max merge is exact).
5. compact_mv folds epochs into _epoch=0: read unchanged, file/epoch
   count restored.
6. Layout guards: flat stores forbid epoch ids, epoch stores require
   them.
7. Real Structured Streaming e2e: foreachBatch(foreach_batch_mv_refresh)
   over a multi-file availableNow stream == one flat groupBy.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from flink_quickstart_spark.operators.matview import (
    compact_mv,
    mv_build,
    mv_read,
    mv_refresh,
    mv_retract,
)

SPEC_SUB = [("count", "*", "n_rows"), ("sum", "v", "sum_v"), ("avg", "v", "avg_v")]
SPEC_MM = SPEC_SUB + [("min", "v", "min_v"), ("max", "v", "max_v")]


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 23).cast("bigint").alias("k"),
        (F.col("id") * 11 % 997).cast("double").alias("v"),
    )


def _read_set(spark, path):
    return {
        (r.k, r.n_rows, round(r.sum_v, 6), round(r.avg_v, 9))
        for r in mv_read(spark, path).select("k", "n_rows", "sum_v", "avg_v").collect()
    }


def _group_rows(spark, path):
    df = spark.read.parquet(os.path.join(path, "groups"))
    return Counter(tuple(r) for r in df.collect())


def test_epoch_refresh_reads_like_flat_rebuild(spark, tmp_path):
    path, ref = str(tmp_path / "emv"), str(tmp_path / "ref")
    base = _rows(spark, 0, 3000)
    b1, b2 = _rows(spark, 3000, 3500), _rows(spark, 3500, 4000)
    mv_build(base, path, ["k"], SPEC_SUB, n_buckets=8, epoch_partitioned=True)
    s1 = mv_refresh(spark, path, b1, epoch=1)
    s2 = mv_refresh(spark, path, b2, epoch=2)
    assert s1["epoch"] == 1 and s2["epoch"] == 2
    mv_build(_rows(spark, 0, 4000), ref, ["k"], SPEC_SUB, n_buckets=8)
    assert _read_set(spark, path) == _read_set(spark, ref)


def test_epoch_replay_idempotent(spark, tmp_path):
    path = str(tmp_path / "emv")
    base = _rows(spark, 0, 2000)
    b1, b2 = _rows(spark, 2000, 2500), _rows(spark, 2500, 3000)
    mv_build(base, path, ["k"], SPEC_SUB, n_buckets=8, epoch_partitioned=True)
    mv_refresh(spark, path, b1, epoch=1)
    mv_refresh(spark, path, b2, epoch=2)
    clean_rows = _group_rows(spark, path)
    clean_read = _read_set(spark, path)
    # crash-replay interleavings: epoch 2 alone, then 1 and 2 again
    mv_refresh(spark, path, b2, epoch=2)
    mv_refresh(spark, path, b1, epoch=1)
    mv_refresh(spark, path, b2, epoch=2)
    assert _group_rows(spark, path) == clean_rows
    assert _read_set(spark, path) == clean_read


def test_epoch_retract_negative_delta(spark, tmp_path):
    path, ref = str(tmp_path / "emv"), str(tmp_path / "ref")
    full = _rows(spark, 0, 3000)
    gone = full.where(F.col("id") >= 2000)
    mv_build(full, path, ["k"], SPEC_SUB, n_buckets=8, epoch_partitioned=True)
    stats = mv_retract(spark, path, gone, epoch=1)
    assert stats["epoch"] == 1
    mv_build(_rows(spark, 0, 2000), ref, ["k"], SPEC_SUB, n_buckets=8)
    assert _read_set(spark, path) == _read_set(spark, ref)
    # replayed retraction is idempotent too
    before = _group_rows(spark, path)
    mv_retract(spark, path, gone, epoch=1)
    assert _group_rows(spark, path) == before


def test_epoch_retract_vanish_and_over_retraction(spark, tmp_path):
    path = str(tmp_path / "emv")
    full = _rows(spark, 0, 2000)
    mv_build(full, path, ["k"], SPEC_SUB, n_buckets=8, epoch_partitioned=True)
    g0 = full.where(F.col("k") == 3)
    stats = mv_retract(spark, path, g0, epoch=1)
    assert stats["groups_retracted"] == 1
    assert 3 not in {r.k for r in mv_read(spark, path).collect()}
    before = _group_rows(spark, path)
    # REPLAY of the same retraction epoch is fine (its first attempt is
    # excluded from the balance — the strictly-other-epochs rule)...
    mv_retract(spark, path, g0, epoch=1)
    assert _group_rows(spark, path) == before
    # ...but the same rows under a NEW epoch are genuinely negative
    with pytest.raises(ValueError, match="never"):
        mv_retract(spark, path, g0, epoch=2)
    assert _group_rows(spark, path) == before  # checked BEFORE any write


def test_epoch_id_reuse_guards(spark, tmp_path):
    """An epoch id's replay domain is ONE batch of ONE op kind (r10
    ADVICE): reusing a refresh id for a retract raises, and reusing an
    id for a DIFFERENT batch whose buckets don't cover the existing
    partitions raises (dynamic overwrite would leave a mixed epoch)."""
    path = str(tmp_path / "emv")
    mv_build(
        _rows(spark, 0, 2000), path, ["k"], SPEC_SUB, n_buckets=8,
        epoch_partitioned=True,
    )
    wide = _rows(spark, 2000, 2500)  # 23 groups -> every bucket
    mv_refresh(spark, path, wide, epoch=1)
    before = _group_rows(spark, path)
    # (a) op-kind collision: epoch 1 was a refresh, retract must not reuse it
    with pytest.raises(ValueError, match="refresh.*retract|reuse"):
        mv_retract(spark, path, wide.where(F.col("k") == 3), epoch=1)
    assert _group_rows(spark, path) == before
    # (b) different-batch collision: a narrow batch (one group, one
    # bucket) under epoch 1 leaves the wide batch's other buckets as a
    # mixed epoch — must raise before any write
    narrow = wide.where(F.col("k") == 3)
    with pytest.raises(ValueError, match="different batch|does not touch"):
        mv_refresh(spark, path, narrow, epoch=1)
    assert _group_rows(spark, path) == before
    # (c) a true replay (same batch, same op) still passes
    mv_refresh(spark, path, wide, epoch=1)
    assert _group_rows(spark, path) == before
    # (d) epoch folding resets the id space: after compact_mv the
    # folded ids are reusable
    compact_mv(spark, path)
    mv_refresh(spark, path, _rows(spark, 2500, 3000), epoch=1)


def test_minmax_epoch_rules(spark, tmp_path):
    path = str(tmp_path / "emv")
    full = _rows(spark, 0, 1000)
    mv_build(full, path, ["k"], SPEC_MM, n_buckets=8, epoch_partitioned=True)
    mv_refresh(spark, path, _rows(spark, 1000, 1200), epoch=1)  # inserts fine
    got = {
        (r.k, r.n_rows, r.min_v, r.max_v)
        for r in mv_read(spark, path)
        .select("k", "n_rows", "min_v", "max_v")
        .collect()
    }
    ref = str(tmp_path / "ref")
    mv_build(_rows(spark, 0, 1200), ref, ["k"], SPEC_MM, n_buckets=8)
    expect = {
        (r.k, r.n_rows, r.min_v, r.max_v)
        for r in mv_read(spark, ref).select("k", "n_rows", "min_v", "max_v").collect()
    }
    assert got == expect
    with pytest.raises(ValueError, match="compact_mv|min/max"):
        mv_retract(spark, path, _rows(spark, 1000, 1100), epoch=2)


def test_compact_folds_epochs(spark, tmp_path):
    path = str(tmp_path / "emv")
    mv_build(
        _rows(spark, 0, 2000), path, ["k"], SPEC_SUB, n_buckets=4,
        epoch_partitioned=True,
    )
    for e, lo in enumerate((2000, 2400, 2800), start=1):
        mv_refresh(spark, path, _rows(spark, lo, lo + 400), epoch=e)
    from flink_quickstart_spark.operators.maintenance import store_data_dir

    before = _read_set(spark, path)
    epochs_before = {
        d
        for root, dirs, _f in os.walk(store_data_dir(path, "groups"))
        for d in dirs
        if d.startswith("_epoch=")
    }
    assert len(epochs_before) == 4  # base + 3 deltas
    rep = compact_mv(spark, path)
    assert rep["files_after"] < rep["files_before"]
    # re-resolve: the fold published a new generation (r11)
    epochs_after = {
        d
        for root, dirs, _f in os.walk(store_data_dir(path, "groups"))
        for d in dirs
        if d.startswith("_epoch=")
    }
    assert epochs_after == {"_epoch=0"}
    assert _read_set(spark, path) == before


def test_layout_guards(spark, tmp_path):
    flat, epoch = str(tmp_path / "flat"), str(tmp_path / "epoch")
    mv_build(_rows(spark, 0, 100), flat, ["k"], SPEC_SUB, n_buckets=4)
    mv_build(
        _rows(spark, 0, 100), epoch, ["k"], SPEC_SUB, n_buckets=4,
        epoch_partitioned=True,
    )
    b = _rows(spark, 100, 150)
    with pytest.raises(ValueError, match="epoch"):
        mv_refresh(spark, flat, b, epoch=1)
    with pytest.raises(ValueError, match="epoch"):
        mv_refresh(spark, epoch, b)
    with pytest.raises(ValueError, match="epoch"):
        mv_refresh(spark, epoch, b, epoch=0)
    with pytest.raises(ValueError, match="no epoch"):
        mv_retract(spark, flat, b, epoch=1)


def test_streaming_e2e_foreach_batch(spark, tmp_path):
    """Real Structured Streaming: a 3-file availableNow stream with
    maxFilesPerTrigger=1 drives foreach_batch_mv_refresh; the final
    merged read equals one flat groupBy over everything."""
    from flink_quickstart_spark.streaming.harness import (
        foreach_batch_mv_refresh,
    )

    src_dir = str(tmp_path / "src")
    _rows(spark, 0, 3000).repartition(3).write.parquet(src_dir)
    path = str(tmp_path / "emv")
    # empty base: the stream IS the corpus
    mv_build(
        _rows(spark, 0, 1).where(F.lit(False)), path, ["k"], SPEC_SUB,
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
    mv_build(_rows(spark, 0, 3000), ref, ["k"], SPEC_SUB, n_buckets=8)
    assert _read_set(spark, path) == _read_set(spark, ref)
