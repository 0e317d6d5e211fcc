"""Regression tests for the r11 ADVICE race fixes (round 12).

1. (medium) Compaction lost-update race: every compact entry point
   used to resolve its read snapshot (store_data_dir) BEFORE
   store_generation acquired the writer lease. A writer publishing a
   generation in that window had its mutation read stale and silently
   re-published (reverted) by the compaction. Fixed: the source dir is
   resolved INSIDE the store_generation block, under the lease.

2. (low) compact_mv's epoch fold reset meta.epoch_ops BEFORE the
   generation published — a crash in between left the unfolded epochs
   live with a cleared reuse map, re-opening the mixed-epoch hole the
   r10 guard closed. Fixed: data (pointer flip) commits first, meta
   resets after.

3. (low) Build ops reset generations without the writer lease — a
   build racing a lease-holding mutator could rmtree the generation
   the mutator was hardlink-cloning mid-walk. Fixed:
   reset_store_generations acquires the lease and a racing build now
   fails loudly with StoreWriterConflict.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_quickstart_spark.operators import maintenance
from flink_quickstart_spark.operators.maintenance import (
    StoreWriterConflict,
    compact_minhash_store,
    generation_id,
    reset_store_generations,
    store_data_dir,
    store_writer_lease,
)
from tests.conftest import SF_DIR


def _docs(spark, n=120):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < n)
    )


def _band_ids(spark, path) -> set[int]:
    return {
        r.doc_id
        for r in spark.read.parquet(store_data_dir(path, "bands"))
        .select("doc_id")
        .distinct()
        .collect()
    }


def test_compact_reads_generation_published_after_prelease_check(
    spark, tmp_path, monkeypatch
):
    """Deterministic replay of the ADVICE race: a concurrent upsert
    publishes a new generation between compaction's PRE-LEASE no-op
    check and its lease acquisition. The compacted store must contain
    the concurrent upsert's rows — the old code (resolve before lease)
    would have compacted the stale generation and published it,
    silently reverting the upsert."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )

    path = str(tmp_path / "store")
    docs = _docs(spark, 120)
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    batch_b = docs.where(F.col("doc_id") % 3 == 1)
    batch_c = docs.where(F.col("doc_id") % 3 == 2)
    minhash_build_store(corpus, path)
    minhash_upsert_store(spark, path, batch_b)  # gen 1
    assert generation_id(path) == 1

    real_noop = maintenance._noop_compact_stats
    fired = {"n": 0}

    def racing_noop(src, max_files):
        # first call == the pre-lease fast path: inject the concurrent
        # writer here (it takes and releases the lease itself), then
        # report "work to do" so compaction proceeds into the lease
        fired["n"] += 1
        if fired["n"] == 1:
            minhash_upsert_store(spark, path, batch_c)  # gen 2
            return None
        return real_noop(src, max_files)

    monkeypatch.setattr(maintenance, "_noop_compact_stats", racing_noop)
    compact_minhash_store(spark, path)  # full OPTIMIZE — always work
    assert fired["n"] >= 2  # the under-lease authoritative re-check ran
    assert generation_id(path) == 3
    expected = {r.doc_id for r in docs.select("doc_id").collect()}
    assert _band_ids(spark, path) == expected, (
        "compaction published a stale snapshot — the concurrent "
        "upsert's rows were reverted (the r11 ADVICE lost-update race)"
    )


def test_mv_fold_crash_before_publish_keeps_epoch_ops(
    spark, tmp_path, monkeypatch
):
    """A crash AFTER the fold's write but BEFORE the pointer flip must
    leave meta.epoch_ops intact (the unfolded epochs are still live) —
    the old ordering cleared the map first, so a post-crash refresh
    could reuse a live epoch id and silently mix contributions."""
    from flink_quickstart_spark.operators.matview import (
        _read_meta,
        compact_mv,
        mv_build,
        mv_read,
        mv_refresh,
    )

    path = str(tmp_path / "mv")
    rows = spark.range(0, 500).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    mv_build(
        rows.where(F.col("id") < 400), path,
        ["k"], [("count", "*", "n"), ("sum", "v", "s")],
        n_buckets=4, epoch_partitioned=True,
    )
    mv_refresh(spark, path, rows.where(F.col("id") >= 400), epoch=1)
    assert _read_meta(path)["epoch_ops"] == {"1": "refresh"}
    before = {(r.k, r.n, r.s) for r in mv_read(spark, path).collect()}

    real_counts = maintenance.data_file_counts

    def boom_on_staged(base_dir):
        if maintenance._GEN_PREFIX in base_dir and base_dir.endswith("groups"):
            raise RuntimeError("injected crash before publish")
        return real_counts(base_dir)

    monkeypatch.setattr(maintenance, "data_file_counts", boom_on_staged)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_mv(spark, path)
    # the fold never published: epochs still live, reuse map intact
    assert _read_meta(path)["epoch_ops"] == {"1": "refresh"}
    assert {(r.k, r.n, r.s) for r in mv_read(spark, path).collect()} == before
    # epoch 1 is still live, so reusing its id for a retract still raises
    with pytest.raises(ValueError, match="epoch reuse"):
        from flink_quickstart_spark.operators.matview import mv_retract

        mv_retract(
            spark, path, rows.where(F.col("id") >= 400), epoch=1
        )

    monkeypatch.setattr(maintenance, "data_file_counts", real_counts)
    stats = compact_mv(spark, path)
    assert stats["partitions_compacted"] >= 1
    # publish succeeded this time: map reset, read unchanged
    assert _read_meta(path)["epoch_ops"] == {}
    assert {(r.k, r.n, r.s) for r in mv_read(spark, path).collect()} == before


def test_reset_store_generations_conflicts_with_live_writer(tmp_path):
    path = str(tmp_path / "store")
    os.makedirs(path)
    with store_writer_lease(path, "mutator"):
        with pytest.raises(StoreWriterConflict):
            reset_store_generations(path)
    # lease released: reset proceeds
    reset_store_generations(path)
    assert generation_id(path) == 0
