"""Round-12 cross-store atomic catalog tests.

store_generation makes each store's mutation atomic; the catalog makes
a SET of stores atomic for readers: a catalog version is an immutable
(store → generation) JSON committed by one pointer flip, with GC pins
holding every generation it references. Contracts:

1. Atomic cross-store visibility: a reader that opened catalog v1
   keeps reading BOTH stores at their v1 generations while each store
   is mutated underneath and even mid-cascade (store A mutated, store
   B not yet); a fresh open after catalog v2 commits sees both new.
2. Catalog pins beat keep-2: three mutations on one store would GC the
   v1 generation for an unpinned reader, but the v1 catalog handle
   still reads it; after v2 commits (v1's pins released) and the GC
   catches up, the v1 handle fails with the typed StoreSnapshotExpired.
3. Crash injection: a version file written WITHOUT the pointer flip is
   invisible to open_catalog and overwritten by the next commit.
4. Concurrent catalog commits conflict loudly (writer lease).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from flink_quickstart_spark.operators.dedup import (
    minhash_build_store,
    minhash_upsert_store,
)
from flink_quickstart_spark.operators.maintenance import (
    StoreSnapshotExpired,
    StoreWriterConflict,
    catalog_commit,
    catalog_version,
    open_catalog,
    store_writer_lease,
)
from tests.conftest import SF_DIR


def _docs(spark, lo, hi):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "text")
        .where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )


def _setup(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    minhash_build_store(_docs(spark, 0, 40), a)
    minhash_build_store(_docs(spark, 100, 130), b)
    cat = str(tmp_path / "cat")
    v1 = catalog_commit(cat, {"sigs_a": a, "sigs_b": b})
    assert v1 == 1
    return a, b, cat


def test_atomic_cross_store_visibility(spark, tmp_path):
    a, b, cat = _setup(spark, tmp_path)
    h1 = open_catalog(cat)
    assert h1.version == 1

    minhash_upsert_store(spark, a, _docs(spark, 40, 60))
    # mid-cascade: store A mutated, store B not yet — h1 still reads
    # the v1 PAIR (a reader resolving store pointers directly would
    # already see the new A here)
    assert h1.read(spark, "sigs_a", "bands").count() == 16 * 40
    assert h1.read(spark, "sigs_b", "bands").count() == 16 * 30
    minhash_upsert_store(spark, b, _docs(spark, 130, 150))

    v2 = catalog_commit(cat, {"sigs_a": a, "sigs_b": b})
    assert v2 == 2
    # stale handle: still the v1 pair, bit-for-bit
    assert h1.read(spark, "sigs_a", "bands").count() == 16 * 40
    assert h1.read(spark, "sigs_b", "bands").count() == 16 * 30
    # fresh open: the v2 pair
    h2 = open_catalog(cat)
    assert h2.read(spark, "sigs_a", "bands").count() == 16 * 60
    assert h2.read(spark, "sigs_b", "bands").count() == 16 * 50
    # historical version stays openable (cross-store time travel)
    assert open_catalog(cat, version=1).read(
        spark, "sigs_b", "bands"
    ).count() == 16 * 30


def test_catalog_pins_beat_keep2_until_released(spark, tmp_path):
    a, b, cat = _setup(spark, tmp_path)
    # advance A to generation 1 BEFORE the version under test pins it:
    # generation 0 (the build) is never GC'd, so pinning it would make
    # the expiry half of this test vacuous
    minhash_upsert_store(spark, a, _docs(spark, 40, 50))
    v2 = catalog_commit(cat, {"sigs_a": a, "sigs_b": b})
    h2 = open_catalog(cat, version=v2)
    # three mutations: keep-2 alone would have collected generation 1
    # after the second
    for lo in (50, 60, 70):
        minhash_upsert_store(spark, a, _docs(spark, lo, lo + 10))
    assert h2.read(spark, "sigs_a", "bands").count() == 16 * 50
    # v3 releases v2's pins; two more mutations GC the old generation
    catalog_commit(cat, {"sigs_a": a, "sigs_b": b})
    for lo in (80, 90):
        minhash_upsert_store(spark, a, _docs(spark, lo, lo + 10))
    with pytest.raises(StoreSnapshotExpired):
        h2.read(spark, "sigs_a", "bands").count()


def test_unflipped_version_file_is_invisible(spark, tmp_path):
    a, b, cat = _setup(spark, tmp_path)
    # simulate a crash between version-file write and pointer flip
    orphan = os.path.join(cat, "v-000002.json")
    with open(orphan, "w") as fh:
        json.dump({"version": 2, "stores": {}}, fh)
    assert catalog_version(cat) == 1
    assert open_catalog(cat).version == 1
    # the next commit overwrites the orphan with a real v2
    v2 = catalog_commit(cat, {"sigs_a": a, "sigs_b": b})
    assert v2 == 2
    assert open_catalog(cat).stores["sigs_a"]["path"] == os.path.abspath(a)


def test_concurrent_commit_conflicts_loudly(spark, tmp_path):
    a, b, cat = _setup(spark, tmp_path)
    with store_writer_lease(cat, "other_commit"):
        with pytest.raises(StoreWriterConflict):
            catalog_commit(cat, {"sigs_a": a})
