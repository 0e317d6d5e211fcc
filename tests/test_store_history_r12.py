"""Round-12 commit-history log tests (the DESCRIBE HISTORY analog).

The manifest travels WITH its generation, so the keep-2+pins GC erases
the commit trail along with the data. The history log under
``{store}/_history`` is the durable metadata-only record of every
commit that actually PUBLISHED. Contracts:

1. build → upsert → delete → compact leaves a 4-row trail: ops in
   intent order, generations 0..3, only the last current, every
   manifest stat non-empty.
2. The trail SURVIVES the data GC: after three mutations the keep-2 GC
   has collected generation 1, but its history row remains — flagged
   retained=False while {0, 2, 3} stay retained (0 is never deleted).
3. A rebuild resets the trail (generation numbers restart; the old
   trail would misattribute future commits) — history is exactly the
   fresh build's generation-0 row afterwards.
4. The log is a TRAIL, not the source of truth: a crash between the
   pointer flip and the history record loses that one row (simulated
   by deleting it) — later commits still append correctly, readers are
   unaffected, and the gap is visible rather than fabricated.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_quickstart_spark.operators.dedup import (
    minhash_build_store,
    minhash_delete_store,
    minhash_upsert_store,
)
from flink_quickstart_spark.operators.maintenance import (
    _HISTORY_DIR,
    compact_minhash_store,
    generation_id,
    read_store,
    store_history,
)
from tests.conftest import SF_DIR


def _docs(spark, lo, hi):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "text")
        .where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )


def test_full_lifecycle_trail(spark, tmp_path):
    store = str(tmp_path / "s")
    minhash_build_store(_docs(spark, 0, 60), store)
    minhash_upsert_store(spark, store, _docs(spark, 60, 80))
    minhash_delete_store(spark, store, _docs(spark, 0, 10))
    compact_minhash_store(spark, store)
    hist = store_history(spark, store).orderBy("generation").collect()
    assert [h.generation for h in hist] == [0, 1, 2, 3]
    assert [h.op for h in hist] == [
        "build",
        "minhash_upsert_store",
        "minhash_delete_store",
        "compact_minhash_store",
    ]
    assert [h.current for h in hist] == [False, False, False, True]
    assert all(h.n_files > 0 and h.total_bytes > 0 for h in hist)
    assert all("bands" in h.subdirs for h in hist)
    # the trail's terminal state agrees with a live read: 16 band rows
    # per surviving doc
    assert read_store(spark, store, "bands").count() == 16 * 70


def test_trail_survives_data_gc(spark, tmp_path):
    store = str(tmp_path / "s")
    minhash_build_store(_docs(spark, 0, 40), store)
    for lo in (40, 50, 60):  # gens 1..3; keep-2 GC collects gen 1
        minhash_upsert_store(spark, store, _docs(spark, lo, lo + 10))
    assert generation_id(store) == 3
    hist = store_history(spark, store).orderBy("generation").collect()
    assert [h.generation for h in hist] == [0, 1, 2, 3]
    assert [h.retained for h in hist] == [True, False, True, True]
    assert [h.current for h in hist] == [False, False, False, True]


def test_rebuild_resets_trail(spark, tmp_path):
    store = str(tmp_path / "s")
    minhash_build_store(_docs(spark, 0, 40), store)
    minhash_upsert_store(spark, store, _docs(spark, 40, 60))
    assert store_history(spark, store).count() == 2
    minhash_build_store(_docs(spark, 0, 30), store)  # rebuild
    hist = store_history(spark, store).collect()
    assert [(h.generation, h.op, h.current) for h in hist] == [
        (0, "build", True)
    ]
    assert read_store(spark, store, "bands").count() == 16 * 30


def test_lost_record_leaves_visible_gap(spark, tmp_path):
    store = str(tmp_path / "s")
    minhash_build_store(_docs(spark, 0, 40), store)
    minhash_upsert_store(spark, store, _docs(spark, 40, 50))
    # simulate the crash window: pointer flipped, history record lost
    os.remove(os.path.join(store, _HISTORY_DIR, "commit-000001.json"))
    minhash_upsert_store(spark, store, _docs(spark, 50, 60))
    hist = store_history(spark, store).orderBy("generation").collect()
    assert [h.generation for h in hist] == [0, 2]  # gap, not fabrication
    assert hist[-1].current
    # the store itself is unaffected — reads resolve the pointer, not
    # the trail
    assert read_store(spark, store, "bands").count() == 16 * 60
