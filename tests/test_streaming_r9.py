"""Round-9 streaming face: the ingest ADMISSION gate over the persisted
minhash store (VERDICT r8 #2). Pins:

1. streamed == batch-incremental — two micro-batches through
   foreach_batch_ingest_admission produce exactly the flagged pairs and
   admitted set of the sequential batch loop (ingest → admit → upsert →
   ingest next against corpus + previously admitted);
2. cross-batch dedup actually happens — a doc in batch 2 that
   near-duplicates an ADMITTED batch-1 doc is flagged even though it
   matches nothing in the original corpus;
3. replay idempotence — re-running the availableNow query over the same
   source adds nothing (epoch overwrites + the store's admitted-batch
   marker).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from flink_quickstart_spark.operators.maintenance import store_data_dir as _sdd


def _setup(spark, tmp_path):
    """corpus = doc_id % 10 != 0; wave1 = % 20 == 0; wave2 = the rest of
    % 10 == 0, PLUS a synthetic near-dup of an admitted wave-1 doc."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    wave1 = docs.where(F.col("doc_id") % 20 == 0)
    # synthetic cross-batch near-dup: copy the text of a wave-1 doc that
    # will be ADMITTED (not itself a corpus near-dup — probed with a
    # throwaway store) under a fresh id into wave 2, so the clone can
    # only be flagged via batch-1's admitted signatures
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_ingest_neardup,
    )

    probe_store = str(tmp_path / "probe_store")
    minhash_build_store(corpus, probe_store)
    flagged_w1 = {
        r.new_id
        for r in minhash_ingest_neardup(
            spark, probe_store, wave1, corpus, threshold=0.5
        ).collect()
    }
    donor = (
        wave1.where(~F.col("doc_id").isin(list(flagged_w1) or [-1]))
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    clone = spark.createDataFrame(
        [(donor.doc_id + 1_000_000, donor.text)], "doc_id long, text string"
    )
    wave2 = docs.where(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 20 != 0)
    ).unionByName(clone)

    corpus_path = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_path)
    return corpus, corpus_path, wave1, wave2, donor


def _batch_incremental(spark, tmp_path, corpus, wave1, wave2):
    """The sequential reference: same ops, driven by a plain loop."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_ingest_neardup,
        minhash_upsert_store,
    )

    store = str(tmp_path / "ref_store")
    minhash_build_store(corpus, store)
    flagged = []
    seen = corpus
    for wave in (wave1, wave2):
        pairs = minhash_ingest_neardup(
            spark, store, wave, seen, threshold=0.5
        ).localCheckpoint(eager=True)
        flagged.extend(
            (r.corpus_id, r.new_id, r.jaccard) for r in pairs.collect()
        )
        admitted = wave.join(
            pairs.select(F.col("new_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ).localCheckpoint(eager=True)
        minhash_upsert_store(spark, store, admitted)
        seen = seen.unionByName(admitted.select("doc_id", "text"))
    admitted_ids = {
        r.doc_id for r in seen.select("doc_id").collect()
    } - {r.doc_id for r in corpus.select("doc_id").collect()}
    return set(flagged), admitted_ids


def _run_stream(spark, tmp_path, corpus, corpus_path, wave1, wave2, tag=""):
    from flink_quickstart_spark.operators.dedup import minhash_build_store
    from flink_quickstart_spark.streaming.harness import (
        foreach_batch_ingest_admission,
    )

    store = str(tmp_path / f"stream_store{tag}")
    src = str(tmp_path / f"src{tag}")
    flagged_dir = str(tmp_path / f"flagged{tag}")
    admitted_dir = str(tmp_path / f"admitted{tag}")
    ckpt = str(tmp_path / f"ckpt{tag}")
    if not os.path.exists(store):
        minhash_build_store(corpus, store)
    if not os.path.exists(src):
        os.makedirs(src)
        # two files, strictly increasing mtimes → two ordered micro-batches
        wave1.coalesce(1).write.parquet(f"{src}/w1")
        wave2.coalesce(1).write.parquet(f"{src}/w2")
        t0 = os.stat(src).st_mtime
        for i, d in enumerate(("w1", "w2")):
            for f in os.listdir(f"{src}/{d}"):
                os.utime(f"{src}/{d}/{f}", (t0 + i, t0 + i))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_ingest_admission(
                store, corpus_path, flagged_dir, admitted_dir, threshold=0.5
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return store, flagged_dir, admitted_dir


def test_admission_gate_matches_batch_incremental(spark, tmp_path):
    corpus, corpus_path, wave1, wave2, donor = _setup(spark, tmp_path)
    ref_flagged, ref_admitted = _batch_incremental(
        spark, tmp_path, corpus, wave1, wave2
    )
    store, flagged_dir, admitted_dir = _run_stream(
        spark, tmp_path, corpus, corpus_path, wave1, wave2
    )

    got_flagged = {
        (r.corpus_id, r.new_id, r.jaccard)
        for r in spark.read.parquet(flagged_dir).collect()
    }
    got_admitted = {
        r.doc_id for r in spark.read.parquet(admitted_dir).collect()
    }
    assert got_flagged == ref_flagged
    assert got_admitted == ref_admitted
    # the synthetic clone was flagged against its ADMITTED donor — the
    # cross-batch dedup that only works if batch 1's signatures joined
    # the store before batch 2 ran
    assert (donor.doc_id, donor.doc_id + 1_000_000) in {
        (c, n) for c, n, _ in got_flagged
    }
    # store marker recorded the last admitted epoch
    with open(os.path.join(store, "_last_admitted_batch")) as fh:
        assert int(fh.read()) == 1


def test_admission_gate_replay_is_idempotent(spark, tmp_path):
    from flink_quickstart_spark.streaming.harness import (
        foreach_batch_ingest_admission,
    )

    corpus, corpus_path, wave1, wave2, _ = _setup(spark, tmp_path)
    store, flagged_dir, admitted_dir = _run_stream(
        spark, tmp_path, corpus, corpus_path, wave1, wave2
    )
    snap = lambda d: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(d).collect()
    )
    flagged1, admitted1 = snap(flagged_dir), snap(admitted_dir)
    bands1 = spark.read.parquet(_sdd(store, "bands")).count()

    # replay both epochs against the SAME store/sinks (fresh checkpoint
    # simulates redelivery of already-processed batch ids)
    handler = foreach_batch_ingest_admission(
        store, corpus_path, flagged_dir, admitted_dir, threshold=0.5
    )
    for bid, wave in ((0, wave1), (1, wave2)):
        handler(wave, bid)

    assert snap(flagged_dir) == flagged1
    assert snap(admitted_dir) == admitted1
    assert spark.read.parquet(_sdd(store, "bands")).count() == bands1


def test_admission_gate_empty_batch_is_noop(spark, tmp_path):
    """An empty micro-batch (availableNow with no new files can deliver
    one) must touch neither the store nor the sinks nor the marker."""
    from flink_quickstart_spark.operators.dedup import minhash_build_store
    from flink_quickstart_spark.streaming.harness import (
        foreach_batch_ingest_admission,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    corpus_path = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_path)
    store = str(tmp_path / "store")
    minhash_build_store(corpus, store)
    bands_before = spark.read.parquet(_sdd(store, "bands")).count()

    handler = foreach_batch_ingest_admission(
        store, corpus_path, str(tmp_path / "flagged"), str(tmp_path / "adm")
    )
    handler(docs.where(F.lit(False)), 0)

    assert spark.read.parquet(_sdd(store, "bands")).count() == bands_before
    assert not os.path.exists(os.path.join(store, "_last_admitted_batch"))
    assert not os.path.exists(str(tmp_path / "flagged"))
    assert not os.path.exists(str(tmp_path / "adm"))
