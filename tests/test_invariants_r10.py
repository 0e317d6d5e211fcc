"""Round-10 invariants: the lifecycle edges VERDICT r9 ranked.

1. IVF RETRAIN (r9 #1): retrain(build(corpus) + upsert(batch)) is
   bit-identical (centroids) and row-identical (members) to a fresh
   build on corpus ∪ batch with the same seed; on DELIBERATELY DRIFTED
   data the retrain measurably restores partition quality (mean
   quantization error of the drifted members drops) and the drift
   report says so (centroid_shift > 0, skew recorded).
2. SUBSET COMPACTION (r9 #3): compact_partitions(max_files=N) rewrites
   EXACTLY the over-threshold partitions — row multiset unchanged,
   under-threshold partitions' data files byte-for-byte untouched
   (same names, sizes, mtimes).
3. SINGLE-WRITER LEASE (r9 #4): a second writer fails loudly
   (StoreWriterConflict) while a lease is live and the store is
   unchanged; a stale lease (crashed holder) is broken after TTL.
4. COMBO BUDGET (r9 #5): the affected-partition driver pull fails
   loudly past max_combos, naming the rebuild crossover; the store is
   unchanged.
5. REMOTE-SCHEME GUARD (r9 ADVICE): ops whose emptied-partition drop /
   atomic swap is a local filesystem call refuse hdfs://-style paths
   loudly instead of silently leaving stale partitions.
6. EPOCH-PARTITIONED STORE (r9 #2): layout guards fail loudly on
   flat/epoch mixing; an epoch upsert REPLAYED is byte-idempotent
   (dynamic overwrite of its own partitions), and the epoch store's
   band multiset equals the flat build on the union.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from flink_quickstart_spark.operators.maintenance import store_data_dir as _sdd


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _multiset(df, cols):
    from collections import Counter

    return Counter(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _file_snapshot(base_dir):
    """{relpath: (size, mtime_ns)} for every parquet data file."""
    snap = {}
    for root, _dirs, files in os.walk(base_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                snap[os.path.relpath(p, base_dir)] = (st.st_size, st.st_mtime_ns)
    return snap


# ------------------------------------------------------------- retrain


def test_ivf_retrain_eq_fresh_build(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import (
        ivf_build_index,
        ivf_retrain_index,
        ivf_upsert_index,
    )

    emb = _emb(spark)
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    batch = emb.where(F.col("vec_id") % 10 == 0)
    ret, ref = str(tmp_path / "ret"), str(tmp_path / "ref")
    ivf_build_index(corpus, ret, n_clusters=8)
    ivf_upsert_index(spark, ret, batch)
    report = ivf_retrain_index(spark, ret)
    ivf_build_index(emb, ref, n_clusters=8)

    mcols = ["vec_id", "cluster_id"]
    assert _multiset(spark.read.parquet(_sdd(ret, "members")), mcols) == _multiset(
        spark.read.parquet(_sdd(ref, "members")), mcols
    )
    # centroids bit-identical: same sample (orderBy id), same seed,
    # same driver-side numpy on identical float64 inputs
    a = {
        r.cluster_id: tuple(r.centroid)
        for r in spark.read.parquet(_sdd(ret, "centroids")).collect()
    }
    b = {
        r.cluster_id: tuple(r.centroid)
        for r in spark.read.parquet(_sdd(ref, "centroids")).collect()
    }
    assert a == b
    for k in (
        "n_clusters",
        "n_members",
        "centroid_shift_mean",
        "centroid_shift_max",
        "occupancy_skew_before",
        "occupancy_skew_after",
    ):
        assert k in report
    # staging/trash dirs cleaned up after the swap
    assert not [d for d in os.listdir(ret) if "retrain-" in d]


def test_ivf_retrain_restores_quality_on_drift(spark, tmp_path):
    """Deliberate drift: upsert the NEGATED corpus (unit vectors'
    antipodes — maximally bad fit for the stored centroids). Before
    retrain the drifted members sit far from their assigned centroids;
    after retrain the mean quantization error over ALL members must
    drop, and the drift report must show a real centroid shift."""
    from flink_quickstart_spark.operators.similarity import (
        ivf_build_index,
        ivf_retrain_index,
        ivf_upsert_index,
    )

    emb = _emb(spark).select("vec_id", "embedding")
    drifted = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    path = str(tmp_path / "drift")
    ivf_build_index(emb, path, n_clusters=8)
    ivf_upsert_index(spark, path, drifted)

    def mean_qerr() -> float:
        cents = {
            r.cluster_id: np.array(r.centroid)
            for r in spark.read.parquet(_sdd(path, "centroids")).collect()
        }
        errs = []
        for r in spark.read.parquet(_sdd(path, "members")).collect():
            v = np.array(r.embedding, dtype=np.float64)
            v = v / np.linalg.norm(v)
            errs.append(1.0 - float(v @ cents[r.cluster_id]))
        return float(np.mean(errs))

    before = mean_qerr()
    report = ivf_retrain_index(spark, path)
    after = mean_qerr()
    assert after < before  # partition quality restored
    assert report["centroid_shift_max"] > 0.05  # drift was real and seen
    assert report["n_members"] == emb.count() * 2


def test_ivf_retrain_restores_recall_on_drift(spark, tmp_path):
    """The RECALL face of the drift story (VERDICT r9 #1's 'recall
    decays silently'): drifted mass = 4 noisy synthetic modes whose
    dot products with the STALE centroids are noise-dominated, so
    same-mode neighbors scatter across clusters — recall@1 at
    n_probe=1 collapses (calibrated 0.28 on these seeds). Retrain
    re-learns centroids on the grown corpus, same-mode vectors
    co-locate again, and recall recovers (calibrated 0.94). Pinned
    with wide margins; fully seeded/deterministic."""
    from flink_quickstart_spark.operators.similarity import (
        ivf_build_index,
        ivf_query_index,
        ivf_retrain_index,
        ivf_upsert_index,
    )

    emb = _emb(spark).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n, dim = emb.count(), len(emb.first().embedding)
    rng = np.random.RandomState(7)
    modes = rng.normal(size=(4, dim))
    modes /= np.linalg.norm(modes, axis=1, keepdims=True)
    rows = []
    per = max(n // 4, 40)
    for m in range(4):
        noise = rng.normal(scale=1.0, size=(per, dim))
        v = 0.6 * modes[m] + noise / np.sqrt(dim)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        for i in range(per):
            rows.append((int(-(m * per + i + 1)), [float(x) for x in v[i]]))
    drift = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "drift_recall")
    ivf_build_index(emb, path, n_clusters=8)
    ivf_upsert_index(spark, path, drift)

    V = np.array([r[1] for r in rows])
    ids = np.array([r[0] for r in rows])
    sims = V @ V.T
    np.fill_diagonal(sims, -2)
    truth = dict(zip(ids.tolist(), ids[np.argmax(sims, axis=1)].tolist()))

    def recall_at_1() -> float:
        res = ivf_query_index(spark, path, drift, k=2, n_probe=1)
        best: dict = {}
        for r in res.collect():
            if r.nbr_id == r.query_id:
                continue  # self-match
            if r.query_id not in best or r.rank < best[r.query_id][1]:
                best[r.query_id] = (r.nbr_id, r.rank)
        return sum(
            1 for q, (nb, _) in best.items() if truth[q] == nb
        ) / len(truth)

    before = recall_at_1()
    ivf_retrain_index(spark, path)
    after = recall_at_1()
    assert before < 0.6  # drift really did break the partitioning
    assert after > 0.7  # retrain restored same-mode co-location
    assert after > before + 0.3


def test_ivf_retrain_refuses_remote_scheme(spark):
    from flink_quickstart_spark.operators.similarity import ivf_retrain_index

    with pytest.raises(NotImplementedError, match="s3a"):
        ivf_retrain_index(spark, "s3a://bucket/ivf")


# ---------------------------------------------------- subset compaction


def test_subset_compaction_touches_only_over_threshold(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )
    from flink_quickstart_spark.operators.maintenance import (
        compact_minhash_store,
        data_file_counts,
    )

    docs = _docs(spark)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    # a 1-document batch touches ≤ num_hashes buckets — guaranteed a
    # strict subset of the 64 _hmod partitions
    batch = docs.where(F.col("doc_id") % 10 == 0).orderBy("doc_id").limit(1)
    store = str(tmp_path / "store")
    minhash_build_store(corpus, store)
    minhash_upsert_store(spark, store, batch)

    bands = _sdd(store, "bands")
    pre_counts = data_file_counts(bands)
    over = {p for p, n in pre_counts.items() if n > 1}
    under = {p for p, n in pre_counts.items() if n <= 1}
    assert over and under  # a real subset scenario
    pre = _multiset(spark.read.parquet(bands), ["doc_id", "band_id", "sig"])
    pre_files = _file_snapshot(bands)

    stats = compact_minhash_store(spark, store, max_files=1)
    assert stats["partitions_compacted"] == len(over)

    bands = _sdd(store, "bands")  # re-resolve: compaction published a
    # new generation (r11); the untouched partitions' files inside it
    # are HARDLINKS of the pre-compaction files, so the same-bytes/
    # same-mtime identity check below still holds by inode sharing
    post_counts = data_file_counts(bands)
    assert all(post_counts[p] == 1 for p in over)
    post = _multiset(spark.read.parquet(bands), ["doc_id", "band_id", "sig"])
    assert post == pre
    post_files = _file_snapshot(bands)
    for rel, meta in pre_files.items():
        part = os.path.dirname(rel)
        if part in under:
            # untouched partitions: same files, same bytes, same mtimes
            assert post_files.get(rel) == meta


def test_subset_compaction_noop_below_threshold(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import minhash_build_store
    from flink_quickstart_spark.operators.maintenance import (
        compact_minhash_store,
    )

    store = str(tmp_path / "store")
    minhash_build_store(_docs(spark), store)
    snap = _file_snapshot(_sdd(store, "bands"))
    stats = compact_minhash_store(spark, store, max_files=1)
    assert stats["partitions_compacted"] == 0
    assert _file_snapshot(_sdd(store, "bands")) == snap


# ------------------------------------------------------------ the lease


def test_lease_contention_fails_loudly_and_store_intact(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )
    from flink_quickstart_spark.operators.maintenance import (
        StoreWriterConflict,
        store_writer_lease,
    )

    docs = _docs(spark)
    store = str(tmp_path / "store")
    minhash_build_store(docs.where(F.col("doc_id") % 10 != 0), store)
    pre = _multiset(
        spark.read.parquet(_sdd(store, "bands")), ["doc_id", "band_id", "sig"]
    )
    with store_writer_lease(store, "test-holder"):
        with pytest.raises(StoreWriterConflict, match="test-holder"):
            minhash_upsert_store(
                spark, store, docs.where(F.col("doc_id") % 10 == 0)
            )
    assert (
        _multiset(
            spark.read.parquet(_sdd(store, "bands")), ["doc_id", "band_id", "sig"]
        )
        == pre
    )
    # lease released on exit → the writer now succeeds
    minhash_upsert_store(spark, store, docs.where(F.col("doc_id") % 10 == 0))
    assert not os.path.exists(os.path.join(store, "_writer_lease"))


def test_lease_stale_holder_is_broken(spark, tmp_path):
    from flink_quickstart_spark.operators.maintenance import (
        store_writer_lease,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    with open(os.path.join(store, "_writer_lease"), "w") as fh:
        json.dump(
            {"op": "crashed", "pid": 1, "acquired_unix": time.time() - 7200},
            fh,
        )
    with store_writer_lease(store, "new-writer", ttl_seconds=3600):
        with open(os.path.join(store, "_writer_lease")) as fh:
            assert json.load(fh)["op"] == "new-writer"
    assert not os.path.exists(os.path.join(store, "_writer_lease"))


def test_lsh_ops_hold_the_lease(spark, tmp_path):
    from flink_quickstart_spark.operators.maintenance import (
        StoreWriterConflict,
        store_writer_lease,
    )
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_upsert_index,
    )

    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    lsh_build_index(emb.where(F.col("vec_id") % 10 != 0), path)
    with store_writer_lease(path, "other"):
        with pytest.raises(StoreWriterConflict):
            lsh_upsert_index(spark, path, emb.where(F.col("vec_id") % 10 == 0))


# ------------------------------------------------------ combo budget


def test_combo_budget_guard_fails_loudly(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_upsert_index,
    )

    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    lsh_build_index(emb.where(F.col("vec_id") % 10 != 0), path)
    pre = _multiset(
        spark.read.parquet(_sdd(path, "postings")),
        ["vec_id", "band_id", "bucket", "pos"],
    )
    with pytest.raises(ValueError, match="rebuild"):
        lsh_upsert_index(
            spark, path, emb.where(F.col("vec_id") % 10 == 0), max_combos=1
        )
    assert (
        _multiset(
            spark.read.parquet(_sdd(path, "postings")),
            ["vec_id", "band_id", "bucket", "pos"],
        )
        == pre
    )


# --------------------------------------------------- remote-scheme guard


def test_delete_ops_refuse_remote_schemes(spark):
    from flink_quickstart_spark.operators.dedup import minhash_delete_store
    from flink_quickstart_spark.operators.similarity import (
        ivf_delete_index,
        lsh_delete_index,
    )

    dummy = _docs(spark).limit(0)
    for op, path in (
        (lambda: minhash_delete_store(spark, "hdfs://nn/store", dummy), "hdfs"),
        (lambda: lsh_delete_index(spark, "s3a://b/ix", dummy), "s3a"),
        (lambda: ivf_delete_index(spark, "s3a://b/ivf", dummy), "s3a"),
    ):
        with pytest.raises(NotImplementedError, match=path):
            op()


# -------------------------------------------------- epoch-partitioned


def test_epoch_store_layout_guards(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )

    docs = _docs(spark)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    flat, epoch = str(tmp_path / "flat"), str(tmp_path / "epoch")
    minhash_build_store(corpus, flat)
    minhash_build_store(corpus, epoch, epoch_partitioned=True)
    with pytest.raises(ValueError, match="not epoch-partitioned"):
        minhash_upsert_store(spark, flat, batch, epoch=1)
    with pytest.raises(ValueError, match="epoch-partitioned"):
        minhash_upsert_store(spark, epoch, batch)
    with pytest.raises(ValueError, match="> 0"):
        minhash_upsert_store(spark, epoch, batch, epoch=0)


def test_epoch_upsert_replay_idempotent_and_eq_flat(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )

    docs = _docs(spark)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    epoch, full = str(tmp_path / "epoch"), str(tmp_path / "full")
    minhash_build_store(corpus, epoch, epoch_partitioned=True)
    minhash_upsert_store(spark, epoch, batch, epoch=1)
    cols = ["doc_id", "band_id", "sig"]
    once = _multiset(spark.read.parquet(_sdd(epoch, "bands")), cols)
    # replay: the dynamic overwrite of _epoch=1 replaces, never appends
    minhash_upsert_store(spark, epoch, batch, epoch=1)
    assert _multiset(spark.read.parquet(_sdd(epoch, "bands")), cols) == once
    # and the epoch layout carries exactly the flat union's rows
    minhash_build_store(docs, full)
    assert _multiset(spark.read.parquet(_sdd(full, "bands")), cols) == once


def test_epoch_store_delete_drops_emptied_epoch_partitions(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_delete_store,
        minhash_upsert_store,
    )

    docs = _docs(spark)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    epoch, ref = str(tmp_path / "epoch"), str(tmp_path / "ref")
    minhash_build_store(corpus, epoch, epoch_partitioned=True)
    minhash_upsert_store(spark, epoch, batch, epoch=1)
    minhash_delete_store(spark, epoch, batch)
    cols = ["doc_id", "band_id", "sig"]
    minhash_build_store(corpus, ref)
    assert _multiset(spark.read.parquet(_sdd(epoch, "bands")), cols) == _multiset(
        spark.read.parquet(_sdd(ref, "bands")), cols
    )
    # every _epoch=1 partition was emptied by the delete → dropped
    leftovers = [
        root
        for root, _d, files in os.walk(_sdd(epoch, "bands"))
        if "_epoch=1" in root and any(f.endswith(".parquet") for f in files)
    ]
    assert leftovers == []


def test_fold_epochs_compaction(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )
    from flink_quickstart_spark.operators.maintenance import (
        compact_minhash_store,
    )

    docs = _docs(spark)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    store = str(tmp_path / "store")
    minhash_build_store(corpus, store, epoch_partitioned=True)
    minhash_upsert_store(spark, store, batch, epoch=1)
    cols = ["doc_id", "band_id", "sig"]
    pre = _multiset(spark.read.parquet(_sdd(store, "bands")), cols)
    compact_minhash_store(spark, store)
    assert _multiset(spark.read.parquet(_sdd(store, "bands")), cols) == pre
    # all epochs folded into 0
    epochs = {
        seg
        for root, _d, files in os.walk(_sdd(store, "bands"))
        if any(f.endswith(".parquet") for f in files)
        for seg in root.split(os.sep)
        if seg.startswith("_epoch=")
    }
    assert epochs == {"_epoch=0"}


# ------------------------------------------------------ product quant


def test_pq_encode_deterministic_and_compact(spark, tmp_path):
    from flink_quickstart_spark.operators.quantization import (
        load_codebooks,
        pq_build_index,
        pq_encode_df,
    )

    emb = _emb(spark).select("vec_id", "embedding")
    path = str(tmp_path / "pq")
    pq_build_index(emb, path)
    books = load_codebooks(spark, path)
    m, k, dsub = books.shape
    dim = len(emb.first().embedding)
    assert m * dsub == dim
    # 8-bit code domain → 1 logical byte per code, 16x vs float32
    assert k <= 256 and m * 1 <= dim * 4 / 16
    persisted = {
        r.vec_id: tuple(r.codes)
        for r in spark.read.parquet(_sdd(path, "codes")).collect()
    }
    fresh = {
        r.vec_id: tuple(r.codes) for r in pq_encode_df(emb, books).collect()
    }
    assert fresh == persisted  # encode is bit-deterministic
    assert all(
        0 <= c < k for codes in persisted.values() for c in codes
    )
    assert len(persisted) == emb.count()


def test_pq_rerank_recovers_exact_topk(spark, tmp_path):
    """ADC shortlist-32 + exact re-rank == brute force top-3 on the
    test embeddings (measured containment 1.00 at every staged scale;
    pinned exactly here at sf0.001). Pure un-reranked ADC is allowed to
    be worse — that gap is WHY the production shape re-ranks."""
    from flink_quickstart_spark.operators.quantization import (
        pq_build_index,
        pq_query_index,
    )
    from flink_quickstart_spark.operators.similarity import brute_knn

    emb = _emb(spark).select("vec_id", "embedding")
    path = str(tmp_path / "pq")
    pq_build_index(emb, path)
    brute = {(r.query_id, r.nbr_id) for r in brute_knn(emb, k=3).collect()}
    rr = {
        (r.query_id, r.nbr_id)
        for r in pq_query_index(
            spark, path, emb, k=3, shortlist=32, vectors=emb
        ).collect()
    }
    assert rr == brute
    pure = {
        (r.query_id, r.nbr_id)
        for r in pq_query_index(spark, path, emb, k=3).collect()
    }
    assert len(pure & brute) / len(brute) > 0.4  # ADC alone is sane too


def test_pq_rerank_requires_vectors(spark, tmp_path):
    from flink_quickstart_spark.operators.quantization import (
        pq_build_index,
        pq_query_index,
    )
    import pytest as _pytest

    emb = _emb(spark).select("vec_id", "embedding")
    path = str(tmp_path / "pq")
    pq_build_index(emb, path)
    with _pytest.raises(ValueError, match="vectors"):
        pq_query_index(spark, path, emb, k=3, shortlist=8).collect()


def test_pq_dim_not_divisible_fails_loudly(spark):
    from flink_quickstart_spark.operators.quantization import (
        pq_train_codebooks,
    )
    import pytest as _pytest

    emb = _emb(spark).select("vec_id", "embedding")
    with _pytest.raises(ValueError, match="divisible"):
        pq_train_codebooks(emb, m=7)


def test_ivf_drift_monitor_tracks_drift(spark, tmp_path):
    """The monitor → trigger → retrain loop: quantization error is low
    on a fresh index, RISES after a drifted upsert (the retrain
    trigger), and falls back after retrain. Read-only: the monitor
    never mutates the index."""
    from flink_quickstart_spark.operators.similarity import (
        ivf_build_index,
        ivf_drift_stats,
        ivf_retrain_index,
        ivf_upsert_index,
    )

    emb = _emb(spark).select("vec_id", "embedding")
    drifted = emb.select(
        (F.col("vec_id") - F.lit(1_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    path = str(tmp_path / "mon")
    ivf_build_index(emb, path, n_clusters=8)
    snap = _file_snapshot(_sdd(path, "members"))
    fresh = ivf_drift_stats(spark, path)
    # monitor is READ-ONLY: the member files are untouched by it
    assert _file_snapshot(_sdd(path, "members")) == snap
    ivf_upsert_index(spark, path, drifted)
    after_drift = ivf_drift_stats(spark, path)
    # drifted ids are negative → orderBy(id) sampling sees them first,
    # exactly the newest-ingest-first bias a drift probe wants
    assert after_drift["qerr_mean"] > fresh["qerr_mean"]
    ivf_retrain_index(spark, path)
    after_retrain = ivf_drift_stats(spark, path)
    assert after_retrain["qerr_mean"] < after_drift["qerr_mean"]
    for key in ("occupancy_skew", "qerr_p95", "n_members", "n_clusters"):
        assert key in fresh


def test_lease_dead_local_holder_broken_immediately(spark, tmp_path):
    """A hard-killed writer (dead pid on THIS host) must not wedge the
    store until the TTL — the restarted streaming query has to replay
    its epoch immediately."""
    import socket
    import subprocess

    from flink_quickstart_spark.operators.maintenance import (
        store_writer_lease,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    # a real pid that has provably exited
    proc = subprocess.Popen(["true"])
    proc.wait()
    with open(os.path.join(store, "_writer_lease"), "w") as fh:
        json.dump(
            {
                "op": "killed-writer",
                "pid": proc.pid,
                "host": socket.gethostname(),
                "acquired_unix": time.time(),  # fresh — TTL would NOT fire
            },
            fh,
        )
    with store_writer_lease(store, "replayer", ttl_seconds=3600):
        with open(os.path.join(store, "_writer_lease")) as fh:
            assert json.load(fh)["op"] == "replayer"
