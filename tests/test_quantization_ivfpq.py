"""IVFPQ (K4i, r10) invariants: the pruned+compressed vector store.

The two registered keys pin recall (q_llm_ivfpq_query, ≥ 0.5 vs brute)
and upsert == re-encode (q_llm_ivfpq_upsert). These tests pin what the
keys can't express as one aggregate row:

1. WITHIN-PROBE LOSSLESSNESS — the reason the 16× compression is free
   at this probe budget: for every query, IVFPQ's re-ranked top-k is
   EXACTLY the brute-force cosine top-k restricted to that query's
   probed clusters (numpy reference). Every recall loss is therefore an
   unprobed-cluster loss — an n_probe knob, not a quantization defect.
2. DELETE == re-encode of the remainder, with emptied cluster
   partitions physically DROPPED (dynamic overwrite alone would keep
   their stale files).
3. LIFECYCLE DISCIPLINE — upsert/delete/compact hold the store writer
   lease; delete refuses remote schemes; an empty delete batch is a
   byte-level no-op; compaction preserves the row multiset at one file
   per cluster; shortlist re-rank fails loudly without the
   full-precision table.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.test_invariants_r10 import _file_snapshot, _multiset
from flink_quickstart_spark.operators.maintenance import store_data_dir as _sdd


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _build(spark, tmp_path, df=None, name="ivfpq"):
    from flink_quickstart_spark.operators.quantization import ivfpq_build_index

    path = str(tmp_path / name)
    ivfpq_build_index(df if df is not None else _emb(spark), path, n_clusters=16)
    return path


def test_ivfpq_rerank_lossless_within_probes(spark, tmp_path):
    from flink_quickstart_spark.operators.quantization import (
        ivfpq_query_index,
        load_ivfpq_artifacts,
    )

    emb = _emb(spark)
    path = _build(spark, tmp_path)
    k, n_probe = 3, 4
    got = {
        (r.query_id, r.rank): r.nbr_id
        for r in ivfpq_query_index(
            spark, path, emb, k=k, n_probe=n_probe, shortlist=32, vectors=emb
        ).collect()
    }
    # numpy reference: exact cosine top-k restricted to probed clusters
    cents, _books = load_ivfpq_artifacts(spark, path)
    pdf = emb.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    clus = np.argmax(vn @ cents.T, axis=1)
    probes = np.argsort(-(vn @ cents.T), axis=1)[:, :n_probe]
    sims = vn @ vn.T
    for i, qid in enumerate(ids):
        in_probe = np.isin(clus, probes[i])
        s = np.where(in_probe & (ids != qid), sims[i], -np.inf)
        top = np.lexsort((ids, -s))[:k]
        for rank, t in enumerate(top, start=1):
            if s[t] == -np.inf:
                break
            assert got[(qid, rank)] == ids[t], (
                f"query {qid} rank {rank}: ivfpq={got[(qid, rank)]} "
                f"exact-within-probes={ids[t]}"
            )


def test_ivfpq_delete_eq_reencode_and_drops_emptied_partitions(spark, tmp_path):
    from flink_quickstart_spark.operators.quantization import (
        _ivfpq_encode_df,
        ivfpq_delete_index,
        load_ivfpq_artifacts,
    )

    emb = _emb(spark)
    path = _build(spark, tmp_path)
    cents, books = load_ivfpq_artifacts(spark, path)
    # delete one ENTIRE cluster plus a slice of others
    codes = spark.read.parquet(_sdd(path, "codes"))
    victim = codes.groupBy("cluster_id").count().orderBy("count", "cluster_id").first()
    victim_ids = {
        r.vec_id
        for r in codes.where(F.col("cluster_id") == victim.cluster_id).collect()
    }
    del_ids = victim_ids | {
        r.vec_id for r in codes.where(F.col("vec_id") % 7 == 0).collect()
    }
    del_df = emb.where(F.col("vec_id").isin([int(i) for i in del_ids]))
    ivfpq_delete_index(spark, path, del_df)
    remainder = emb.where(~F.col("vec_id").isin([int(i) for i in del_ids]))
    cols = ["vec_id", "codes", "cluster_id"]
    left = _multiset(
        spark.read.parquet(_sdd(path, "codes")).select(*cols).withColumn(
            "codes", F.col("codes").cast("string")
        ),
        cols,
    )
    right = _multiset(
        _ivfpq_encode_df(remainder, cents, books).select(*cols).withColumn(
            "codes", F.col("codes").cast("string")
        ),
        cols,
    )
    assert left == right
    # the fully-deleted cluster's directory is gone from the PUBLISHED
    # generation, not just empty (the root dir is the frozen gen-0 build)
    assert not os.path.exists(
        os.path.join(_sdd(path, "codes"), f"cluster_id={victim.cluster_id}")
    )


def test_ivfpq_empty_delete_is_noop(spark, tmp_path):
    from flink_quickstart_spark.operators.quantization import ivfpq_delete_index

    emb = _emb(spark)
    path = _build(spark, tmp_path)
    pre = _file_snapshot(_sdd(path, "codes"))
    ivfpq_delete_index(spark, path, emb.where(F.lit(False)))
    assert _file_snapshot(_sdd(path, "codes")) == pre
    assert not os.path.exists(os.path.join(path, "_writer_lease"))


def test_ivfpq_ops_hold_the_lease(spark, tmp_path):
    from flink_quickstart_spark.operators.maintenance import (
        StoreWriterConflict,
        compact_ivfpq_index,
        store_writer_lease,
    )
    from flink_quickstart_spark.operators.quantization import (
        ivfpq_delete_index,
        ivfpq_upsert_index,
    )

    emb = _emb(spark)
    path = _build(spark, tmp_path, emb.where(F.col("vec_id") % 10 != 0))
    batch = emb.where(F.col("vec_id") % 10 == 0)
    with store_writer_lease(path, "other"):
        with pytest.raises(StoreWriterConflict):
            ivfpq_upsert_index(spark, path, batch)
        with pytest.raises(StoreWriterConflict):
            ivfpq_delete_index(spark, path, batch)
        with pytest.raises(StoreWriterConflict):
            compact_ivfpq_index(spark, path)
    # lease released on exit → the writer now succeeds
    ivfpq_upsert_index(spark, path, batch)


def test_ivfpq_delete_refuses_remote_scheme(spark):
    from flink_quickstart_spark.operators.quantization import ivfpq_delete_index

    with pytest.raises(NotImplementedError, match="s3a"):
        ivfpq_delete_index(spark, "s3a://b/ivfpq", _emb(spark).limit(0))


def test_ivfpq_compact_preserves_rows_one_file_per_cluster(spark, tmp_path):
    from flink_quickstart_spark.operators.maintenance import (
        compact_ivfpq_index,
        data_file_counts,
    )
    from flink_quickstart_spark.operators.quantization import ivfpq_upsert_index

    emb = _emb(spark)
    path = _build(spark, tmp_path, emb.where(F.col("vec_id") % 10 != 0))
    # a few daily appends dilute the partitions
    for d in range(3):
        ivfpq_upsert_index(
            spark, path, emb.where(F.col("vec_id") % 10 == 0).withColumn(
                "vec_id", F.col("vec_id") + (d + 1) * 1_000_000
            )
        )
    cols = ["vec_id", "codes", "cluster_id"]
    pre = _multiset(
        spark.read.parquet(_sdd(path, "codes")).withColumn(
            "codes", F.col("codes").cast("string")
        ),
        cols,
    )
    assert max(data_file_counts(_sdd(path, "codes")).values()) > 1
    compact_ivfpq_index(spark, path)
    post = _multiset(
        spark.read.parquet(_sdd(path, "codes")).withColumn(
            "codes", F.col("codes").cast("string")
        ),
        cols,
    )
    assert post == pre
    assert max(data_file_counts(_sdd(path, "codes")).values()) == 1


def test_ivfpq_rerank_requires_vectors(spark, tmp_path):
    from flink_quickstart_spark.operators.quantization import ivfpq_query_index

    emb = _emb(spark)
    path = _build(spark, tmp_path)
    with pytest.raises(ValueError, match="vectors="):
        ivfpq_query_index(spark, path, emb, k=3, shortlist=8, vectors=None)
    # diagnostics path: raw ADC top-k needs no full-precision table
    raw = ivfpq_query_index(spark, path, emb.limit(4), k=3, shortlist=None)
    assert raw.count() > 0


def test_ivfpq_retrain_restores_encode_quality_on_drift(spark, tmp_path):
    """Deliberate drift (the antipode staging of the IVF twin): upsert
    the NEGATED corpus — maximally bad fit for the stored centroids AND
    the stored residual codebooks. Before retrain the drifted half's
    reconstruction (centroid + decoded residual vs the true vector) is
    poor; after retrain the mean reconstruction cosine over ALL rows
    must rise, and the drift report must show a real centroid shift."""
    from flink_quickstart_spark.operators.quantization import (
        ivfpq_build_index,
        ivfpq_retrain_index,
        ivfpq_upsert_index,
        load_ivfpq_artifacts,
    )

    emb = _emb(spark).select("vec_id", "embedding")
    drifted = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    path = str(tmp_path / "drift")
    ivfpq_build_index(emb, path, n_clusters=8)
    ivfpq_upsert_index(spark, path, drifted)
    grown = emb.unionByName(drifted)

    def mean_recon_cos() -> float:
        cents, books = load_ivfpq_artifacts(spark, path)
        m, _k, dsub = books.shape
        vecs = {
            r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in grown.collect()
        }
        coss = []
        for r in spark.read.parquet(_sdd(path, "codes")).collect():
            v = vecs[r.vec_id]
            v = v / np.linalg.norm(v)
            recon = cents[r.cluster_id] + np.concatenate(
                [books[s][r.codes[s]] for s in range(m)]
            )
            coss.append(
                float(v @ recon) / float(np.linalg.norm(recon))
            )
        return float(np.mean(coss))

    before = mean_recon_cos()
    report = ivfpq_retrain_index(spark, path, grown, n_clusters=8)
    after = mean_recon_cos()
    assert after > before  # encode quality restored
    assert report["centroid_shift_max"] > 0.05  # drift was real and seen
    assert report["n_codes"] == emb.count() * 2


def test_ivfpq_retrain_guards(spark, tmp_path):
    from flink_quickstart_spark.operators.quantization import (
        ivfpq_build_index,
        ivfpq_retrain_index,
    )

    emb = _emb(spark)
    # remote scheme refused before any work
    with pytest.raises(NotImplementedError, match="s3a"):
        ivfpq_retrain_index(spark, "s3a://b/ivfpq", emb)
    # wrong corpus (not the store's logical content) fails loudly
    path = _build(spark, tmp_path)
    with pytest.raises(ValueError, match="logical content"):
        ivfpq_retrain_index(spark, path, emb.where(F.col("vec_id") % 2 == 0))


def _docs_meta(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").alias("vec_id"), "lang", "source"
    )


def test_ivfpq_filtered_prefilter_exact_within_probes(spark, tmp_path):
    """Filtered ANN is PRE-filtering: for every query (filtered or
    not), the re-ranked top-k equals the exact cosine top-k over
    (probed clusters ∩ eligible rows) — numpy reference. Pinned with
    ALL vectors as queries while only lang='en' rows are eligible, so
    the test also covers queries that are themselves ineligible."""
    from flink_quickstart_spark.operators.quantization import (
        ivfpq_build_index,
        ivfpq_query_index,
        load_ivfpq_artifacts,
    )

    emb = _emb(spark)
    meta = emb.join(_docs_meta(spark), "vec_id")
    path = str(tmp_path / "ivfpq_meta")
    ivfpq_build_index(meta, path, n_clusters=16, extra_cols=("lang", "source"))
    k, n_probe = 3, 4
    got = {
        (r.query_id, r.rank): r.nbr_id
        for r in ivfpq_query_index(
            spark, path, emb, k=k, n_probe=n_probe, shortlist=32,
            vectors=emb, where="lang = 'en'",
        ).collect()
    }
    cents, _books = load_ivfpq_artifacts(spark, path)
    pdf = meta.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    eligible = (pdf["lang"] == "en").to_numpy()
    v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    clus = np.argmax(vn @ cents.T, axis=1)
    probes = np.argsort(-(vn @ cents.T), axis=1)[:, :n_probe]
    sims = vn @ vn.T
    n_checked = 0
    for i, qid in enumerate(ids):
        ok = np.isin(clus, probes[i]) & eligible & (ids != qid)
        s = np.where(ok, sims[i], -np.inf)
        top = np.lexsort((ids, -s))[:k]
        for rank, t in enumerate(top, start=1):
            if s[t] == -np.inf:
                break
            assert got[(qid, rank)] == ids[t]
            n_checked += 1
    assert n_checked > len(ids)  # the reference actually produced ranks


def test_ivfpq_metadata_survives_the_lifecycle(spark, tmp_path):
    """extra_cols are schema-faithful through upsert, delete and
    retrain (auto-carried via _store_extra_cols): after all three, the
    store's (id → lang, source) mapping equals the source metadata."""
    from flink_quickstart_spark.operators.quantization import (
        ivfpq_build_index,
        ivfpq_delete_index,
        ivfpq_retrain_index,
        ivfpq_upsert_index,
    )

    emb = _emb(spark)
    meta = emb.join(_docs_meta(spark), "vec_id")
    path = str(tmp_path / "ivfpq_meta")
    base = meta.where(F.col("vec_id") % 10 != 0)
    batch = meta.where(F.col("vec_id") % 10 == 0)
    ivfpq_build_index(base, path, n_clusters=16, extra_cols=("lang", "source"))
    ivfpq_upsert_index(spark, path, batch)
    ivfpq_delete_index(spark, path, meta.where(F.col("vec_id") % 7 == 0))
    remaining = meta.where(F.col("vec_id") % 7 != 0)
    ivfpq_retrain_index(spark, path, remaining)
    got = _multiset(
        spark.read.parquet(_sdd(path, "codes")), ["vec_id", "lang", "source"]
    )
    want = _multiset(remaining, ["vec_id", "lang", "source"])
    assert got == want
