"""OPQ — optimized product quantization (K4j, r12).

The rotation is a learned store artifact (like the codebooks): an
orthogonal dim×dim matrix trained by alternating minimization
(eigenvalue-balanced PCA init → per-subspace k-means → orthogonal
Procrustes; Ge et al. CVPR 2014, FAISS ``OPQMatrix``), applied to
vectors at encode time and to queries at plan time. Contracts:

1. Training is deterministic (two trains are bit-identical) and the
   rotation is orthogonal to machine precision.
2. At the coarse operating point (m=4 → dsub=16) on correlated data,
   OPQ's reconstruction beats plain PQ's at the same bit budget; on
   the raw ISOTROPIC embeddings it does not lose (rotation of a
   uniform distribution changes nothing material).
3. The OPQ store lives the full flat-PQ lifecycle: upsert encodes new
   rows against the STORED rotation+codebooks (grown store ==
   same-artifact full re-encode), delete prunes by id hash, and the
   rotation artifact survives generation publication.
4. The rotated ADC query path: shortlist+re-rank recall@3 >= 0.9 vs
   exact brute force on the correlated corpus.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_quickstart_spark.operators.quantization import (
    load_codebooks,
    load_rotation,
    opq_train,
    pq_build_index,
    pq_delete_index,
    pq_encode_df,
    pq_query_index,
    pq_upsert_index,
)
from tests.conftest import SF_DIR

M, K = 4, 64  # coarse operating point, small k for test speed


def _corpus(spark, n=400):
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F.col("vec_id") < n)
    )
    e = F.col("embedding")
    h1, h2 = F.slice(e, 1, 32), F.slice(e, 33, 32)
    return emb.select(
        "vec_id",
        F.concat(h1, F.zip_with(h1, h2, lambda a, b: a + 0.1 * b)).alias(
            "embedding"
        ),
    )


def _recon_mse(spark, corpus, path):
    from flink_quickstart_spark.operators.quantization import pq_decode_df

    rows = (
        corpus.join(pq_decode_df(spark, path), "vec_id")
        .select("embedding", "recon")
        .collect()
    )
    err = 0.0
    for r in rows:
        v = np.asarray(r.embedding, dtype=float)
        v = v / np.linalg.norm(v)
        err += float(((v - np.asarray(r.recon)) ** 2).sum())
    return err / len(rows)


def test_opq_train_deterministic_and_orthogonal(spark):
    corpus = _corpus(spark)
    r1, b1 = opq_train(corpus, m=M, k=K, sample_rows=400, opq_iters=4)
    r2, b2 = opq_train(corpus, m=M, k=K, sample_rows=400, opq_iters=4)
    assert np.array_equal(r1, r2) and np.array_equal(b1, b2)
    assert np.abs(r1 @ r1.T - np.eye(len(r1))).max() < 1e-8


def test_opq_beats_plain_on_correlated_data(spark, tmp_path):
    corpus = _corpus(spark)
    opq_p, plain_p = str(tmp_path / "opq"), str(tmp_path / "plain")
    pq_build_index(corpus, opq_p, m=M, k=K, opq=True, opq_iters=4)
    pq_build_index(corpus, plain_p, m=M, k=K)
    assert _recon_mse(spark, corpus, opq_p) < _recon_mse(
        spark, corpus, plain_p
    )


def test_opq_no_loss_on_isotropic_data(spark, tmp_path):
    # raw uniform embeddings: rotation is useless by construction but
    # must not HURT (within a small tolerance — different argmin
    # basins, same bit budget)
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F.col("vec_id") < 400)
        .select("vec_id", "embedding")
    )
    opq_p, plain_p = str(tmp_path / "opq"), str(tmp_path / "plain")
    pq_build_index(emb, opq_p, m=M, k=K, opq=True, opq_iters=4)
    pq_build_index(emb, plain_p, m=M, k=K)
    assert _recon_mse(spark, emb, opq_p) <= 1.05 * _recon_mse(
        spark, emb, plain_p
    )


def test_opq_store_lifecycle_preserves_rotation(spark, tmp_path):
    corpus = _corpus(spark)
    base = corpus.where(F.col("vec_id") % 5 != 0)
    batch = corpus.where(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "opq")
    pq_build_index(base, path, m=M, k=K, opq=True, opq_iters=4)
    rot0 = load_rotation(spark, path)
    assert rot0 is not None

    pq_upsert_index(spark, path, batch)  # generation 1
    rot1 = load_rotation(spark, path)
    assert np.array_equal(rot0, rot1)  # artifact survives publication
    # grown store == same-artifact full re-encode, row-identical
    books = load_codebooks(spark, path)
    expect = {
        (r.vec_id, tuple(r.codes))
        for r in pq_encode_df(corpus, books, rotation=rot1).collect()
    }
    from flink_quickstart_spark.operators.maintenance import read_store

    got = {
        (r.vec_id, tuple(r.codes))
        for r in read_store(spark, path, "codes")
        .select("vec_id", "codes")
        .collect()
    }
    assert got == expect

    pq_delete_index(spark, path, batch.select("vec_id"))  # generation 2
    got2 = {
        r.vec_id
        for r in read_store(spark, path, "codes").select("vec_id").collect()
    }
    assert got2 == {r.vec_id for r in base.select("vec_id").collect()}
    assert np.array_equal(load_rotation(spark, path), rot0)


def test_opq_query_recall_with_rerank(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import brute_knn

    corpus = _corpus(spark)
    path = str(tmp_path / "opq")
    pq_build_index(corpus, path, m=M, k=K, opq=True, opq_iters=4)
    brute = {
        (r.query_id, r.nbr_id)
        for r in brute_knn(corpus, k=3).select("query_id", "nbr_id").collect()
    }
    # k=64 codebooks (test-speed choice) are coarser than the driver
    # key's k=256, so the ADC ordering is noisier — a deeper shortlist
    # restores the contract (the production knob working as designed)
    got = {
        (r.query_id, r.nbr_id)
        for r in pq_query_index(
            spark, path, corpus, k=3, shortlist=64, vectors=corpus
        )
        .select("query_id", "nbr_id")
        .collect()
    }
    assert len(brute & got) / len(brute) >= 0.9


def test_plain_store_has_no_rotation(spark, tmp_path):
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F.col("vec_id") < 200)
        .select("vec_id", "embedding")
    )
    path = str(tmp_path / "plain")
    pq_build_index(emb, path, m=M, k=K)
    assert load_rotation(spark, path) is None


def test_opq_dim_not_divisible_fails_loudly(spark):
    corpus = _corpus(spark).select(
        "vec_id", F.slice("embedding", 1, 63).alias("embedding")
    )
    with pytest.raises(ValueError, match="not divisible"):
        opq_train(corpus, m=4, k=16, sample_rows=100, opq_iters=1)
