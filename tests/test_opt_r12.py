"""Focused tests for round-12 OPTIMIZATION internals.

Covers the three operator-internal rewrites of the optimization round:

- the argpartition-window top-k kernels (brute_knn's inline form and
  quantization._adc_topk) must stay BIT-IDENTICAL to the naive
  full-sort ranking, including adversarial tie layouts at the window
  boundary (the fallback path) and -inf (self / out-of-probe) entries;
- StoreSnapshot.rows (driver-side pyarrow artifact reads) must return
  the same rows as the Spark manifest read it replaced.
"""

from __future__ import annotations

import numpy as np
import pytest

from flink_quickstart_spark.operators.quantization import _adc_topk


def _naive_topk(sims, ids_q, n_ids, cut):
    """The pre-r12 per-row reference: full lexsort by (-sim, id),
    truncate to cut, drop -inf."""
    out = []
    for i, qid in enumerate(ids_q):
        s_row = sims[i]
        top = np.lexsort((n_ids, -s_row))[: min(cut, sims.shape[1])]
        for t in top:
            if s_row[t] != -np.inf:
                out.append((int(qid), int(n_ids[t]), round(float(s_row[t]), 6)))
    return out


def _kernel_rows(df):
    return list(
        zip(
            df["query_id"].astype(int),
            df["nbr_id"].astype(int),
            df["adc_sim"].astype(float).round(6),
        )
    )


def test_adc_topk_matches_naive_random():
    rng = np.random.default_rng(7)
    sims = rng.random((40, 500))
    ids_q = np.arange(40, dtype=np.int64)
    n_ids = np.arange(500, dtype=np.int64)
    np.copyto(sims, -np.inf, where=ids_q[:, None] == n_ids[None, :])
    got = _kernel_rows(_adc_topk(sims, ids_q, n_ids, 32, 6))
    assert got == _naive_topk(sims, ids_q, n_ids, 32)


def test_adc_topk_tie_spanning_window_boundary_falls_back():
    """Every candidate has the SAME sim — the k-th value ties the
    window minimum for every row, forcing the exactness fallback; the
    id-asc tie-break must pick the smallest ids, like the naive sort."""
    n = 500
    sims = np.full((3, n), 0.5)
    ids_q = np.asarray([1000, 1001, 1002], dtype=np.int64)
    n_ids = np.arange(n, dtype=np.int64)[::-1].copy()  # descending ids
    got = _kernel_rows(_adc_topk(sims, ids_q, n_ids, 8, 6))
    assert got == _naive_topk(sims, ids_q, n_ids, 8)
    # smallest ids win the all-tied ranking
    assert [r[1] for r in got[:8]] == list(range(8))


def test_adc_topk_mostly_neginf_rows():
    """IVFPQ probe masking: rows where only a few entries are finite
    (including one all--inf row, which must emit nothing)."""
    rng = np.random.default_rng(3)
    sims = np.full((5, 200), -np.inf)
    ids_q = np.arange(5, dtype=np.int64)
    n_ids = np.arange(200, dtype=np.int64)
    for i in range(4):  # row 4 stays all -inf
        cols = rng.choice(200, size=3 + i, replace=False)
        sims[i, cols] = rng.random(len(cols))
    got = _kernel_rows(_adc_topk(sims, ids_q, n_ids, 32, 6))
    assert got == _naive_topk(sims, ids_q, n_ids, 32)
    assert not any(q == 4 for q, _, _ in got)


def test_adc_topk_cut_wider_than_corpus():
    sims = np.asarray([[0.3, 0.9, 0.9, -np.inf]])
    got = _kernel_rows(
        _adc_topk(sims, np.asarray([9]), np.asarray([4, 3, 2, 9]), 10, 6)
    )
    # ties on 0.9 break id-asc (2 before 3), -inf dropped
    assert got == [(9, 2, 0.9), (9, 3, 0.9), (9, 4, 0.3)]


def test_store_snapshot_rows_matches_spark_read(tmp_path, spark):
    from pyspark.sql import functions as F

    from flink_quickstart_spark.operators.dedup import minhash_build_store
    from flink_quickstart_spark.operators.maintenance import (
        open_store_snapshot,
        read_store,
        read_store_rows,
    )

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta epsilon zeta "), F.col("id")).alias(
            "text"
        ),
    )
    store = str(tmp_path / "rows_store")
    minhash_build_store(docs, store)
    via_rows = read_store_rows(store, "meta")
    via_spark = read_store(spark, store, "meta").collect()
    assert len(via_rows) == len(via_spark) == 1
    assert via_rows[0].asDict() == via_spark[0].asDict()
    # snapshot handle agrees with the module-level helper
    snap = open_store_snapshot(store)
    assert snap.rows("meta")[0].asDict() == via_rows[0].asDict()


@pytest.mark.parametrize("k", [1, 3])
def test_brute_knn_matches_per_row_reference(spark, k):
    """brute_knn's argpartition window vs the pre-r12 per-row loop."""
    import pandas as pd
    from pyspark.sql import functions as F

    from flink_quickstart_spark.operators.similarity import brute_knn

    rng = np.random.default_rng(11)
    n, dim = 60, 8
    mat = rng.normal(size=(n, dim))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat.astype(float))}
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r.query_id, r.rank): (r.nbr_id, round(r.sim, 6))
        for r in brute_knn(df, k=k).collect()
    }
    # per-row reference
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / (norms[:, None] * norms[None, :])
    ids = np.arange(n)
    for q in range(n):
        s = np.where(ids == q, -np.inf, sims[q])
        top = np.lexsort((ids, -s))[:k]
        for rank, t in enumerate(top, 1):
            nbr, sim = got[(q, rank)]
            assert nbr == ids[t]
            assert sim == round(float(s[t]), 6)
