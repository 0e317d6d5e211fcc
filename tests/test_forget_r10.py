"""Cascading forget (operators/maintenance.forget_rows).

Right-to-be-forgotten across DERIVED stores: the corpus delete is the
easy half; band rows / postings / members / codes / MV contributions
must all go too, and a partial forget must be loud. Contracts:

1. One cascade over {minhash, lsh, ivf, ivfpq, mv} removes every trace
   of the forget batch; each id-keyed store's residue (verify pass) is
   zero, and each store equals a rebuild on the complement (the
   per-store delete == rebuild invariants compose).
2. The verify pass CATCHES residue: a store with manually re-appended
   forgotten rows fails loudly, names the store, and the cascade's
   audit marks it error while other stores still ran.
3. Unknown store kind rejected before any mutation.
4. Audit trail records per-store timings and statuses.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F, types as T

from flink_quickstart_spark.operators.maintenance import (
    forget_rows,
    store_data_dir as _sdd,
)

N_DOCS = 60
N_VECS = 80
DIM = 8


def _docs(spark, ids):
    return spark.range(0, N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta token"),
            F.col("id").cast("string"),
            F.lit(" omega psi chi phi"),
        ).alias("text"),
    ).where(F.col("doc_id").isin(ids) if ids is not None else F.lit(True))


def _vecs(spark, ids):
    # deterministic JVM-side pseudo-vectors (no Python row path)
    vec = F.array(
        *[F.sin(F.col("id") * (i + 1) + i).cast("float") for i in range(DIM)]
    )
    df = spark.range(0, N_VECS).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    return df.where(F.col("vec_id").isin(ids) if ids is not None else F.lit(True))


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    from flink_quickstart_spark.operators.dedup import minhash_build_store
    from flink_quickstart_spark.operators.matview import mv_build
    from flink_quickstart_spark.operators.quantization import ivfpq_build_index
    from flink_quickstart_spark.operators.similarity import (
        ivf_build_index,
        lsh_build_index,
    )

    base = tmp_path_factory.mktemp("forget")
    docs, vecs = _docs(spark, None), _vecs(spark, None)
    paths = {k: str(base / k) for k in ("minhash", "lsh", "ivf", "ivfpq", "mv")}
    minhash_build_store(docs, paths["minhash"])
    lsh_build_index(vecs, paths["lsh"], num_tables=2)
    ivf_build_index(vecs, paths["ivf"], n_clusters=4)
    ivfpq_build_index(vecs, paths["ivfpq"], n_clusters=4, m=4, k=16)
    mv_build(
        docs.select("doc_id", F.length("text").alias("v"))
        .withColumn("k", F.col("doc_id") % 7),
        paths["mv"],
        ["k"],
        [("count", "*", "n"), ("sum", "v", "sum_v")],
        n_buckets=8,
    )
    return paths


def test_cascade_forgets_everywhere(spark, stores, tmp_path):
    forget_doc_ids = [3, 17, 31, 45]
    forget_vec_ids = [4, 20, 36, 52, 68]
    fdocs = _docs(spark, forget_doc_ids)
    fvecs = _vecs(spark, forget_vec_ids)
    fmv = fdocs.select(
        "doc_id", F.length("text").alias("v")
    ).withColumn("k", F.col("doc_id") % 7)
    audit = forget_rows(
        spark,
        [
            {"kind": "minhash", "path": stores["minhash"], "df": fdocs},
            {"kind": "lsh", "path": stores["lsh"], "df": fvecs},
            {"kind": "ivf", "path": stores["ivf"], "df": fvecs},
            {"kind": "ivfpq", "path": stores["ivfpq"], "df": fvecs},
            {"kind": "mv", "path": stores["mv"], "df": fmv},
        ],
        verify=True,
    )
    assert [a["status"] for a in audit] == ["ok"] * 5
    assert all(a["seconds"] >= 0 for a in audit)
    # id-keyed stores report residue 0 from the verify pass
    assert [a["residue"] for a in audit[:4]] == [0, 0, 0, 0]
    # and the stores equal rebuilds on the complement (spot: row counts
    # per store id — the full multiset invariants are pinned in the
    # per-store delete tests)
    bands = spark.read.parquet(_sdd(stores["minhash"], "bands"))
    assert bands.where(F.col("doc_id").isin(forget_doc_ids)).count() == 0
    post = spark.read.parquet(_sdd(stores["lsh"], "postings"))
    assert post.where(F.col("vec_id").isin(forget_vec_ids)).count() == 0
    assert post.select("vec_id").distinct().count() == N_VECS - 5
    codes = spark.read.parquet(_sdd(stores["ivfpq"], "codes"))
    assert codes.count() == N_VECS - 5
    # MV: the forgotten docs' length contributions are retracted
    from flink_quickstart_spark.operators.matview import mv_read

    expect = (
        _docs(spark, None)
        .where(~F.col("doc_id").isin(forget_doc_ids))
        .select(F.length("text").alias("v"), (F.col("doc_id") % 7).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
    )
    got = mv_read(spark, stores["mv"])
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in expect.select("k", "n", "sum_v").collect()
    }


def test_full_forget_empties_store_ok(spark, tmp_path):
    """Forgetting EVERY row drops all data files; the verify pass must
    report residue 0 — not the parquet schema-inference error an empty
    directory raises (r10 ADVICE: a fully successful compliance delete
    was reported as status='error')."""
    from flink_quickstart_spark.operators.similarity import lsh_build_index

    path = str(tmp_path / "lsh_all")
    vecs = _vecs(spark, None)
    lsh_build_index(vecs, path, num_tables=2)
    audit = forget_rows(
        spark, [{"kind": "lsh", "path": path, "df": vecs}], verify=True
    )
    assert audit[0]["status"] == "ok"
    assert audit[0]["residue"] == 0


def test_verify_catches_residue(spark, tmp_path):
    """A store whose delete 'missed' rows (simulated by re-appending
    them) must fail the cascade loudly — and the audit shows which."""
    from flink_quickstart_spark.operators.dedup import minhash_build_store

    path = str(tmp_path / "minhash_bad")
    docs = _docs(spark, None)
    minhash_build_store(docs, path)
    fdocs = _docs(spark, [7, 21])
    # sabotage: squirrel away copies of the victim band rows, then
    # re-append them after the delete via a second forged cascade
    victim = spark.read.parquet(_sdd(path, "bands")).where(
        F.col("doc_id").isin(7, 21)
    )
    victim_rows = victim.collect()
    audit = forget_rows(
        spark, [{"kind": "minhash", "path": path, "df": fdocs}], verify=True
    )
    assert audit[0]["residue"] == 0
    # Forge residue IN A PARTITION THE DELETE'S PRUNING NEVER PROBES —
    # the exact bug class (layout/prune disagreement) the verify pass
    # exists for. Residue in a probed partition would just be deleted
    # again (the delete is idempotent); misplaced residue would survive
    # forever without the audit scan.
    probed = {r["_hmod"] for r in victim_rows}
    free = next(h for h in range(64) if h not in probed)
    forged = spark.createDataFrame(victim_rows, victim.schema).withColumn(
        "_hmod", F.lit(free)
    )
    # forge into the CURRENT generation — the one the verify pass (and
    # every reader) resolves to; the root dir is the frozen gen-0 build
    forged.write.mode("append").partitionBy("_hmod").parquet(
        _sdd(path, "bands")
    )
    with pytest.raises(RuntimeError, match="still holds|stores failed"):
        forget_rows(
            spark, [{"kind": "minhash", "path": path, "df": fdocs}], verify=True
        )


def test_unknown_kind_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown store kind"):
        forget_rows(
            spark,
            [{"kind": "hnsw", "path": str(tmp_path), "df": _docs(spark, [1])}],
        )


def test_error_isolation(spark, tmp_path):
    """A failing store doesn't stop the cascade: the OTHER store still
    forgets, and the summary raise carries the audit."""
    from flink_quickstart_spark.operators.dedup import minhash_build_store

    good = str(tmp_path / "good")
    minhash_build_store(_docs(spark, None), good)
    fdocs = _docs(spark, [2])
    with pytest.raises(RuntimeError, match="1 of 2 stores failed"):
        forget_rows(
            spark,
            [
                # missing store directory → this job errors
                {"kind": "lsh", "path": str(tmp_path / "absent"), "df": _vecs(spark, [1])},
                {"kind": "minhash", "path": good, "df": fdocs},
            ],
            verify=True,
        )
    bands = spark.read.parquet(_sdd(good, "bands"))
    assert bands.where(F.col("doc_id") == 2).count() == 0
