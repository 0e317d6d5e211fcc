"""Round-11 invariants: generation-swap publication (reader snapshot
isolation), the flat-PQ lifecycle, and the HLL approx-distinct MV.

1. GENERATION PROTOCOL (VERDICT r10 #1): every mutating store op
   publishes as an atomic pointer flip over a hardlink-staged clone —
   a reader opened before the mutation keeps seeing its snapshot
   bit-for-bit; a fresh resolve sees exactly the new store; a crash
   (injected) anywhere before the flip leaves the store untouched and
   the lease released; an empty batch publishes nothing; GC retains
   {previous, current} and never touches the root build.
2. PQ LIFECYCLE (VERDICT r10 #2): upsert == same-codebook full
   re-encode (row identity); delete == re-encode of the complement,
   located by ID HASH alone (no vector payload), bucket-local (files
   of untouched ``_idmod`` buckets are shared inodes with the prior
   generation); the ``"pq"`` forget kind cascades with residue audit
   and catches planted residue.
3. HLL MV (VERDICT r10 #3): approx_count_distinct partial state merges
   across refreshes within the 5% contract; retraction takes the
   recompute path on flat stores and is rejected loudly on epoch
   stores (sketches cannot subtract).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from flink_quickstart_spark.operators.maintenance import (
    current_store_root,
    generation_id,
    store_data_dir as _sdd,
)


def _emb(spark, n=450):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").where(
        F.col("vec_id") < n
    )


def _docs(spark, n=300):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < n)
    )


def _multiset(df, cols):
    from collections import Counter

    return Counter(
        tuple(
            tuple(r[c]) if isinstance(r[c], list) else r[c] for c in cols
        )
        for r in df.select(*cols).collect()
    )


def _file_meta(base):
    out = {}
    for root, _d, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[os.path.relpath(p, base)] = (st.st_size, st.st_mtime_ns)
    return out


# ------------------------------------------------ generation protocol


def test_reader_snapshot_isolation_across_delete(spark, tmp_path):
    """The r11 flagship: a reader that resolved the store BEFORE a
    delete keeps seeing the pre-delete content exactly; a fresh
    resolve sees exactly the post-delete content — never a mix."""
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_delete_index,
    )

    emb = _emb(spark)
    batch = emb.where(F.col("vec_id") % 7 == 0)
    path = str(tmp_path / "lsh")
    lsh_build_index(emb, path)
    cols = ["vec_id", "band_id", "bucket", "pos"]

    old_root = current_store_root(path)
    old_reader = spark.read.parquet(os.path.join(old_root, "postings"))
    pre = _multiset(old_reader, cols)

    lsh_delete_index(spark, path, batch)

    # the pre-opened snapshot is bit-stable (its files were never
    # touched — the delete staged a clone and flipped the pointer)
    assert _multiset(old_reader, cols) == pre
    # a fresh resolve sees exactly the post-delete store
    post = _multiset(spark.read.parquet(_sdd(path, "postings")), cols)
    deleted_ids = {r.vec_id for r in batch.select("vec_id").collect()}
    assert {k[0] for k in pre} - {k[0] for k in post} == deleted_ids
    assert current_store_root(path) != old_root


def test_crash_before_publish_leaves_store_untouched(spark, tmp_path, monkeypatch):
    from flink_quickstart_spark.operators import similarity as sim

    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    sim.lsh_build_index(emb, path)
    pre = _file_meta(_sdd(path, "postings"))
    assert generation_id(path) == 0

    def boom(*a, **k):
        raise RuntimeError("injected crash mid-mutation")

    monkeypatch.setattr(sim, "_assign_pos", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        sim.lsh_delete_index(spark, path, emb.limit(5))
    monkeypatch.undo()

    # no pointer flip, no staged residue, lease released, bytes intact
    assert generation_id(path) == 0
    assert not [d for d in os.listdir(path) if d.startswith("_gen-")]
    assert not os.path.exists(os.path.join(path, "_writer_lease"))
    assert _file_meta(_sdd(path, "postings")) == pre
    # and the op works again afterwards
    sim.lsh_delete_index(spark, path, emb.limit(5))
    assert generation_id(path) == 1


def test_empty_batch_publishes_no_generation(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_upsert_index,
    )

    emb = _emb(spark)
    path = str(tmp_path / "lsh")
    lsh_build_index(emb, path)
    lsh_upsert_index(spark, path, emb.where(F.lit(False)))
    assert generation_id(path) == 0
    assert not [d for d in os.listdir(path) if d.startswith("_gen-")]


def test_generation_gc_keeps_previous_and_root(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import (
        ivf_build_index,
        ivf_delete_index,
        ivf_upsert_index,
    )
    from flink_quickstart_spark.operators.maintenance import compact_ivf_index

    emb = _emb(spark)
    b1 = emb.where(F.col("vec_id") % 3 == 0)
    path = str(tmp_path / "ivf")
    ivf_build_index(emb.where(F.col("vec_id") % 3 != 0), path, n_clusters=8)
    ivf_upsert_index(spark, path, b1)       # gen 1
    ivf_delete_index(spark, path, b1)       # gen 2
    compact_ivf_index(spark, path)          # gen 3 (gen 1 GC'd)
    gens = sorted(d for d in os.listdir(path) if d.startswith("_gen-"))
    assert gens == ["_gen-000002", "_gen-000003"]
    # the root build (generation 0) is never deleted
    assert os.path.isdir(os.path.join(path, "members"))
    assert generation_id(path) == 3


def test_rebuild_over_mutated_store_resets_pointer(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )

    docs = _docs(spark)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "mh")
    minhash_build_store(corpus, path)
    minhash_upsert_store(spark, path, batch)
    assert generation_id(path) == 1
    # a rebuild must drop the pointer, or readers would resolve to the
    # stale last generation while the fresh build sits unread
    minhash_build_store(corpus, path)
    assert generation_id(path) == 0
    assert not [d for d in os.listdir(path) if d.startswith("_gen-")]
    assert _multiset(
        spark.read.parquet(_sdd(path, "bands")), ["doc_id", "band_id", "sig"]
    ) == _multiset(
        spark.read.parquet(os.path.join(path, "bands")),
        ["doc_id", "band_id", "sig"],
    )


def test_forget_verify_runs_against_published_generation(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import minhash_build_store
    from flink_quickstart_spark.operators.maintenance import forget_rows

    docs = _docs(spark)
    path = str(tmp_path / "mh")
    minhash_build_store(docs, path)
    batch = docs.where(F.col("doc_id") < 20)
    audit = forget_rows(
        spark, [{"kind": "minhash", "path": path, "df": batch}], verify=True
    )
    assert audit[0]["status"] == "ok" and audit[0]["residue"] == 0
    assert generation_id(path) == 1
    # the root copy still contains the forgotten ids (it is the frozen
    # generation-0 build) but NO reader resolves to it anymore
    assert _sdd(path, "bands") != os.path.join(path, "bands")


# ---------------------------------------------------- flat-PQ lifecycle


def test_pq_upsert_equals_reencode(spark, tmp_path):
    from flink_quickstart_spark.operators.quantization import (
        load_codebooks,
        pq_build_index,
        pq_encode_df,
        pq_upsert_index,
    )

    emb = _emb(spark)
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    batch = emb.where(F.col("vec_id") % 10 == 0)
    path = str(tmp_path / "pq")
    pq_build_index(corpus, path, m=8, k=16, sample_rows=400)
    pq_upsert_index(spark, path, batch)
    assert generation_id(path) == 1
    books = load_codebooks(spark, path)
    assert _multiset(
        spark.read.parquet(_sdd(path, "codes")), ["vec_id", "codes"]
    ) == _multiset(pq_encode_df(emb, books), ["vec_id", "codes"])


def test_pq_delete_is_bucket_local_and_equals_complement(spark, tmp_path):
    from flink_quickstart_spark.operators.quantization import (
        load_codebooks,
        pq_build_index,
        pq_delete_index,
        pq_encode_df,
    )

    emb = _emb(spark)
    batch = emb.where(F.col("vec_id") < 8)  # few ids → few buckets
    path = str(tmp_path / "pq")
    pq_build_index(emb, path, m=8, k=16, sample_rows=400)
    pre_meta = _file_meta(_sdd(path, "codes"))
    pre_buckets = {os.path.dirname(rel) for rel in pre_meta}

    # delete by IDS ONLY — the flat store's bucket is a function of
    # the id, no vector payload needed
    pq_delete_index(spark, path, batch.select("vec_id"))
    assert generation_id(path) == 1

    books = load_codebooks(spark, path)
    remainder = emb.where(F.col("vec_id") >= 8)
    assert _multiset(
        spark.read.parquet(_sdd(path, "codes")), ["vec_id", "codes"]
    ) == _multiset(pq_encode_df(remainder, books), ["vec_id", "codes"])

    # bucket-locality: untouched _idmod buckets' files in the new
    # generation are the SAME bytes/mtimes (hardlinks of the old
    # generation's files — never rewritten)
    post_meta = _file_meta(_sdd(path, "codes"))
    touched = {
        os.path.dirname(rel)
        for rel in set(pre_meta) ^ set(post_meta)
    } | {
        os.path.dirname(rel)
        for rel in pre_meta
        if rel in post_meta and post_meta[rel] != pre_meta[rel]
    }
    untouched = pre_buckets - touched
    assert untouched  # a real subset scenario
    for rel, meta in pre_meta.items():
        if os.path.dirname(rel) in untouched:
            assert post_meta[rel] == meta


def test_pq_forget_kind_cascades_and_catches_planted_residue(
    spark, tmp_path, monkeypatch
):
    from flink_quickstart_spark.operators import quantization as qz
    from flink_quickstart_spark.operators import maintenance as mnt

    emb = _emb(spark)
    batch = emb.where(F.col("vec_id") < 16)
    path = str(tmp_path / "pq")
    qz.pq_build_index(emb, path, m=8, k=16, sample_rows=400)
    audit = mnt.forget_rows(
        spark, [{"kind": "pq", "path": path, "df": batch}], verify=True
    )
    assert audit[0]["status"] == "ok" and audit[0]["residue"] == 0

    # plant residue: a delete that silently does nothing must be CAUGHT
    qz.pq_build_index(emb, path, m=8, k=16, sample_rows=400)
    monkeypatch.setattr(qz, "pq_delete_index", lambda *a, **k: None)
    with pytest.raises(RuntimeError, match="still holds"):
        mnt.forget_rows(
            spark, [{"kind": "pq", "path": path, "df": batch}], verify=True
        )


def test_compact_pq_index_folds_buckets(spark, tmp_path):
    from flink_quickstart_spark.operators.maintenance import (
        compact_pq_index,
        data_file_counts,
    )
    from flink_quickstart_spark.operators.quantization import (
        pq_build_index,
        pq_upsert_index,
    )

    emb = _emb(spark)
    path = str(tmp_path / "pq")
    pq_build_index(emb.where(F.col("vec_id") % 2 == 0), path, m=8, k=16,
                   sample_rows=400)
    pq_upsert_index(spark, path, emb.where(F.col("vec_id") % 2 == 1))
    assert max(data_file_counts(_sdd(path, "codes")).values()) > 1
    pre = _multiset(
        spark.read.parquet(_sdd(path, "codes")), ["vec_id", "codes"]
    )
    compact_pq_index(spark, path)
    assert all(
        n == 1 for n in data_file_counts(_sdd(path, "codes")).values()
    )
    assert _multiset(
        spark.read.parquet(_sdd(path, "codes")), ["vec_id", "codes"]
    ) == pre


def test_pq_maintenance_on_unbucketed_store_fails_loudly(spark, tmp_path):
    """A pre-r11 store (no meta table / no _idmod layout) must refuse
    maintenance instead of hashing batches into nonexistent buckets."""
    from flink_quickstart_spark.operators.quantization import (
        pq_delete_index,
        pq_encode_df,
        pq_train_codebooks,
    )

    emb = _emb(spark)
    path = str(tmp_path / "pq_old")
    books = pq_train_codebooks(emb, m=8, k=16, sample_rows=400)
    pq_encode_df(emb, books).write.parquet(f"{path}/codes")  # legacy flat
    with pytest.raises(ValueError, match="predates the id-bucketed layout"):
        pq_delete_index(spark, path, emb.select("vec_id").limit(3))


# ------------------------------------------------------------- HLL MV


def test_hll_mv_refresh_within_contract_and_retract_paths(spark, tmp_path):
    from flink_quickstart_spark.operators.matview import (
        mv_build,
        mv_read,
        mv_refresh,
        mv_retract,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    b0 = ev.where(F.col("event_id") % 5 != 0)
    b1 = ev.where(F.col("event_id") % 5 == 0)
    spec = [
        ("count", "*", "n"),
        ("approx_count_distinct", "user_id", "nu_est"),
    ]
    path = str(tmp_path / "mv")
    mv_build(b0, path, ["event_type"], spec, n_buckets=8)
    mv_refresh(spark, path, b1)

    exact = {
        r.event_type: (r.n, r.nu)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("nu"),
        )
        .collect()
    }
    for r in mv_read(spark, path).collect():
        n, nu = exact[r.event_type]
        assert r.n == n
        assert abs(r.nu_est - nu) <= max(1, 0.05 * nu)

    # retraction: sketches cannot subtract → recompute path (source_df)
    with pytest.raises(ValueError, match="cannot forget"):
        mv_retract(spark, path, b1)
    mv_retract(spark, path, b1, source_df=b0)
    exact0 = {
        r.event_type: (r.n, r.nu)
        for r in b0.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("nu"),
        )
        .collect()
    }
    for r in mv_read(spark, path).collect():
        n, nu = exact0[r.event_type]
        assert r.n == n
        assert abs(r.nu_est - nu) <= max(1, 0.05 * nu)


def test_hll_mv_epoch_store_merges_on_read_and_rejects_retract(
    spark, tmp_path
):
    from flink_quickstart_spark.operators.matview import (
        compact_mv,
        mv_build,
        mv_read,
        mv_refresh,
        mv_retract,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    b0 = ev.where(F.col("event_id") % 5 != 0)
    b1 = ev.where(F.col("event_id") % 5 == 0)
    spec = [
        ("count", "*", "n"),
        ("approx_count_distinct", "user_id", "nu_est"),
    ]
    path = str(tmp_path / "mve")
    mv_build(b0, path, ["event_type"], spec, n_buckets=8,
             epoch_partitioned=True)
    mv_refresh(spark, path, b1, epoch=1)
    before = {
        r.event_type: (r.n, r.nu_est) for r in mv_read(spark, path).collect()
    }
    with pytest.raises(ValueError, match="cannot express"):
        mv_retract(spark, path, b1, epoch=2)
    # folding epochs must not change the estimates (sketch union is
    # associative)
    compact_mv(spark, path)
    after = {
        r.event_type: (r.n, r.nu_est) for r in mv_read(spark, path).collect()
    }
    assert after == before


def test_exact_distinct_still_rejected_with_pointer_to_approx(spark, tmp_path):
    from flink_quickstart_spark.operators.matview import mv_build

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    with pytest.raises(ValueError, match="approx_count_distinct"):
        mv_build(
            ev, str(tmp_path / "mv"), ["event_type"],
            [("countdistinct", "user_id", "nu")],
        )
