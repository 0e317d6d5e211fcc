"""Round-9 invariants: incremental maintenance of the persisted stores
(VERDICT r8 #1). The load-bearing property for every store is the same:
an index grown by UPSERT must be indistinguishable from one built from
scratch on the grown corpus — otherwise the append path silently serves
different answers than the rebuild it replaces.

- LSH posting index: upsert == rebuild ROW-IDENTICALLY (projections are
  seed-deterministic, pos assignment is bucket-local), plus the pos-cap
  invariant survives the merge (every bucket still carries a contiguous
  1..|bucket| pos sequence).
- IVF member index: upsert == same-centroid full assignment, and QUERY
  results over the upserted index match the pinned-centroid reference.
- minhash band store: upsert == rebuild on the union; the xx64 fast
  family round-trips through meta.
- Empty batches are no-ops for all three (the r8 empty-input pinning
  discipline).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from flink_quickstart_spark.operators.maintenance import store_data_dir as _sdd


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _multiset(df, cols):
    from collections import Counter

    return Counter(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


# ---------------------------------------------------------------- LSH


def test_lsh_upsert_row_identical_to_rebuild(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_upsert_index,
    )

    emb = _emb(spark)
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    batch = emb.where(F.col("vec_id") % 10 == 0)
    ups, full = str(tmp_path / "ups"), str(tmp_path / "full")
    lsh_build_index(corpus, ups)
    lsh_upsert_index(spark, ups, batch)
    lsh_build_index(emb, full)
    cols = ["vec_id", "band_id", "bucket", "pos"]
    a = _multiset(spark.read.parquet(_sdd(ups, "postings")), cols)
    b = _multiset(spark.read.parquet(_sdd(full, "postings")), cols)
    assert a == b and sum(a.values()) == emb.count() * 4


def test_lsh_upsert_preserves_pos_contiguity(spark, tmp_path):
    """pos must stay a contiguous 1..|bucket| permutation after the
    merge — the property the query-time page-pruning cap relies on."""
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_upsert_index,
    )

    emb = _emb(spark)
    ups = str(tmp_path / "ups")
    lsh_build_index(emb.where(F.col("vec_id") % 10 != 0), ups)
    lsh_upsert_index(spark, ups, emb.where(F.col("vec_id") % 10 == 0))
    bad = (
        spark.read.parquet(_sdd(ups, "postings"))
        .groupBy("band_id", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("nd"),
        )
        .where(
            (F.col("lo") != 1)
            | (F.col("hi") != F.col("n"))
            | (F.col("nd") != F.col("n"))
        )
        .count()
    )
    assert bad == 0


def test_lsh_upsert_empty_batch_is_noop(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_upsert_index,
    )

    emb = _emb(spark)
    ups = str(tmp_path / "ups")
    lsh_build_index(emb, ups)
    before = _multiset(
        spark.read.parquet(_sdd(ups, "postings")),
        ["vec_id", "band_id", "bucket", "pos"],
    )
    lsh_upsert_index(spark, ups, emb.where(F.lit(False)))
    after = _multiset(
        spark.read.parquet(_sdd(ups, "postings")),
        ["vec_id", "band_id", "bucket", "pos"],
    )
    assert before == after


def test_lsh_query_after_upsert_matches_rebuild(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_query_index,
        lsh_upsert_index,
    )

    emb = _emb(spark)
    ups, full = str(tmp_path / "ups"), str(tmp_path / "full")
    lsh_build_index(emb.where(F.col("vec_id") % 10 != 0), ups)
    lsh_upsert_index(spark, ups, emb.where(F.col("vec_id") % 10 == 0))
    lsh_build_index(emb, full)
    q = emb.orderBy("vec_id").limit(16)
    got = {
        (r.query_id, r.nbr_id, r.dist)
        for r in lsh_query_index(spark, ups, q, radius=1.2).collect()
    }
    ref = {
        (r.query_id, r.nbr_id, r.dist)
        for r in lsh_query_index(spark, full, q, radius=1.2).collect()
    }
    assert got == ref


def test_lsh_delete_matches_rebuild_and_drops_empty_buckets(spark, tmp_path):
    """Delete 90% of the corpus — many buckets empty out entirely, the
    case dynamic overwrite alone would silently leave stale (the
    written data carries no rows for an emptied partition, so nothing
    replaces its files); _drop_empty_partitions must remove them."""
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_delete_index,
    )

    emb = _emb(spark)
    keep = emb.where(F.col("vec_id") % 10 == 0)
    dele = emb.where(F.col("vec_id") % 10 != 0)
    a, b = str(tmp_path / "del"), str(tmp_path / "ref")
    lsh_build_index(emb, a)
    lsh_delete_index(spark, a, dele)
    lsh_build_index(keep, b)
    cols = ["vec_id", "band_id", "bucket", "pos"]
    assert _multiset(spark.read.parquet(_sdd(a, "postings")), cols) == _multiset(
        spark.read.parquet(_sdd(b, "postings")), cols
    )


def test_lsh_delete_after_upsert_is_identity(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_delete_index,
        lsh_upsert_index,
    )

    emb = _emb(spark)
    base = emb.where(F.col("vec_id") % 10 == 0)
    batch = emb.where(F.col("vec_id") % 10 == 5)
    p = str(tmp_path / "ident")
    lsh_build_index(base, p)
    cols = ["vec_id", "band_id", "bucket", "pos"]
    before = _multiset(spark.read.parquet(_sdd(p, "postings")), cols)
    lsh_upsert_index(spark, p, batch)
    lsh_delete_index(spark, p, batch)
    assert _multiset(spark.read.parquet(_sdd(p, "postings")), cols) == before


def test_lsh_delete_empty_batch_is_noop(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_delete_index,
    )

    emb = _emb(spark)
    p = str(tmp_path / "noop")
    lsh_build_index(emb, p)
    cols = ["vec_id", "band_id", "bucket", "pos"]
    before = _multiset(spark.read.parquet(_sdd(p, "postings")), cols)
    lsh_delete_index(spark, p, emb.where(F.lit(False)))
    assert _multiset(spark.read.parquet(_sdd(p, "postings")), cols) == before


# ---------------------------------------------------------------- IVF


def test_ivf_upsert_query_matches_pinned_centroid_reference(spark, tmp_path):
    import numpy as np

    from flink_quickstart_spark.operators.similarity import (
        _assign_members_df,
        ivf_build_index,
        ivf_query_index,
        ivf_upsert_index,
    )

    emb = _emb(spark)
    ups, ref = str(tmp_path / "ups"), str(tmp_path / "ref")
    ivf_build_index(emb.where(F.col("vec_id") % 10 != 0), ups, n_clusters=8)
    ivf_upsert_index(spark, ups, emb.where(F.col("vec_id") % 10 == 0))

    cent_rows = spark.read.parquet(_sdd(ups, "centroids")).collect()
    cents = np.zeros((len(cent_rows), len(cent_rows[0].centroid)))
    for r in cent_rows:
        cents[r.cluster_id] = r.centroid
    _assign_members_df(emb, cents, "vec_id", "embedding").write.partitionBy(
        "cluster_id"
    ).parquet(_sdd(ref, "members"))
    spark.read.parquet(_sdd(ups, "centroids")).write.parquet(_sdd(ref, "centroids"))

    q = emb.orderBy("vec_id").limit(16)
    got = sorted(
        (r.query_id, r.nbr_id, r.sim)
        for r in ivf_query_index(spark, ups, q, k=3, n_probe=3).collect()
    )
    want = sorted(
        (r.query_id, r.nbr_id, r.sim)
        for r in ivf_query_index(spark, ref, q, k=3, n_probe=3).collect()
    )
    assert got == want and len(got) == 48


def test_ivf_upsert_empty_batch_is_noop(spark, tmp_path):
    from flink_quickstart_spark.operators.similarity import (
        ivf_build_index,
        ivf_upsert_index,
    )

    emb = _emb(spark)
    ups = str(tmp_path / "ups")
    ivf_build_index(emb, ups, n_clusters=8)
    before = _multiset(
        spark.read.parquet(_sdd(ups, "members")), ["vec_id", "cluster_id"]
    )
    ivf_upsert_index(spark, ups, emb.where(F.lit(False)))
    after = _multiset(
        spark.read.parquet(_sdd(ups, "members")), ["vec_id", "cluster_id"]
    )
    assert before == after


def test_ivf_delete_matches_same_centroid_assignment(spark, tmp_path):
    import numpy as np

    from flink_quickstart_spark.operators.similarity import (
        _assign_members_df,
        ivf_build_index,
        ivf_delete_index,
    )

    emb = _emb(spark)
    keep = emb.where(F.col("vec_id") % 10 == 0)
    dele = emb.where(F.col("vec_id") % 10 != 0)
    p = str(tmp_path / "ivf")
    ivf_build_index(emb, p, n_clusters=8)
    cent_rows = spark.read.parquet(_sdd(p, "centroids")).collect()
    cents = np.zeros((len(cent_rows), len(cent_rows[0].centroid)))
    for r in cent_rows:
        cents[r.cluster_id] = r.centroid
    ivf_delete_index(spark, p, dele)
    from collections import Counter

    got = _multiset(spark.read.parquet(_sdd(p, "members")), ["vec_id", "cluster_id"])
    want = Counter(
        (r.vec_id, r.cluster_id)
        for r in _assign_members_df(keep, cents, "vec_id", "embedding").collect()
    )
    assert got == want


# ------------------------------------------------------------ minhash


def test_minhash_store_upsert_row_identical_to_rebuild(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )

    docs = _docs(spark)
    ups, full = str(tmp_path / "ups"), str(tmp_path / "full")
    minhash_build_store(docs.where(F.col("doc_id") % 10 != 0), ups)
    minhash_upsert_store(spark, ups, docs.where(F.col("doc_id") % 10 == 0))
    minhash_build_store(docs, full)
    cols = ["doc_id", "band_id", "sig"]
    assert _multiset(spark.read.parquet(_sdd(ups, "bands")), cols) == _multiset(
        spark.read.parquet(_sdd(full, "bands")), cols
    )


def test_minhash_delete_matches_rebuild(spark, tmp_path):
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_delete_store,
    )

    docs = _docs(spark)
    keep = docs.where(F.col("doc_id") % 10 == 0)
    dele = docs.where(F.col("doc_id") % 10 != 0)
    a, b = str(tmp_path / "del"), str(tmp_path / "ref")
    minhash_build_store(docs, a)
    minhash_delete_store(spark, a, dele)
    minhash_build_store(keep, b)
    cols = ["doc_id", "band_id", "sig"]
    assert _multiset(spark.read.parquet(_sdd(a, "bands")), cols) == _multiset(
        spark.read.parquet(_sdd(b, "bands")), cols
    )


def test_minhash_store_meta_pins_hash_family(spark, tmp_path):
    """meta round-trips the family; upsert hashes with the STORE's
    family even when it differs from the current default."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )

    docs = _docs(spark)
    ups, full = str(tmp_path / "md5"), str(tmp_path / "md5full")
    minhash_build_store(
        docs.where(F.col("doc_id") % 10 != 0), ups, hash_family="md5_60"
    )
    meta = spark.read.parquet(_sdd(ups, "meta")).collect()[0]
    assert meta.hash_family == "md5_60"
    minhash_upsert_store(spark, ups, docs.where(F.col("doc_id") % 10 == 0))
    minhash_build_store(docs, full, hash_family="md5_60")
    cols = ["doc_id", "band_id", "sig"]
    assert _multiset(spark.read.parquet(_sdd(ups, "bands")), cols) == _multiset(
        spark.read.parquet(_sdd(full, "bands")), cols
    )


def test_minhash_band_rows_rejects_unknown_family(spark):
    from flink_quickstart_spark.operators.dedup import _minhash_band_rows

    with pytest.raises(ValueError, match="hash_family"):
        _minhash_band_rows(_docs(spark), "doc_id", "text", 16, 3, "nope")


def test_xx64_ingest_matches_md5_ingest_results(spark, tmp_path):
    """The hash family changes CANDIDATE generation, never the exact-
    verified OUTPUT: both stores must flag the same pairs with the same
    exact Jaccard values (miss probability (1-j)^16 is negligible at
    this scale and seed-free by construction)."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_ingest_neardup,
    )

    docs = _docs(spark)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    out = {}
    for fam in ("xx64", "md5_60"):
        p = str(tmp_path / fam)
        minhash_build_store(corpus, p, hash_family=fam)
        out[fam] = {
            (r.corpus_id, r.new_id, r.jaccard)
            for r in minhash_ingest_neardup(
                spark, p, batch, corpus, threshold=0.5
            ).collect()
        }
    assert out["xx64"] == out["md5_60"]


# ----------------------------------------------------------- compaction


def test_compaction_preserves_rows_and_collapses_files(spark, tmp_path):
    """After several upsert days each sig bucket holds one file per
    touching batch; compaction must collapse to ONE sorted file per
    partition with the row multiset bit-identical."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )
    from flink_quickstart_spark.operators.maintenance import (
        compact_minhash_store,
        data_file_counts,
    )

    docs = _docs(spark)
    p = str(tmp_path / "mh")
    minhash_build_store(docs.where(F.col("doc_id") % 10 != 0), p)
    for m in (0, 3, 6):
        batch = docs.where(
            (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 30 == m)
        ).withColumn("doc_id", F.col("doc_id") + 1_000_000 * (m + 1))
        minhash_upsert_store(spark, p, batch)
    cols = ["doc_id", "band_id", "sig"]
    before = _multiset(spark.read.parquet(_sdd(p, "bands")), cols)
    assert max(data_file_counts(_sdd(p, "bands")).values()) > 1
    stats = compact_minhash_store(spark, p)
    after = _multiset(spark.read.parquet(_sdd(p, "bands")), cols)
    assert after == before
    assert stats["files_after"] < stats["files_before"]
    assert all(n == 1 for n in data_file_counts(_sdd(p, "bands")).values())


def test_lsh_compaction_preserves_query_results(spark, tmp_path):
    """Compacting the posting index must not change radius-search
    results (pos stays the page-pruning sort key within each file)."""
    from flink_quickstart_spark.operators.maintenance import (
        compact_lsh_index,
        data_file_counts,
    )
    from flink_quickstart_spark.operators.similarity import (
        lsh_build_index,
        lsh_query_index,
        lsh_upsert_index,
    )

    emb = _emb(spark)
    p = str(tmp_path / "lsh")
    lsh_build_index(emb.where(F.col("vec_id") % 10 != 0), p)
    lsh_upsert_index(spark, p, emb.where(F.col("vec_id") % 10 == 0))
    q = emb.orderBy("vec_id").limit(16)
    before = {
        (r.query_id, r.nbr_id, r.dist)
        for r in lsh_query_index(spark, p, q, radius=1.2).collect()
    }
    compact_lsh_index(spark, p)
    after = {
        (r.query_id, r.nbr_id, r.dist)
        for r in lsh_query_index(spark, p, q, radius=1.2).collect()
    }
    assert after == before
    assert all(n == 1 for n in data_file_counts(_sdd(p, "postings")).values())
