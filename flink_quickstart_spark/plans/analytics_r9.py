"""Round-9 additions: incremental maintenance of the persisted stores.

VERDICT r8 #1: every persisted index (LSH postings, IVF members,
minhash band store) handled source change by FULL REBUILD — the one
lifecycle shape a 100 TB deployment can never afford for a 0.1% daily
ingest. These keys register the APPEND path for each store and pin the
invariant that matters: an index grown by upsert is indistinguishable
from one built from scratch on the grown corpus (row-identical for the
order-free stores; query-identical for IVF, whose centroids stay fixed
between periodic retrains by design).

Each key's comparison is ONE symmetric-difference aggregate (union with
±1 source tags, groupBy all columns, assert every multiset balance is
zero) — one shuffle, no exceptAll double-scan, and the boolean collapses
to a driver-sized single row. The builds themselves are
fingerprint-guarded as single units (build + upsert inside one
_ensure_index closure), so re-runs of the key reuse both stores instead
of re-upserting into an already-upserted index.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, functions as F

from flink_quickstart_spark.operators.maintenance import (
    read_store as _rs,
    store_data_dir as _sdd,
)
from flink_quickstart_spark.plans.registry import register, tables


def _scratch(*parts: str) -> str:
    return os.path.join(tempfile.gettempdir(), "fqs_scratch", *parts)


def _multiset_equal(
    a: DataFrame, b: DataFrame, cols: list[str], n_alias: str, eq_alias: str
) -> DataFrame:
    """(count(a), multiset(a) == multiset(b)) as one aggregate row:
    tag rows ±1, group by every column, any non-zero balance means the
    multisets differ. One shuffle on the row key; output is one row."""
    tagged = a.select(*cols).withColumn("_src", F.lit(1)).unionByName(
        b.select(*cols).withColumn("_src", F.lit(-1))
    )
    per_row = tagged.groupBy(*cols).agg(
        F.sum("_src").alias("_bal"),
        F.sum(F.when(F.col("_src") == 1, 1).otherwise(0)).alias("_na"),
    )
    return per_row.agg(
        F.sum("_na").cast("bigint").alias(n_alias),
        (F.coalesce(F.sum(F.abs("_bal")), F.lit(0)) == 0).alias(eq_alias),
    )


@register(
    "q_llm_lsh_upsert",
    # Deterministic invariant oracle: the upserted index must be
    # ROW-IDENTICAL to a from-scratch build on the grown corpus —
    # projections are seed-deterministic and pos assignment is
    # bucket-local and order-free (operators/similarity._assign_pos),
    # so any divergence (dropped batch row, stale pos, double-upsert)
    # flips the boolean or the posting count (num_tables=4 per vector).
    oracle="""
    SELECT CAST(4 * count(*) AS BIGINT) AS n_postings,
           TRUE AS upsert_eq_rebuild
    FROM embeddings
    """,
    tags=("batch", "llm", "similarity", "index-maintenance"),
)
def q_llm_lsh_upsert(spark, sf_dir):
    """K4e (r9): INCREMENTAL LSH index maintenance — ingest a new-vector
    batch (vec_id % 10 = 0) into a persisted posting index built from
    the rest of the corpus, via operators/similarity.lsh_upsert_index:
    band the batch with the STORED projections, re-rank only the
    affected (band, bucket) partitions (static prune → per-bucket pos
    reassignment → dynamic partition overwrite), never touching the
    other buckets. Upsert cost ∝ batch × tables × touched-bucket
    occupancy — independent of corpus size (probed flat in
    SCALE_CURVE_r9 ann_lsh_upsert_fixed). The key then proves the 100 TB
    lifecycle claim AS the result: the upserted index is row-identical
    to a full rebuild on corpus ∪ batch (the rebuild here is the
    oracle's truth machinery, not the production path)."""
    from flink_quickstart_spark.operators.similarity import (
        _ensure_index,
        lsh_build_index,
        lsh_upsert_index,
    )

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "embeddings.parquet")
    corpus = t.embeddings.where(F.col("vec_id") % 10 != 0)
    batch = t.embeddings.where(F.col("vec_id") % 10 == 0)
    ups = _scratch("lsh_index_upsert", sf_name)
    full = _scratch("lsh_index_full", sf_name)
    # one guarded unit: base build + upsert (re-runs reuse, never
    # double-upsert); marker written only after BOTH steps succeed
    _ensure_index(
        lambda: (
            lsh_build_index(corpus, ups),
            lsh_upsert_index(spark, ups, batch),
        ),
        ups,
        src,
        "projections",
    )
    _ensure_index(lambda: lsh_build_index(t.embeddings, full), full, src, "projections")
    cols = ["vec_id", "band_id", "bucket", "pos"]
    return _multiset_equal(
        _rs(spark, ups, "postings"),
        _rs(spark, full, "postings"),
        cols,
        "n_postings",
        "upsert_eq_rebuild",
    )


@register(
    "q_llm_lsh_delete",
    # Invariant oracle: deleting the batch from a full-corpus index
    # must leave an index ROW-IDENTICAL to building from the remainder
    # — including dropping any (band, bucket) partition the deletion
    # emptied (dynamic overwrite alone would keep its stale files; the
    # count law would catch the leak). 4 postings per surviving vector.
    oracle="""
    SELECT CAST(4 * count(*) AS BIGINT) AS n_postings,
           TRUE AS delete_eq_rebuild
    FROM embeddings WHERE vec_id % 10 <> 0
    """,
    tags=("batch", "llm", "similarity", "index-maintenance"),
)
def q_llm_lsh_delete(spark, sf_dir):
    """K4e (r9, deletion side): retention / right-to-erasure against the
    persisted LSH index — operators/similarity.lsh_delete_index bands
    the deletion batch with the STORED projections (deterministic, so
    its rows live in exactly those buckets), anti-joins the ids out of
    ONLY the affected partitions, re-ranks survivors bucket-locally,
    dynamically overwrites, and DROPS partitions left empty. Cost ∝
    batch × touched-bucket occupancy — a 100 TB index never rescans for
    a deletion request. IVF and minhash deletes share the shape and are
    pinned in tests/test_invariants_r9.py (incl. delete ∘ upsert ==
    identity)."""
    from flink_quickstart_spark.operators.similarity import (
        _ensure_index,
        lsh_build_index,
        lsh_delete_index,
    )

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "embeddings.parquet")
    batch = t.embeddings.where(F.col("vec_id") % 10 == 0)
    remainder = t.embeddings.where(F.col("vec_id") % 10 != 0)
    deleted = _scratch("lsh_index_del", sf_name)
    ref = _scratch("lsh_index_del_ref", sf_name)
    _ensure_index(
        lambda: (
            lsh_build_index(t.embeddings, deleted),
            lsh_delete_index(spark, deleted, batch),
        ),
        deleted,
        src,
        "projections",
    )
    _ensure_index(lambda: lsh_build_index(remainder, ref), ref, src, "projections")
    cols = ["vec_id", "band_id", "bucket", "pos"]
    return _multiset_equal(
        _rs(spark, deleted, "postings"),
        _rs(spark, ref, "postings"),
        cols,
        "n_postings",
        "delete_eq_rebuild",
    )


@register(
    "q_llm_ivf_upsert",
    # Invariant oracle: members after (build(corpus) + upsert(batch))
    # == assigning the FULL corpus against the SAME stored centroids —
    # assignment is deterministic per-vector (argmax over the fixed
    # centroid table), so the member multisets must match exactly.
    # Centroid retraining is a separate periodic operation by design
    # (FAISS add vs train), so the comparison pins centroids.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_members,
           TRUE AS upsert_eq_assign
    FROM embeddings
    """,
    tags=("batch", "llm", "similarity", "index-maintenance"),
)
def q_llm_ivf_upsert(spark, sf_dir):
    """K4f (r9): INCREMENTAL IVF index maintenance — assign a new-vector
    batch against the STORED centroid table and append to the member
    partitions (operators/similarity.ivf_upsert_index; the FAISS `add`
    lifecycle: inserts are cluster-local appends, centroids retrain
    periodically, partition quality degrades gracefully with the
    un-retrained fraction). Upsert cost ∝ batch (one BLAS assignment
    pass; corpus members never read). The invariant result: the grown
    member table is row-identical to assigning the full corpus against
    the same centroids, so queries against the upserted index return
    exactly what a same-centroid rebuild would return
    (query-equivalence additionally pinned in
    tests/test_invariants_r9.py)."""
    from flink_quickstart_spark.operators.similarity import (
        _assign_members_df,
        _ensure_index,
        ivf_build_index,
        ivf_upsert_index,
    )
    import numpy as np

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "embeddings.parquet")
    corpus = t.embeddings.where(F.col("vec_id") % 10 != 0)
    batch = t.embeddings.where(F.col("vec_id") % 10 == 0)
    ups = _scratch("ivf_index_upsert", sf_name)
    ref = _scratch("ivf_index_refassign", sf_name)
    _ensure_index(
        lambda: (
            ivf_build_index(corpus, ups, n_clusters=16),
            ivf_upsert_index(spark, ups, batch),
        ),
        ups,
        src,
        "centroids",
    )

    def build_ref() -> None:
        # full-corpus assignment against the UPSERTED index's centroids
        # (the pinned-centroid rebuild the invariant compares against)
        from flink_quickstart_spark.operators.maintenance import (
            read_store_rows,
        )

        cent_rows = read_store_rows(ups, "centroids")
        cents = np.zeros((len(cent_rows), len(cent_rows[0].centroid)))
        for r in cent_rows:
            cents[r.cluster_id] = r.centroid
        (
            _assign_members_df(t.embeddings, cents, "vec_id", "embedding")
            .write.mode("overwrite")
            .partitionBy("cluster_id")
            .parquet(f"{ref}/members")
        )
        _rs(spark, ups, "centroids").write.mode("overwrite").parquet(
            f"{ref}/centroids"
        )

    _ensure_index(build_ref, ref, src, "centroids")
    cols = ["vec_id", "cluster_id"]
    return _multiset_equal(
        _rs(spark, ups, "members"),
        _rs(spark, ref, "members"),
        cols,
        "n_members",
        "upsert_eq_assign",
    )


@register(
    "q_llm_store_upsert",
    # Invariant oracle: the band store after (build(corpus) +
    # upsert(batch)) == build(corpus ∪ batch) — signatures are
    # per-document and the bands table is an unordered set partitioned
    # by a pure function of sig, so the multisets must match exactly.
    # Band-row law: num_hashes (16) rows per document with ≥ 1 shingle
    # (≥ shingle_n words under single-space split).
    oracle="""
    SELECT CAST(16 * count(*) AS BIGINT) AS n_band_rows,
           TRUE AS upsert_eq_rebuild
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
    """,
    tags=("batch", "llm", "dedup", "index-maintenance"),
)
def q_llm_store_upsert(spark, sf_dir):
    """K2g (r9): INCREMENTAL signature-store maintenance — the admission
    side of the ingest-dedup lifecycle. Once a batch clears the
    near-dup gate (q_llm_ingest_neardup), its minhash band rows join
    the persisted store (operators/dedup.minhash_upsert_store: hash the
    batch with the store's pinned family from ``meta``, append to the
    sig-bucket partitions) so every LATER batch dedups against it too —
    the store is never rebuilt. Upsert cost ∝ batch; corpus signatures
    never read. Invariant result: the grown store is row-identical to a
    from-scratch build on corpus ∪ batch. The streaming face
    (admission gate micro-batch == batch-incremental) is pinned in
    tests/test_streaming_r9.py."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )
    from flink_quickstart_spark.operators.similarity import _ensure_index

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "documents.parquet")
    corpus = t.documents.where(F.col("doc_id") % 10 != 0)
    batch = t.documents.where(F.col("doc_id") % 10 == 0)
    ups = _scratch("minhash_store_upsert", sf_name)
    full = _scratch("minhash_store_full", sf_name)
    _ensure_index(
        lambda: (
            minhash_build_store(corpus, ups),
            minhash_upsert_store(spark, ups, batch),
        ),
        ups,
        src,
        "meta",
    )
    _ensure_index(lambda: minhash_build_store(t.documents, full), full, src, "meta")
    cols = ["doc_id", "band_id", "sig"]
    return _multiset_equal(
        _rs(spark, ups, "bands"),
        _rs(spark, full, "bands"),
        cols,
        "n_band_rows",
        "upsert_eq_rebuild",
    )


@register(
    "q_llm_store_compact",
    # Invariant oracle: compaction is OPTIMIZE — it must preserve the
    # band-row multiset exactly (same count law as the upsert key) while
    # collapsing each partition's accumulated append files to one; the
    # file-count assertion is filesystem metadata, graded as a boolean
    # computed in the builder (bounded os.walk, no data pass).
    oracle="""
    SELECT CAST(16 * count(*) AS BIGINT) AS n_band_rows,
           TRUE AS compact_eq_precompact,
           TRUE AS one_file_per_partition
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3
    """,
    tags=("batch", "llm", "dedup", "index-maintenance"),
)
def q_llm_store_compact(spark, sf_dir):
    """K2g (r9, OPTIMIZE side): small-file compaction of the signature
    store after ingest-day upserts — every append adds a file per
    touched sig bucket, and at 100 TB the FILE count (open/footer cost
    per scan) degrades probes long before data size does. The op
    (operators/maintenance.compact_minhash_store) rewrites each
    ``_hmod`` partition as one (band_id, sig)-sorted file via a single
    hash shuffle on the partition key; rows, partitions, and probe
    results are unchanged. The key stages build(corpus) + upsert(batch)
    + compact as one fingerprint-guarded unit, then proves multiset
    identity against the store that never compacted (the upsert key's
    own store path) plus the one-file-per-partition law."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )
    from flink_quickstart_spark.operators.maintenance import (
        compact_minhash_store,
        data_file_counts,
    )
    from flink_quickstart_spark.operators.similarity import _ensure_index

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "documents.parquet")
    corpus = t.documents.where(F.col("doc_id") % 10 != 0)
    batch = t.documents.where(F.col("doc_id") % 10 == 0)
    compacted = _scratch("minhash_store_compact", sf_name)
    full = _scratch("minhash_store_full", sf_name)
    _ensure_index(
        lambda: (
            minhash_build_store(corpus, compacted),
            minhash_upsert_store(spark, compacted, batch),
            compact_minhash_store(spark, compacted),
        ),
        compacted,
        src,
        "meta",
    )
    _ensure_index(lambda: minhash_build_store(t.documents, full), full, src, "meta")
    files_ok = all(
        n == 1 for n in data_file_counts(_sdd(compacted, "bands")).values()
    )
    cols = ["doc_id", "band_id", "sig"]
    return _multiset_equal(
        _rs(spark, compacted, "bands"),
        _rs(spark, full, "bands"),
        cols,
        "n_band_rows",
        "compact_eq_precompact",
    ).withColumn("one_file_per_partition", F.lit(bool(files_ok)))
