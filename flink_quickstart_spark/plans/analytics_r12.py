"""Round-12 additions: the manifest-commit protocol as driver-checked
results.

VERDICT r11 ranked object-store portability of the generation-swap
protocol as the top remaining 100 TB realism gap, plus harder
retention/concurrency evidence. The code landed in
operators/maintenance.py (per-generation manifests, the pluggable
commit backend seam, GC pins, the typed StoreSnapshotExpired) with the
invariants pinned in tests/test_manifest_r12.py and
tests/test_concurrency_r12.py. This module promotes the two
user-visible contracts to correctness-gated driver keys, the same way
r11 promoted the generation swap itself (q_store_snapshot_isolation):

- q_store_pinned_snapshot — a reader that PINS its generation survives
  three publishes (keep-2 alone would have collected it), and after
  unpin + one more publish the stale snapshot fails with the TYPED
  expiry error, not an arbitrary FileNotFoundError.
- q_store_manifest_commit — the full maintenance lifecycle runs through
  the reference OBJECT-STORE backend (put-if-absent versioned pointer
  keys, byte-copy clones — no rename, no hardlinks), and readers
  resolve the manifest's explicit file list: a planted alien parquet
  file in the live data directory is invisible to manifest readers
  while a raw directory-listing read sees it.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
from pyspark.sql import functions as F

from flink_quickstart_spark.operators.maintenance import read_store as _rs
from flink_quickstart_spark.operators.maintenance import (
    read_store_count as _rsc,
)
from flink_quickstart_spark.plans.analytics_r9 import (
    _multiset_equal,
    _scratch,
)
from flink_quickstart_spark.plans.registry import register, tables


# OPQ's demonstration OPERATING POINT (K4j): dsub = dim/m = 16 raw
# dims per subspace at 8 bits each — the coarse regime FAISS runs PQ
# in (SIFT128/m=8, dsub=16) and the one where a learned rotation has
# room to matter. At the flat store's fine default (dsub=4, k=256 =
# 2 bits/dim) rotation measurably buys ~nothing on this data — the
# codebooks already resolve every direction — so the OPQ keys pin the
# honest claim at the operating point where the technique earns its
# extra artifact, not a vacuous one at the default.
OPQ_M, OPQ_K = 4, 256


def _correlated_corpus(embeddings):
    """A deterministic ANISOTROPIC corpus derived from the uniform
    synthetic embeddings (on which any rotation is provably useless —
    isotropy is the quantizer's adversarial case but the rotation's
    degenerate one): the second half of each vector is rewritten as
    first_half + 0.1 × second_half, giving strong cross-half
    correlation in the RAW coordinate order. A contiguous subspace
    split then quantizes the two correlated halves independently
    (cross-subspace structure is invisible to per-subspace k-means by
    construction), while OPQ's eigenvalue-balanced rotation folds the
    redundancy into every subspace — the structure real embedding
    matrices exhibit (correlated features scattered across the vector,
    'rogue' high-variance dims). Pure column expressions: no RNG, no
    UDF, same rows every run and every engine."""
    e = F.col("embedding")
    h1 = F.slice(e, 1, 32)
    h2 = F.slice(e, 33, 32)
    return embeddings.select(
        "vec_id",
        F.concat(h1, F.zip_with(h1, h2, lambda a, b: a + 0.1 * b)).alias(
            "embedding"
        ),
    )


def _mean_recon_cos(spark, corpus, path):
    """Mean cosine(original vector, decode(codes)) over the whole
    corpus — the reconstruction-quality functional both PQ contract
    keys grade; computed JVM-side (zip_with/aggregate, codegen)."""
    from flink_quickstart_spark.operators.quantization import pq_decode_df

    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    e = F.col("embedding").cast("array<double>")
    r = F.col("recon")
    return (
        corpus.select("vec_id", e.alias("embedding"))
        .join(pq_decode_df(spark, path), "vec_id")
        .select(
            (
                dot(F.col("embedding"), r)
                / (
                    F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(dot(r, r))
                )
            ).alias("_cos")
        )
        .agg(F.avg("_cos").alias("mean_cos"))
        .collect()[0]
        .mean_cos
    )


@register(
    "q_store_pinned_snapshot",
    # Retention contract (VERDICT r11 #3): keep-2 GC respects reader
    # pins — the pinned snapshot's count is unchanged across three
    # publishes — and expiry after unpin is the TYPED failure. The
    # count law (16 band rows per document) pins the final store.
    oracle="""
    SELECT CAST(16 * count(*) AS BIGINT) AS n_band_rows_full,
           TRUE AS pin_survived_3_publishes,
           TRUE AS expiry_is_typed
    FROM documents
    """,
    tags=("batch", "llm", "index-maintenance", "isolation"),
)
def q_store_pinned_snapshot(spark, sf_dir):
    """ops-ext (r12): reader-PINNED generation retention beyond keep-2.
    A long-running batch read over a serving store calls
    pin_generation → open_store_snapshot → read → unpin; the
    publish-time GC skips pinned generations, so the snapshot survives
    ANY number of mutations instead of the default two. This key:

    - builds a signature store from 60% of documents, upserts 10%
      (generation 1), pins it, and opens a snapshot;
    - publishes three more generations (two upserts + the remaining
      10%); unpinned, generation 1 would now be GC'd (keep-2 retains
      only {3, 4});
    - verifies the pinned snapshot still counts EXACTLY its
      generation's rows (survival), then unpins and publishes once
      more (compaction), after which the snapshot fails with the typed
      StoreSnapshotExpired naming the keep-2/pin contract;
    - returns the final store's band-row count (the 16-per-doc law
      over ALL documents — every batch arrived exactly once).

    Like q_store_snapshot_isolation the store is rebuilt each run: the
    retention protocol IS the subject."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )
    from flink_quickstart_spark.operators.maintenance import (
        StoreSnapshotExpired,
        compact_minhash_store,
        open_store_snapshot,
        pin_generation,
        read_store_count,
        unpin_generation,
    )

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    docs = t.documents
    b0 = docs.where(F.col("doc_id") % 10 >= 4)  # 60%
    b1 = docs.where(F.col("doc_id") % 10 == 0)
    b2 = docs.where(F.col("doc_id") % 10 == 1)
    b3 = docs.where(F.col("doc_id") % 10 == 2)
    b4 = docs.where(F.col("doc_id") % 10 == 3)
    store = _scratch("pinned_snapshot", sf_name)
    shutil.rmtree(store, ignore_errors=True)

    minhash_build_store(b0, store)  # generation 0
    minhash_upsert_store(spark, store, b1)  # generation 1
    token = pin_generation(store)  # pins generation 1
    snap = open_store_snapshot(store)
    # r13 (§1/§5): protocol-check counts come from footer metadata
    # over the snapshot's manifest file list — same resolution + expiry
    # semantics, no distributed scan per check (StoreSnapshot.count)
    n_pinned = snap.count("bands")

    minhash_upsert_store(spark, store, b2)  # generation 2
    minhash_upsert_store(spark, store, b3)  # generation 3
    minhash_upsert_store(spark, store, b4)  # generation 4 — without the
    # pin, generation 1 would have been collected at this publish
    survived = bool(snap.count("bands") == n_pinned) and bool(
        n_pinned == 16 * (b0.count() + b1.count())
    )

    unpin_generation(store, token)
    compact_minhash_store(spark, store)  # generation 5 → GC reclaims 1
    try:
        snap.read(spark, "bands")
        typed = False  # a stale snapshot silently readable = failure
    except StoreSnapshotExpired:
        typed = True

    n_full = read_store_count(store, "bands")
    return spark.createDataFrame(
        [(int(n_full), survived, typed)],
        "n_band_rows_full bigint, pin_survived_3_publishes boolean,"
        " expiry_is_typed boolean",
    )


@register(
    "q_store_manifest_commit",
    # Portability contract (VERDICT r11 #1): the generation protocol
    # commits through the pluggable backend with OBJECT-STORE
    # semantics (put-if-absent versioned keys, no rename/hardlinks),
    # and reads resolve the manifest's explicit file list — an alien
    # data file is invisible. Count law: 16 band rows per document.
    oracle="""
    SELECT CAST(16 * count(*) AS BIGINT) AS n_band_rows_full,
           TRUE AS alien_file_invisible,
           TRUE AS versioned_pointer_commits
    FROM documents
    """,
    tags=("batch", "llm", "index-maintenance", "isolation"),
)
def q_store_manifest_commit(spark, sf_dir):
    """ops-ext (r12): MANIFEST-based generation commits on the
    object-store backend. Every commit writes an explicit per-
    generation manifest (the data-file LIST); readers
    (operators/maintenance.read_store) plan from that list, never from
    a directory walk — on a real object store that is both the only
    read consistent with the commit (LIST is eventually consistent;
    the manifest is the snapshot that was actually published) and one
    GET instead of a recursive LIST. This key runs
    build → upsert → upsert through VersionedPointerCommitBackend (the
    package's reference object-store semantics: pointer commits are
    put-if-absent generation-versioned keys — the local twin of S3
    ``If-None-Match: *`` — and clones are byte copies; no rename, no
    hardlinks), then plants an ALIEN parquet file (a byte-copy of a
    real data file under an unlisted name) inside the live
    generation's data directory:

    - the manifest-resolved read counts exactly 16 × all documents
      (the alien rows are invisible — a directory-listing read
      double-counts them, and the key checks that too: the alien IS
      on disk and IS readable, just not part of the commit);
    - the pointer state is versioned keys only (no ``_current`` file
      ever written), and the generation advanced to 2.
    """
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )
    from flink_quickstart_spark.operators.maintenance import (
        VersionedPointerCommitBackend,
        current_store_root,
        generation_id,
        read_store_count,
        set_commit_backend,
    )

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    docs = t.documents
    b0 = docs.where(F.col("doc_id") % 10 >= 2)  # 80%
    b1 = docs.where(F.col("doc_id") % 10 == 0)
    b2 = docs.where(F.col("doc_id") % 10 == 1)
    store = _scratch("manifest_commit", sf_name)
    shutil.rmtree(store, ignore_errors=True)

    prev = set_commit_backend(VersionedPointerCommitBackend())
    try:
        minhash_build_store(b0, store)  # generation 0
        minhash_upsert_store(spark, store, b1)  # generation 1
        minhash_upsert_store(spark, store, b2)  # generation 2

        # plant an alien parquet file inside a live partition dir:
        # on disk, readable, but named by no manifest
        bands_dir = os.path.join(current_store_root(store), "bands")
        a_src = a_dst = None
        for root, _dirs, files in os.walk(bands_dir):
            for f in files:
                if f.endswith(".parquet"):
                    a_src = os.path.join(root, f)
                    a_dst = os.path.join(root, "part-alien.parquet")
                    break
            if a_src:
                break
        shutil.copyfile(a_src, a_dst)
        alien_rows = spark.read.parquet(a_dst).count()

        n_docs = docs.count()
        # r13 (§1/§5): manifest-resolved count from footer metadata;
        # the CONTRAST reads (raw file / directory listing) stay Spark
        n_manifest = read_store_count(store, "bands")
        n_listing = spark.read.parquet(bands_dir).count()
        alien_invisible = bool(n_manifest == 16 * n_docs) and bool(
            n_listing == n_manifest + alien_rows
        )
        versioned = (
            bool(generation_id(store) == 2)
            and not os.path.exists(os.path.join(store, "_current"))
            and os.path.exists(os.path.join(store, "_current.v000002"))
        )
    finally:
        set_commit_backend(prev)
    return spark.createDataFrame(
        [(int(n_manifest), alien_invisible, versioned)],
        "n_band_rows_full bigint, alien_file_invisible boolean,"
        " versioned_pointer_commits boolean",
    )


@register(
    "q_llm_opq_encode",
    # OPQ contract (K4j): on the correlated corpus at the coarse
    # operating point, (1) encode is bit-deterministic against the
    # stored rotation+codebooks, (2) the learned rotation is orthogonal
    # to machine precision (it preserves norms/inner products, so ADC
    # still approximates the ORIGINAL cosine), and (3) OPQ's mean
    # reconstruction cosine strictly beats plain PQ's at the SAME bit
    # budget on the SAME data — the whole point of learning R.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           TRUE AS encode_deterministic,
           TRUE AS rotation_orthogonal,
           TRUE AS opq_beats_plain
    FROM embeddings
    """,
    tags=("batch", "llm", "similarity", "compression"),
)
def q_llm_opq_encode(spark, sf_dir):
    """K4j (r12): OPTIMIZED product quantization — learn an orthogonal
    rotation R (alternating eigenvalue-balanced-PCA init + k-means +
    orthogonal-Procrustes, Ge et al. CVPR 2014; FAISS ``OPQMatrix``)
    so PQ quantizes ``x @ R`` instead of raw coordinates
    (operators/quantization.opq_train / pq_build_index(opq=True)).
    The rotation is a store artifact like the codebooks: upsert /
    delete / compact / forget and the ADC query path all resolve it
    from the store, so an OPQ store lives the exact same lifecycle as
    a plain one. This key builds BOTH stores on the same correlated
    corpus and pins determinism, orthogonality, and the
    reconstruction win that justifies the extra artifact."""
    from flink_quickstart_spark.operators.quantization import (
        load_codebooks,
        load_rotation,
        pq_build_index,
        pq_encode_df,
    )
    from flink_quickstart_spark.operators.similarity import _ensure_index

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "embeddings.parquet")
    corpus = _correlated_corpus(t.embeddings)
    opq_path = _scratch("opq_index", sf_name)
    plain_path = _scratch("opq_plain_ref", sf_name)
    _ensure_index(
        lambda: pq_build_index(corpus, opq_path, m=OPQ_M, k=OPQ_K, opq=True),
        opq_path, src, "codebooks",
    )
    _ensure_index(
        lambda: pq_build_index(corpus, plain_path, m=OPQ_M, k=OPQ_K),
        plain_path, src, "codebooks",
    )
    rot = load_rotation(spark, opq_path)
    orthogonal = bool(
        np.abs(rot @ rot.T - np.eye(len(rot))).max() < 1e-8
    )
    books = load_codebooks(spark, opq_path)
    enc_eq = _multiset_equal(
        pq_encode_df(corpus, books, rotation=rot),
        _rs(spark, opq_path, "codes"),
        ["vec_id", "codes"],
        "n_vecs",
        "encode_deterministic",
    )
    cos_opq = _mean_recon_cos(spark, corpus, opq_path)
    cos_plain = _mean_recon_cos(spark, corpus, plain_path)
    return (
        enc_eq.withColumn("rotation_orthogonal", F.lit(orthogonal))
        .withColumn(
            "opq_beats_plain", F.lit(bool(cos_opq > cos_plain))
        )
        .select(
            "n_vecs", "encode_deterministic", "rotation_orthogonal",
            "opq_beats_plain",
        )
    )


@register(
    "q_llm_opq_query",
    # Recall contract (the q_llm_pq_query grading, now through the
    # rotated ADC path): OPQ ADC top-32 shortlist + exact re-rank must
    # recover >= 0.9 of the exact brute-force top-3 on the correlated
    # corpus — queries are rotated at plan time, codes are scanned with
    # the same numpy-gather LUT kernel, and the re-rank tier works on
    # UNROTATED vectors (R preserves inner products, so the shortlist
    # transfers).
    oracle="""
    SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
           TRUE AS recall_ok
    FROM embeddings
    """,
    tags=("batch", "llm", "similarity", "approx", "compression"),
)
def q_llm_opq_query(spark, sf_dir):
    """K4j (r12, search side): ADC search over an OPQ store — the
    query vectors are rotated into the codes' space at plan time (one
    driver-side matmul on the bounded query batch), the compressed
    scan and LUT kernel are byte-identical to plain PQ's, and the
    exact shortlist re-rank point-fetches original full-precision
    vectors. Rotation adds ZERO scan cost and zero extra state beyond
    the dim×dim matrix — the compressed tier's recall/byte trade just
    moves to a better frontier on anisotropic data."""
    from flink_quickstart_spark.operators.quantization import (
        pq_build_index,
        pq_query_index,
    )
    from flink_quickstart_spark.operators.similarity import (
        _ensure_index,
        brute_knn,
    )

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    src = os.path.join(sf_dir, "embeddings.parquet")
    corpus = _correlated_corpus(t.embeddings)
    path = _scratch("opq_index", sf_name)
    _ensure_index(
        lambda: pq_build_index(corpus, path, m=OPQ_M, k=OPQ_K, opq=True),
        path, src, "codebooks",
    )
    brute = brute_knn(corpus, k=3).select("query_id", "nbr_id")
    opq = pq_query_index(
        spark, path, corpus, k=3, shortlist=32, vectors=corpus
    ).select("query_id", "nbr_id", F.lit(1).alias("hit"))
    return brute.join(opq, ["query_id", "nbr_id"], "left").agg(
        F.countDistinct("query_id").alias("n_queries"),
        (
            (F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1))) >= 0.9
        ).alias("recall_ok"),
    )


@register(
    "q_llm_forget_journal",
    # Governance contract (r12): a journaled forget request survives
    # being split across invocations — after a chunked first run
    # (max_stores_per_run=1) the journal shows exactly one store done
    # and the request incomplete; a resume completes the rest with
    # zero residue; and the final store state obeys the complement
    # count law (16 band rows per surviving document).
    oracle="""
    SELECT CAST(16 * count(*) AS BIGINT) AS n_band_rows_kept,
           TRUE AS chunked_state_ok,
           TRUE AS resume_completed_ok
    FROM documents
    WHERE doc_id % 9 <> 4
    """,
    tags=("batch", "llm", "index-maintenance", "governance"),
)
def q_llm_forget_journal(spark, sf_dir):
    """K-gov-ext (r12): JOURNALED right-to-be-forgotten — the durable,
    resumable form of the r10 forget cascade. forget_request_begin
    persists the forget payload and per-store intent BEFORE any
    mutation; resume_forget processes pending stores (in chunks, if
    asked), journaling each completion with the generation its delete
    published, so a crashed compliance job resumes exactly where it
    stopped instead of replaying mutations (an MV retraction must not
    run twice; the generation number is the replay detector — pinned
    in tests/test_forget_journal_r12.py). This key runs the real
    two-store cascade (signature store + MV) chunked across two
    resume calls and checks the journal states plus the complement
    count law on the surgical store."""
    from flink_quickstart_spark.operators.dedup import minhash_build_store
    from flink_quickstart_spark.operators.maintenance import (
        forget_request_begin,
        read_store_count,
        resume_forget,
    )
    from flink_quickstart_spark.operators.matview import mv_build

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    docs = t.documents
    gone = docs.where(F.col("doc_id") % 9 == 4)
    stat = lambda df: df.select(  # noqa: E731
        "doc_id", "lang", F.length("text").alias("n")
    )
    store = _scratch("forget_journal_store", sf_name)
    mv = _scratch("forget_journal_mv", sf_name)
    jdir = _scratch("forget_journal_log", sf_name)
    for p in (store, mv, jdir):
        shutil.rmtree(p, ignore_errors=True)
    minhash_build_store(docs, store)
    mv_build(
        stat(docs), mv, ["lang"],
        [("count", "*", "n_docs"), ("sum", "n", "chars")], n_buckets=4,
    )
    rid = forget_request_begin(
        spark, jdir,
        [
            {"kind": "minhash", "path": store, "df": gone},
            {"kind": "mv", "path": mv, "df": stat(gone)},
        ],
        request_id="compliance-demo",
    )
    st1 = resume_forget(spark, jdir, rid, max_stores_per_run=1)
    chunked_ok = (
        [e["status"] for e in st1["stores"]] == ["done", "pending"]
        and not st1["complete"]
        and st1["stores"][0]["residue"] == 0
    )
    st2 = resume_forget(spark, jdir, rid)
    resumed_ok = bool(
        st2["complete"]
        and all(e["status"] == "done" for e in st2["stores"])
        and resume_forget(spark, jdir, rid)["complete"]  # no-op re-call
    )
    n_kept = read_store_count(store, "bands")  # r13: footer count
    return spark.createDataFrame(
        [(int(n_kept), bool(chunked_ok), resumed_ok)],
        "n_band_rows_kept bigint, chunked_state_ok boolean,"
        " resume_completed_ok boolean",
    )


@register(
    "q_store_history",
    # History contract (r12): after build -> upsert -> delete the
    # commit log lists exactly the three published commits in order,
    # every one still retained (0 never GC'd; keep-2 holds 1+2), only
    # the last current, with non-empty manifest stats; and the final
    # store obeys the complement count law (16 band rows per
    # surviving document).
    oracle="""
    SELECT CAST(3 AS BIGINT) AS n_commits,
           'build,minhash_upsert_store,minhash_delete_store' AS ops_csv,
           TRUE AS history_flags_ok,
           CAST(16 * count(*) AS BIGINT) AS n_band_rows_kept
    FROM documents
    WHERE doc_id % 5 <> 0
    """,
    tags=("batch", "llm", "index-maintenance", "governance"),
)
def q_store_history(spark, sf_dir):
    """ops-ext (r12): queryable COMMIT HISTORY — the DESCRIBE HISTORY
    analog over the generation protocol, completing the time-travel
    story (retained_generations tells you what is still addressable;
    store_history tells you what HAPPENED, durably: the manifest
    travels with its generation and dies with the data GC, while the
    history log is metadata-only and survives). This key runs
    build -> upsert -> delete on a signature store and checks the full
    trail: three commits, correct op names in order, retention and
    current flags, non-empty per-commit manifest stats, plus the
    complement count law on the final store."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_delete_store,
        minhash_upsert_store,
    )
    from flink_quickstart_spark.operators.maintenance import store_history

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    docs = t.documents
    corpus = docs.where(F.col("doc_id") % 7 != 3)
    batch = docs.where(F.col("doc_id") % 7 == 3)
    gone = docs.where(F.col("doc_id") % 5 == 0)
    store = _scratch("store_history", sf_name)
    shutil.rmtree(store, ignore_errors=True)
    minhash_build_store(corpus, store)
    minhash_upsert_store(spark, store, batch)
    minhash_delete_store(spark, store, gone)
    # O(#commits) = 3 metadata rows — the same driver-bounded class as
    # the pins registry (waived in tools/plan_audit.py)
    hist = store_history(spark, store).orderBy("generation").collect()
    flags_ok = bool(
        [h.generation for h in hist] == [0, 1, 2]
        and all(h.retained for h in hist)
        and [h.current for h in hist] == [False, False, True]
        and all(h.n_files > 0 and h.total_bytes > 0 for h in hist)
        and all("bands" in h.subdirs for h in hist)
    )
    n_kept = _rsc(store, "bands")  # r13: footer count
    return spark.createDataFrame(
        [
            (
                len(hist),
                ",".join(h.op for h in hist),
                flags_ok,
                int(n_kept),
            )
        ],
        "n_commits bigint, ops_csv string, history_flags_ok boolean,"
        " n_band_rows_kept bigint",
    )


@register(
    "q_store_catalog",
    # Cross-store atomicity contract (r12): a reader holding catalog
    # v1 sees BOTH stores at their v1 generations throughout a
    # two-store mutation cascade (including mid-cascade, where
    # pointer-resolving readers would already see the new A with the
    # old B); a fresh open after the v2 commit sees both new, with the
    # count laws pinning both final stores.
    oracle="""
    SELECT CAST(16 * sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_band_rows_a,
           CAST(16 * sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_band_rows_b,
           TRUE AS stale_handle_consistent,
           TRUE AS version_advanced
    FROM documents
    """,
    tags=("batch", "llm", "index-maintenance", "isolation"),
)
def q_store_catalog(spark, sf_dir):
    """ops-ext (r12): cross-store ATOMIC catalog — per-store generation
    commits compose into all-or-nothing visibility for store SETS. A
    catalog version is an immutable (store -> generation) JSON
    committed by one pointer flip, its referenced generations held by
    GC pins until a later version stops referencing them
    (operators/maintenance.catalog_commit / open_catalog). This key
    builds two signature stores over disjoint halves of the corpus,
    commits catalog v1, opens a reader on it, mutates BOTH stores
    (checking mid-cascade that the v1 reader still sees the v1 PAIR —
    the tearing a per-store reader would show), commits v2, and
    verifies the stale handle stayed on v1 while a fresh open reads
    both final stores (count laws)."""
    from flink_quickstart_spark.operators.dedup import (
        minhash_build_store,
        minhash_upsert_store,
    )
    from flink_quickstart_spark.operators.maintenance import (
        catalog_commit,
        catalog_version,
        open_catalog,
    )

    t = tables(spark, sf_dir)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    docs = t.documents
    part = lambda r: docs.where(F.col("doc_id") % 4 == r)  # noqa: E731
    a = _scratch("catalog_store_a", sf_name)
    b = _scratch("catalog_store_b", sf_name)
    cat = _scratch("catalog_ptr", sf_name)
    for p in (a, b, cat):
        shutil.rmtree(p, ignore_errors=True)
    minhash_build_store(part(0), a)
    minhash_build_store(part(1), b)
    catalog_commit(cat, {"sigs_a": a, "sigs_b": b})
    h1 = open_catalog(cat)
    # r13 (§1/§5): protocol-check counts via footer metadata at the
    # version's pinned generations (CatalogSnapshot.count)
    n_a_pre = h1.count("sigs_a", "bands")
    n_b_pre = h1.count("sigs_b", "bands")

    minhash_upsert_store(spark, a, part(2))
    mid_ok = (
        h1.count("sigs_a", "bands") == n_a_pre
        and h1.count("sigs_b", "bands") == n_b_pre
    )
    minhash_upsert_store(spark, b, part(3))
    v2 = catalog_commit(cat, {"sigs_a": a, "sigs_b": b})

    stale_ok = bool(
        mid_ok
        and h1.version == 1
        and h1.read(spark, "sigs_a", "bands").count() == n_a_pre
        and h1.read(spark, "sigs_b", "bands").count() == n_b_pre
    )
    h2 = open_catalog(cat)
    n_a = h2.count("sigs_a", "bands")
    n_b = h2.count("sigs_b", "bands")
    advanced = bool(v2 == 2 and catalog_version(cat) == 2 and h2.version == 2)
    return spark.createDataFrame(
        [(int(n_a), int(n_b), stale_ok, advanced)],
        "n_band_rows_a bigint, n_band_rows_b bigint,"
        " stale_handle_consistent boolean, version_advanced boolean",
    )
