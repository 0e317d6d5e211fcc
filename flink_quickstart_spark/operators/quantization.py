"""Product quantization (PQ) — the embedding-COMPRESSION tier of the
vector stack (K4h, r10), complementing the partition-pruning tiers
(IVF members, LSH postings): split each (unit-normalized) vector into
``m`` subspaces, learn a ``k``-centroid codebook per subspace on a
bounded deterministic sample, and store each vector as ``m`` small
codes. At the defaults (m=16 subspaces over dim-64 float32 vectors,
k=256 codes → one byte of information per code) the at-rest footprint
drops from 256 vector bytes to 16 code bytes — the 16× compression
that lets a 100 TB embedding corpus keep its SEARCHABLE form in a
fraction of the space, with the full-precision vectors relegated to
cold storage / a final re-rank fetch. (Codes travel as
``array<smallint>``; parquet dictionary/bit-packing stores the 8-bit
values at ~1 byte at rest.) Measured on the synthetic test embeddings
— UNIFORM random vectors, the adversarial case for any quantizer —
recall@3 of full-scan ADC vs exact brute force is 0.74; clustered
real-world embedding corpora sit far higher at the same bit budget.

Search is ADC (asymmetric distance computation): the QUERY stays
full-precision; per query one m×k lookup table of subspace inner
products is computed once, and each stored vector's approximate cosine
is the sum of m table lookups — no decode, no float vector ever read.
The scan is map-only over the codes table (Arrow-batched numpy gather),
per-partition top-k, then a bounded global top-k window — the same
execution shape as :func:`~.similarity.brute_knn` at 1/16th the bytes.

Determinism contract (mirrors the IVF/LSH stores): the training sample
is orderBy(id).limit(N) (order-stable under AQE/partitioning), k-means
is driver-side numpy with a fixed seed, and encoding is an argmin over
the fixed codebooks — so ``encode == re-encode == persisted codes``
exactly, which is what the q_llm_pq_encode oracle pins. ADC is
approximate BY DESIGN (quantization error only — every row is scanned,
unlike IVF's pruned probe), so q_llm_pq_query carries a recall
CONTRACT oracle, the same grading as q_llm_ann_ivf.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from flink_quickstart_spark.operators.maintenance import (
    AbortStoreGeneration,
    StoreSnapshot,
    current_store_root,
    reset_store_generations,
    read_store,
    read_store_rows,
    store_data_dir,
    store_generation,
    write_store_manifest,
)
from flink_quickstart_spark.operators.similarity import (
    DEFAULT_BROADCAST_BUDGET_BYTES,
    _collect_corpus,
)


def pq_train_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    k: int = 256,
    sample_rows: int = 20_000,
    seed: int = 42,
    iters: int = 10,
) -> np.ndarray:
    """Train the (m, k, dim/m) PQ codebooks: unit-normalize the bounded
    deterministic sample, split dims into ``m`` contiguous subspaces,
    run seeded L2 k-means per subspace (driver numpy — the same
    bounded-sample discipline as the IVF centroid trainer). dim must be
    divisible by m."""
    mat = _pq_training_sample(df, id_col, vec_col, sample_rows)
    return _train_subspace_codebooks(mat, m, k, seed, iters, "pq_train_codebooks")


def _pq_training_sample(
    df: DataFrame, id_col: str, vec_col: str, sample_rows: int
) -> np.ndarray:
    """The bounded deterministic training matrix every quantizer
    trainer shares: orderBy(id).limit(N) (order-stable under AQE),
    unit-normalized rows."""
    sample = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).toPandas()
    )
    mat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _opq_init_rotation(mat: np.ndarray, m: int) -> np.ndarray:
    """OPQ's standard initialization (Ge et al., CVPR 2014 — the
    'natural baseline' the paper iterates from): rotate into the PCA
    eigenbasis, then allocate eigen-dimensions to the ``m`` subspaces
    GREEDILY BALANCING the product of eigenvalues per subspace (sum of
    logs), so no subspace is left with only near-dead directions. On
    anisotropic data a contiguous split of the raw dims gives some
    subspaces almost all the variance (their k centroids can't cover
    it) and others none (their bits are wasted); the balanced eigen
    split spends the m×log2(k) bit budget where the variance is."""
    dim = mat.shape[1]
    dsub = dim // m
    cov = np.cov(mat, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    # greedy balance: biggest eigenvalue first, into the open subspace
    # with the smallest log-product so far
    log_v = np.log(np.maximum(vals, 1e-12))
    assigned: list[list[int]] = [[] for _ in range(m)]
    load = np.zeros(m)
    for j in range(dim):
        open_s = [s for s in range(m) if len(assigned[s]) < dsub]
        tgt = min(open_s, key=lambda s: (load[s], s))
        assigned[tgt].append(j)
        load[tgt] += log_v[j]
    perm = [j for s in range(m) for j in assigned[s]]
    return vecs[:, perm]


def _pq_reconstruct(
    y: np.ndarray, books: np.ndarray
) -> np.ndarray:
    """Encode-then-decode ``y`` against ``books`` (driver-side numpy —
    the OPQ trainer's inner loop on the bounded sample)."""
    m, _k, dsub = books.shape
    out = np.empty_like(y)
    for s in range(m):
        sub = y[:, s * dsub : (s + 1) * dsub]
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        out[:, s * dsub : (s + 1) * dsub] = books[s][np.argmin(d2, axis=1)]
    return out


def opq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    k: int = 256,
    sample_rows: int = 20_000,
    seed: int = 42,
    iters: int = 10,
    opq_iters: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Train an OPQ rotation + codebooks (K4j, r12): learn an
    ORTHOGONAL ``dim×dim`` matrix ``R`` so that PQ in the rotated space
    ``x @ R`` quantizes better at the same m×log2(k) bit budget —
    FAISS's ``OPQMatrix`` pre-transform. Alternating minimization of
    ``||X R − quantize(X R)||_F`` (Ge et al., CVPR 2014): init from the
    eigenvalue-balanced PCA permutation, then iterate {train codebooks
    on X R → reconstruct → re-solve R by orthogonal Procrustes (SVD of
    ``Xᵀ X̂``)}. Everything runs driver-side on the bounded
    deterministic sample (same discipline as the IVF/PQ trainers:
    seeded, orderBy(id).limit(N)), so train == retrain bit-identically.

    Rotation preserves norms and inner products, so ADC sums in the
    rotated space approximate the ORIGINAL cosine — queries are rotated
    at plan time and nothing else in the search path changes. On
    isotropic (uniform-random) vectors R buys nothing by construction;
    on anisotropic/correlated real embedding corpora the balanced
    subspaces cut reconstruction error — the q_llm_opq_encode contract
    measures exactly that against plain PQ on the same data."""
    mat = _pq_training_sample(df, id_col, vec_col, sample_rows)
    if mat.shape[1] % m:
        raise ValueError(
            f"opq_train: dim {mat.shape[1]} not divisible by m={m}"
        )
    rot = _opq_init_rotation(mat, m)
    books = None
    for _ in range(max(1, int(opq_iters))):
        y = mat @ rot
        books = _train_subspace_codebooks(y, m, k, seed, iters, "opq_train")
        recon = _pq_reconstruct(y, books)
        u, _s, vt = np.linalg.svd(mat.T @ recon)
        rot = u @ vt
    # final codebooks for the final rotation
    books = _train_subspace_codebooks(
        mat @ rot, m, k, seed, iters, "opq_train"
    )
    return rot, books


def _train_subspace_codebooks(
    mat: np.ndarray, m: int, k: int, seed: int, iters: int, op: str
) -> np.ndarray:
    """Seeded per-subspace L2 k-means over an already-prepared training
    matrix (unit vectors for plain PQ; assignment residuals for IVFPQ).
    Shared by :func:`pq_train_codebooks` and :func:`ivfpq_build_index`
    with rng consumption order preserved exactly (one ``choice`` per
    subspace, in subspace order) so refactors never move stored codes."""
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"{op}: dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.zeros((m, k, dsub))
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        k_eff = min(k, len(sub))
        cents = sub[rng.choice(len(sub), size=k_eff, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k_eff):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s, :k_eff] = cents
    return books


def pq_encode_df(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """(id, codes array<smallint>) — one Arrow-batched argmin pass, map
    only. Encoding normalizes each vector first (the codebooks were
    trained on unit vectors so ADC sums approximate cosine); an OPQ
    store passes its stored ``rotation``, applied after the normalize
    (orthogonal — unit norm preserved)."""
    m, _k, dsub = codebooks.shape
    bc = df.sparkSession.sparkContext.broadcast((codebooks, rotation))
    id_t = df.schema[id_col].dataType.simpleString()

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books, rot = bc.value
        for pdf in batches:
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            if rot is not None:
                v = v @ rot
            codes = np.zeros((len(v), m), dtype=np.int16)
            for s in range(m):
                sub = v[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d2, axis=1).astype(np.int16)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} {id_t}, codes array<smallint>"
    )


#: Hive partition count for the flat-PQ codes store's id-hash layout.
#: 64 buckets keeps a delete's touched-partition set driver-trivial
#: while bounding per-bucket file growth under daily upserts.
PQ_ID_BUCKETS = 64


def _with_idmod(df: DataFrame, id_col: str, id_buckets: int) -> DataFrame:
    """``_idmod = pmod(xxhash64(id), id_buckets)`` — a pure function of
    the ID alone, so locating a row needs no vector payload: upsert,
    delete and the forget cascade prune to the batch's buckets from
    ids only (unlike the cluster stores, whose partition is a function
    of the vector)."""
    return df.withColumn(
        "_idmod", F.pmod(F.xxhash64(F.col(id_col)), F.lit(id_buckets)).cast("int")
    )


def pq_build_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    k: int = 256,
    sample_rows: int = 20_000,
    seed: int = 42,
    id_buckets: int = PQ_ID_BUCKETS,
    opq: bool = False,
    opq_iters: int = 8,
) -> None:
    """Materialize the compressed search form:

    - ``{path}/codes`` — (id, codes array<smallint>): m 8-bit codes per
      vector vs dim float32s (16× at the defaults), PARTITIONED BY
      ``_idmod`` (an id-hash bucket, r11) so the maintenance lifecycle
      (:func:`pq_upsert_index` / :func:`pq_delete_index` /
      maintenance.compact_pq_index / the ``"pq"`` forget kind) is
      partition-local instead of a full-store rewrite; the ADC scan
      reads every bucket regardless (full-scan is the flat tier's
      contract), so query cost is unchanged;
    - ``{path}/codebooks`` — (subspace, code, centroid array<double>)
      rows, m×k of them, so query sessions rebuild the LUTs from a
      driver-sized read;
    - ``opq=True`` (K4j, r12) additionally trains and stores the OPQ
      rotation (:func:`opq_train`) as ``{path}/rotation`` (dim rows),
      and all codes are of the ROTATED vectors. Every downstream path
      (upsert, query, decode, forget) resolves the rotation from the
      store itself, so an OPQ store is maintained and searched through
      the exact same lifecycle as a plain one.
    """
    reset_store_generations(path)  # rebuild over a mutated store
    spark = df.sparkSession
    if opq:
        rot, books = opq_train(
            df, id_col, vec_col, m=m, k=k, sample_rows=sample_rows,
            seed=seed, opq_iters=opq_iters,
        )
    else:
        rot = None
        books = pq_train_codebooks(
            df, id_col, vec_col, m=m, k=k, sample_rows=sample_rows, seed=seed
        )
    (
        _with_idmod(
            pq_encode_df(df, books, id_col, vec_col, rotation=rot),
            id_col, id_buckets,
        )
        .repartition("_idmod")
        .sortWithinPartitions("_idmod", id_col)
        .write.mode("overwrite")
        .partitionBy("_idmod")
        .parquet(f"{path}/codes")
    )
    rows = [
        (int(s), int(c), [float(x) for x in books[s, c]])
        for s in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    if rot is not None:
        spark.createDataFrame(
            [(int(i), [float(x) for x in rot[i]]) for i in range(len(rot))],
            "i int, row array<double>",
        ).write.mode("overwrite").parquet(f"{path}/rotation")
    spark.createDataFrame(
        [(int(id_buckets),)], "id_buckets int"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    write_store_manifest(path)  # stamp generation 0's file list (r12)


def pq_upsert_index(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """INCREMENTAL maintenance of a persisted flat-PQ store (the K4h
    lifecycle gap VERDICT r10 #2 named): encode the batch against the
    STORED codebooks (one Arrow argmin pass — encoding is a pure
    function of (vector, codebooks), so the grown codes table is
    row-identical to re-encoding the full corpus against the same
    store, the q_llm_pq_upsert oracle) and append to the batch's
    ``_idmod`` buckets. Cost ∝ |batch|; corpus codes never read.
    Codebooks stay fixed between periodic rebuilds — the documented
    PQ trade (encode quality degrades gracefully with drift; the
    compressed production tier with a retrain limb is IVFPQ).

    Precondition: batch ids must be NEW (dedup upstream). Publishes as
    an atomic generation commit."""
    with store_generation(path, "pq_upsert_index") as gen:
        books = load_codebooks(spark, path)
        rot = load_rotation(spark, path)
        buckets = _pq_bucket_count(spark, path)
        (
            _with_idmod(
                pq_encode_df(new_df, books, id_col, vec_col, rotation=rot),
                id_col, buckets,
            )
            .write.mode("append")
            .partitionBy("_idmod")
            .parquet(os.path.join(gen, "codes"))
        )


def _pq_bucket_count(spark, path: str) -> int:
    """The id-bucket modulus the store was built with, read from the
    store's pinned ``meta`` table (self-describing, like the minhash
    store's hash family) — a WRONG modulus would hash maintenance
    batches into the wrong buckets and silently break delete pruning,
    so a store without meta (pre-r11, unbucketed layout) fails loudly
    with the rebuild instruction instead of guessing."""
    meta_dir = store_data_dir(path, "meta")
    if not os.path.isdir(meta_dir):
        raise ValueError(
            f"pq store {path!r} has no meta table — it predates the "
            "id-bucketed layout; rebuild it with pq_build_index before "
            "running maintenance ops (the flat layout cannot locate a "
            "row's bucket)."
        )
    return int(read_store_rows(path, "meta")[0].id_buckets)


def pq_delete_index(
    spark,
    path: str,
    del_df: DataFrame,
    id_col: str = "vec_id",
) -> None:
    """INCREMENTAL deletion from a persisted flat-PQ store: the batch's
    ``_idmod`` buckets are a pure function of the IDS (no vector
    payload needed — the forget cascade passes the same id frame it
    audits with), so the scan prunes to those buckets, anti-joins the
    ids out, dynamic-overwrites them in the staged generation, and
    drops buckets left empty. Cost ∝ batch + touched-bucket occupancy.
    Publishes as an atomic generation commit."""
    from flink_quickstart_spark.operators.iterative import _release
    from flink_quickstart_spark.operators.similarity import (
        _drop_empty_partitions,
    )

    with store_generation(path, "pq_delete_index") as gen:
        buckets_n = _pq_bucket_count(spark, path)
        del_ids = (
            _with_idmod(del_df.select(id_col).distinct(), id_col, buckets_n)
            .localCheckpoint(eager=True)
        )
        try:
            probed = [
                int(r._idmod)
                for r in del_ids.select("_idmod").distinct().collect()
            ]
            if not probed:
                raise AbortStoreGeneration  # empty batch — store untouched
            survivors = (
                read_store(spark, path, "codes")
                .where(F.col("_idmod").isin(probed))
                .join(
                    del_ids.select(F.col(id_col).alias("_del_id")),
                    F.col(id_col) == F.col("_del_id"),
                    "left_anti",
                )
                .select(id_col, "codes", "_idmod")
                .localCheckpoint(eager=True)
            )
            try:
                (
                    survivors.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("_idmod")
                    .parquet(os.path.join(gen, "codes"))
                )
                surviving = {
                    (int(r._idmod),)
                    for r in survivors.select("_idmod").distinct().collect()
                }
                _drop_empty_partitions(
                    os.path.join(gen, "codes"),
                    [(b,) for b in probed],
                    surviving,
                    ["_idmod"],
                )
            finally:
                _release(survivors)
        finally:
            _release(del_ids)


def load_codebooks(spark, path: str) -> np.ndarray:
    rows = read_store_rows(path, "codebooks")
    m = 1 + max(r.subspace for r in rows)
    k = 1 + max(r.code for r in rows)
    dsub = len(rows[0].centroid)
    books = np.zeros((m, k, dsub))
    for r in rows:
        books[r.subspace, r.code] = r.centroid
    return books


def load_rotation(spark, path: str) -> np.ndarray | None:
    """The store's OPQ rotation matrix, or None for a plain-PQ store
    (no ``rotation`` subdir in the current generation)."""
    if not os.path.isdir(store_data_dir(path, "rotation")):
        return None
    rows = read_store_rows(path, "rotation")
    rot = np.zeros((len(rows), len(rows[0].row)))
    for r in rows:
        rot[r.i] = r.row
    return rot


def pq_decode_df(
    spark,
    path: str,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, recon array<double>) — reconstruct each vector from its
    codes (centroid concat; an OPQ store's reconstruction is rotated
    BACK into the original space with Rᵀ, so recon compares against
    the source vectors either way). Used by the reconstruction-quality
    contract; production search never decodes (ADC reads codes only)."""
    books = load_codebooks(spark, path)
    rot = load_rotation(spark, path)
    m, _k, dsub = books.shape
    bc = spark.sparkContext.broadcast((books, rot))
    codes = read_store(spark, path, "codes").select(
        id_col, "codes"
    )
    id_t = codes.schema[id_col].dataType.simpleString()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b, r = bc.value
        for pdf in batches:
            c = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            recon = np.concatenate(
                [b[s][c[:, s]] for s in range(m)], axis=1
            )
            if r is not None:
                recon = recon @ r.T
            yield pd.DataFrame({id_col: pdf[id_col], "recon": list(recon)})

    return codes.mapInPandas(decode, f"{id_col} {id_t}, recon array<double>")


def _adc_scan_coalesce(df: DataFrame, path: str, subdir: str = "codes",
                       prefixes: list[str] | None = None) -> DataFrame:
    """Size the ADC codes scan's partitions to the DATA (r13, §2.2):
    every scan partition emits up to |queries| × shortlist candidate
    rows into the global top-k window regardless of how few code rows
    it holds, so a tiny store split into file-count partitions floods
    the window with |q|×cut×partitions rows (measured 2.0 M rows and a
    0.9 s window at sf0.1 vs 64 k rows after coalescing). Target ~4 MB
    of codes per partition, computed DRIVER-SIDE from the store
    manifest (no job); ``coalesce`` only merges splits, so at real
    scale (≥128 MB splits) this is a plan no-op. ``prefixes`` narrows
    the byte count to the probed partition dirs (IVFPQ)."""
    import math

    try:
        man = StoreSnapshot(path).manifest
    except Exception:  # noqa: BLE001 — no manifest: leave the scan alone
        return df
    if man is None:
        return df
    pfx = subdir.rstrip("/") + os.sep
    entries = [e for e in man["files"] if e["path"].startswith(pfx)]
    if prefixes is not None:
        keep = tuple(os.path.join(subdir, p) for p in prefixes)
        entries = [e for e in entries if e["path"].startswith(keep)]
    total = sum(e["bytes"] for e in entries)
    n = max(1, math.ceil(total / (4 * 1024 * 1024)))
    return df.coalesce(n)


def _adc_topk(sims, ids_q, n_ids, cut, sim_decimals):
    """Vectorized per-query top-``cut`` over an ADC sims matrix (rows =
    queries, cols = scanned codes), exact (sim desc, nbr id asc)
    tie-break, ``-inf`` entries (self / out-of-probe) dropped — the C
    replacement for the per-query Python lexsort loop both ADC scans
    used (guide §4.2; measured 5-10× on 2000×2000 batches). Same
    argpartition-window + tie-boundary-fallback construction as
    brute_knn: a row falls back to the full-row sort iff its cut-th
    FINITE sim ties the window minimum, so results are bit-identical
    to the naive sort always."""
    m, n = sims.shape
    c2 = min(cut, n)
    k2 = min(n, c2 + 64)
    if k2 < n:
        idx2 = np.argpartition(-sims, k2 - 1, axis=1)[:, :k2]
        subs = np.take_along_axis(sims, idx2, axis=1)
        o = np.lexsort((n_ids[idx2], -subs), axis=-1)[:, :c2]
        order = np.take_along_axis(idx2, o, axis=1)
        kth = np.take_along_axis(subs, o[:, -1:], axis=1)[:, 0]
        # -inf kth means every finite entry already fits the window
        # (argpartition keeps the k2 LARGEST) — safe by construction
        unsafe = (kth <= subs.min(axis=1)) & (kth > -np.inf)
        if unsafe.any():
            full = np.lexsort(
                (
                    np.broadcast_to(n_ids, sims[unsafe].shape),
                    -sims[unsafe],
                ),
                axis=-1,
            )[:, :c2]
            order[unsafe] = full
    else:
        order = np.lexsort(
            (np.broadcast_to(n_ids, sims.shape), -sims), axis=-1
        )[:, :c2]
    top_sims = np.take_along_axis(sims, order, axis=1)
    finite = (top_sims > -np.inf).ravel()
    return pd.DataFrame(
        {
            "query_id": np.repeat(
                np.asarray(ids_q, dtype=np.int64), order.shape[1]
            )[finite],
            "nbr_id": n_ids[order].ravel()[finite].astype(np.int64),
            "adc_sim": np.round(top_sims.ravel()[finite], sim_decimals),
        }
    )


def pq_query_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int = 6,
    max_broadcast_bytes: int = DEFAULT_BROADCAST_BUDGET_BYTES,
    shortlist: int | None = None,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k over the compressed codes: queries stay full-precision
    (budget-guarded driver collect + broadcast, the brute_knn
    discipline), each gets one m×k inner-product LUT, and the codes
    table is scanned map-only with numpy gathers — per-partition top-k,
    then a bounded global top-k window (≤ |queries| × k rows per
    partition reach the shuffle). Self-matches excluded. Ties broken by
    (sim desc, nbr id asc) on ROUNDED sims — deterministic.

    ``shortlist=S`` (with ``vectors`` = the full-precision table) adds
    the standard PQ RE-RANK tier: ADC produces an S-candidate shortlist
    per query, the shortlist's full vectors are point-fetched (the
    |q|×S candidate table is tiny — it broadcasts onto the vector scan,
    no shuffle of the corpus), exact cosine is computed JVM-side
    (zip_with/aggregate — whole-stage codegen), and the final top-k is
    exact over the shortlist. Measured on the uniform synthetic
    embeddings (the quantizer's adversarial case): pure ADC recall@3 is
    0.74 at 500 vectors but 0.35 at 20k (near-ties swamp the
    quantization noise floor as the corpus densifies) — while the true
    top-3 is contained in the ADC top-32 at EVERY measured scale
    (shortlist recall 1.00 at 20k), so ADC→re-rank restores exact-class
    recall at 1/16th the scan bytes plus |q|×S full-vector fetches."""
    q_ids, q_mat, _ = _collect_corpus(
        queries, id_col, vec_col, max_broadcast_bytes, "pq_query_index"
    )
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    books = load_codebooks(spark, path)
    rot = load_rotation(spark, path)
    # OPQ store: rotate the queries into the codes' space — R is
    # orthogonal, so <qR, xR> == <q, x> and the ADC sums still
    # approximate the ORIGINAL cosine (the exact re-rank tier below
    # works on unrotated vectors either way)
    qr = qn if rot is None else qn @ rot
    m, _kk, dsub = books.shape
    # LUT per subspace, SUBSPACE-MAJOR (r13, §4.2/§4.5): a list of
    # contiguous (Q × k) arrays, so the batch loop gathers directly —
    # the former (Q, m, k) stack forced a full-LUT strided copy per
    # subspace per batch
    lut = [
        np.ascontiguousarray(qr[:, s * dsub : (s + 1) * dsub] @ books[s].T)
        for s in range(m)
    ]
    bc = spark.sparkContext.broadcast((np.asarray(q_ids, dtype=np.int64), lut))
    codes = _adc_scan_coalesce(
        read_store(spark, path, "codes").select(id_col, "codes"), path
    )
    cut = shortlist if shortlist else k  # per-partition keep size

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, tables = bc.value
        for pdf in batches:
            c = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            n_ids = pdf[id_col].to_numpy()
            sims = tables[0][:, c[:, 0]].copy()
            for s in range(1, m):
                sims += tables[s][:, c[:, s]]
            np.copyto(
                sims,
                -np.inf,
                where=ids_q[:, None] == n_ids[None, :],
            )
            yield _adc_topk(sims, ids_q, n_ids, cut, sim_decimals)

    cand = codes.mapInPandas(
        scan, "query_id bigint, nbr_id bigint, adc_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("nbr_id")
    )
    top = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= (shortlist if shortlist else k))
        .select("query_id", "nbr_id", "adc_sim", "rank")
    )
    if shortlist is None:
        return top
    return _exact_rerank(
        spark, top, q_ids, qn, vectors, k, id_col, vec_col, sim_decimals,
        "pq_query_index",
    )


def _exact_rerank(
    spark,
    top: DataFrame,
    q_ids,
    qn: np.ndarray,
    vectors: DataFrame | None,
    k: int,
    id_col: str,
    vec_col: str,
    sim_decimals: int,
    op: str,
) -> DataFrame:
    """The standard PQ/IVFPQ RE-RANK tier, shared by
    :func:`pq_query_index` and :func:`ivfpq_query_index`: the tiny
    |q|×S candidate table broadcasts onto the vector scan (point-fetch,
    corpus never shuffled), query vectors broadcast-join from a |q|-row
    local relation, exact cosine is computed JVM-side
    (zip_with/aggregate — whole-stage codegen), and the final top-k is
    exact over the shortlist."""
    if vectors is None:
        raise ValueError(
            f"{op}: shortlist re-rank needs vectors= (the "
            "full-precision table the codes were built from)."
        )
    # r13 (§4.2/§5): the query matrix is ALREADY a budget-guarded
    # driver collect — broadcast it as numpy instead of round-tripping
    # it through a 2000-row pickled createDataFrame + broadcast join
    # (measured 0.6 s of driver-side row conversion per query call),
    # and score the point-fetched candidate batch with one vectorized
    # einsum instead of the per-row zip_with/aggregate fold (measured
    # 0.85 s over 64 k candidates; numpy also matches the brute tier's
    # BLAS arithmetic). Rank on the UNROUNDED cosine (brute_knn's
    # discipline); round only the emitted value.
    bcq = spark.sparkContext.broadcast(
        (np.asarray(q_ids, dtype=np.int64), qn)
    )
    full = vectors.select(
        F.col(id_col).cast("long").alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("_nvec"),
    )
    fetched = full.join(
        F.broadcast(top.select("query_id", "nbr_id")), "nbr_id"
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, qmat = bcq.value
        pos = pd.Series(np.arange(len(ids_q)), index=ids_q)
        qnorm = np.linalg.norm(qmat, axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            nv = np.stack(pdf["_nvec"].to_numpy())
            qi = pos[pdf["query_id"].to_numpy()].to_numpy()
            num = np.einsum("ij,ij->i", qmat[qi], nv)
            sim = num / (np.linalg.norm(nv, axis=1) * qnorm[qi])
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "nbr_id": pdf["nbr_id"],
                    "_sim_raw": sim,
                }
            )

    reranked = fetched.mapInPandas(
        score, "query_id bigint, nbr_id bigint, _sim_raw double"
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("_sim_raw").desc(), F.col("nbr_id")
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "nbr_id",
            F.round("_sim_raw", sim_decimals).alias("sim"),
            "rank",
        )
    )


# --------------------------------------------------------------- IVFPQ
#
# The composition the two tiers above exist for (K4i, r10): IVF gives
# PARTITION PRUNING (a probe reads n_probe/n_clusters of the corpus —
# the on-disk layout is the index), PQ gives BYTE COMPRESSION (the scan
# reads m code bytes per vector instead of dim float32s). IVFPQ stores
# the PQ codes PARTITIONED BY the IVF cluster, so a query does both at
# once: prune to the probed cluster directories, ADC-scan only code
# bytes inside them, then exact-re-rank a bounded shortlist from the
# full-precision table. At the defaults (16 clusters, n_probe=4, m=16
# over dim-64 float32) a query touches 4/16 of the partitions × 16/256
# of the bytes ≈ 1/64th of the raw-corpus scan — the only shape that
# keeps per-query cost sane at 100 TB.
#
# Codes are RESIDUAL-encoded (the FAISS IVFPQ discipline): each vector
# is quantized as (its unit form − its assigned centroid), and the
# codebooks train on sample residuals — residuals concentrate near 0,
# so the same bit budget spends its resolution where the data actually
# is. ADC then scores ⟨q, x⟩ ≈ ⟨q, centroid(x)⟩ + Σ_s LUT_s[code_s(x)]:
# one Q×n_clusters base table plus the usual m×k LUT per query.
#
# Determinism contract (the store-maintenance invariants depend on it):
# centroids and codebooks train on the order-stable bounded sample with
# fixed seeds, and encoding is argmax/argmin against those STORED
# artifacts — so (cluster_id, codes) of any vector is a pure function
# of (vector, store), which is what makes an incremental append
# row-identical to re-encoding the full corpus against the same store
# (q_llm_ivfpq_upsert pins exactly that).


def _ivfpq_encode_df(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes array<smallint>, [extra metadata cols], cluster_id) —
    assign each vector to its nearest stored centroid (cosine argmax,
    the :func:`~.similarity._assign_members_df` metric) and PQ-encode
    its RESIDUAL against the stored codebooks, in one Arrow-batched
    map-only pass. Deterministic given (centroids, codebooks).

    ``extra_cols`` are metadata columns of ``df`` carried through into
    the codes store verbatim — the filtered-ANN substrate: a query-time
    predicate over them is a pushed-down columnar filter on the codes
    scan (zero shuffle, zero side lookups), the FAISS-IDSelector
    semantics at parquet-scan cost."""
    m, _k, dsub = codebooks.shape
    bc = df.sparkSession.sparkContext.broadcast((centroids, codebooks))
    id_t = df.schema[id_col].dataType.simpleString()
    extra_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in extra_cols
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents, books = bc.value
        for pdf in batches:
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            cl = np.argmax(v @ cents.T, axis=1).astype(np.int32)
            resid = v - cents[cl]
            codes = np.zeros((len(v), m), dtype=np.int16)
            for s in range(m):
                sub = resid[:, s * dsub : (s + 1) * dsub]
                d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d2, axis=1).astype(np.int16)
            out = {id_col: pdf[id_col], "codes": list(codes)}
            for c in extra_cols:
                out[c] = pdf[c]
            out["cluster_id"] = cl
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col, *extra_cols).mapInPandas(
        encode,
        f"{id_col} {id_t}, codes array<smallint>{extra_schema}, cluster_id int",
    )


def _store_extra_cols(spark, path: str, id_col: str) -> tuple[str, ...]:
    """The metadata columns a codes store carries (everything beyond
    id/codes/cluster_id and the flat store's ``_idmod`` bucket) — read
    from the store's own schema so upsert, delete and retrain stay
    schema-faithful without the caller re-declaring them."""
    cols = read_store(spark, path, "codes").columns
    return tuple(
        c for c in cols if c not in (id_col, "codes", "cluster_id", "_idmod")
    )


def ivfpq_build_index(
    df: DataFrame,
    path: str,
    n_clusters: int = 16,
    m: int = 16,
    k: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    kmeans_iters: int = 5,
    sample_rows: int = 20_000,
    pq_iters: int = 10,
    extra_cols: tuple[str, ...] = (),
) -> None:
    """Materialize the pruned+compressed search form:

    - ``{path}/codes`` — (id, codes array<smallint>, [extra_cols])
      PARTITIONED BY cluster_id: the IVF layout over the PQ payload, so
      a probe reads n_probe/n_clusters of the directories and m bytes
      per vector; ``extra_cols`` (metadata columns of ``df``, e.g.
      lang/source) ride along for filtered ANN — a query `where` over
      them is a pushed-down columnar predicate on this scan;
    - ``{path}/centroids`` — the IVF centroid table (same format as
      :func:`~.similarity.ivf_build_index`);
    - ``{path}/codebooks`` — the residual PQ codebooks (same format as
      :func:`pq_build_index`).

    Training is the shared bounded-deterministic-sample discipline:
    centroids via :func:`~.similarity._train_centroids`, then residual
    codebooks on the SAME sample's assignment residuals."""
    from flink_quickstart_spark.operators.similarity import _train_centroids

    reset_store_generations(path)  # rebuild over a mutated store
    spark = df.sparkSession
    centroids = _train_centroids(
        df, id_col, vec_col, n_clusters, seed, kmeans_iters, sample_rows
    )
    sample = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).toPandas()
    )
    mat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    resid = mat - centroids[np.argmax(mat @ centroids.T, axis=1)]
    books = _train_subspace_codebooks(
        resid, m, k, seed, pq_iters, "ivfpq_build_index"
    )
    (
        _ivfpq_encode_df(df, centroids, books, id_col, vec_col, extra_cols)
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(f"{path}/codes")
    )
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    rows = [
        (int(s), int(c), [float(x) for x in books[s, c]])
        for s in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    write_store_manifest(path)  # stamp generation 0's file list (r12)


def load_ivfpq_artifacts(spark, path: str) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, codebooks) from a persisted IVFPQ store — two
    driver-sized reads (n_clusters + m×k rows), the everything a query
    or maintenance session needs besides the codes scan."""
    cent_rows = read_store_rows(path, "centroids")
    cents = np.zeros((len(cent_rows), len(cent_rows[0].centroid)))
    for r in cent_rows:
        cents[r.cluster_id] = r.centroid
    return cents, load_codebooks(spark, path)


def ivfpq_query_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int = 6,
    max_broadcast_bytes: int = DEFAULT_BROADCAST_BUDGET_BYTES,
    shortlist: int | None = 32,
    vectors: DataFrame | None = None,
    where: str | None = None,
) -> DataFrame:
    """Pruned + compressed ANN: assign each query its ``n_probe``
    nearest stored centroids driver-side (the query batch is already a
    budget-guarded driver collect for the ADC LUTs), STATICALLY prune
    the codes scan to the union of probed clusters (the isin predicate
    prunes partitions at planning — the r8 IVF discipline, DPP measured
    not firing on this shape), ADC-score only rows whose cluster is in
    THAT query's probe set (⟨q, centroid⟩ base + m LUT gathers), keep a
    per-partition shortlist, merge with one bounded window, and
    exact-re-rank the shortlist from the full-precision table
    (:func:`_exact_rerank` — point-fetch, the corpus is never shuffled).

    ``where`` is FILTERED ANN (the FAISS IDSelector semantics, at
    parquet-scan cost): a SQL predicate over the store's metadata
    columns (``extra_cols`` at build time, e.g. ``"lang = 'en'"``)
    applied to the codes scan BEFORE scoring — PRE-filtering, so the
    top-k is exact over the eligible subset (post-filtering a fixed
    top-k would under-fill whenever the filter is selective). The
    predicate pushes down to the parquet scan (row-group stats +
    column pruning); no side lookup, no shuffle.

    Self-matches excluded; ties broken by (sim desc, nbr id asc) —
    deterministic. ``shortlist=None`` returns raw ADC top-k (no re-rank,
    no ``vectors`` needed) for diagnostics."""
    q_ids, q_mat, _ = _collect_corpus(
        queries, id_col, vec_col, max_broadcast_bytes, "ivfpq_query_index"
    )
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    cents, books = load_ivfpq_artifacts(spark, path)
    m, _kk, dsub = books.shape
    base = qn @ cents.T  # Q × n_clusters: the ⟨q, centroid⟩ ADC term
    n_probe = min(n_probe, base.shape[1])
    order = np.argsort(-base, axis=1)[:, :n_probe]
    probe_mask = np.zeros(base.shape, dtype=bool)
    probe_mask[np.arange(len(qn))[:, None], order] = True
    # subspace-major contiguous LUT list (r13, §4.2/§4.5 — no per-batch
    # full-LUT strided copies; same values, direct gathers)
    lut = [
        np.ascontiguousarray(qn[:, s * dsub : (s + 1) * dsub] @ books[s].T)
        for s in range(m)
    ]
    bc = spark.sparkContext.broadcast(
        (np.asarray(q_ids, dtype=np.int64), base, probe_mask, lut)
    )
    probed = sorted({int(c) for c in order.reshape(-1)})
    codes = read_store(spark, path, "codes").where(
        F.col("cluster_id").isin(probed)
    )
    if where is not None:
        codes = codes.where(where)
    codes = _adc_scan_coalesce(
        codes.select(id_col, "codes", "cluster_id"), path,
        prefixes=[f"cluster_id={c}" for c in probed],
    )
    cut = shortlist if shortlist else k

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, base_, pmask, tables = bc.value
        for pdf in batches:
            c = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            clus = pdf["cluster_id"].to_numpy().astype(np.int64)
            n_ids = pdf[id_col].to_numpy()
            sims = base_[:, clus].copy()  # Q × N residual-free term
            for s in range(m):
                sims += tables[s][:, c[:, s]]
            sims[~pmask[:, clus]] = -np.inf  # outside this query's probes
            np.copyto(
                sims, -np.inf, where=ids_q[:, None] == n_ids[None, :]
            )
            yield _adc_topk(sims, ids_q, n_ids, cut, sim_decimals)

    cand = codes.mapInPandas(
        scan, "query_id bigint, nbr_id bigint, adc_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("nbr_id")
    )
    top = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= cut)
        .select("query_id", "nbr_id", "adc_sim", "rank")
    )
    if shortlist is None:
        return top
    return _exact_rerank(
        spark, top, q_ids, qn, vectors, k, id_col, vec_col, sim_decimals,
        "ivfpq_query_index",
    )


def ivfpq_upsert_index(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """INCREMENTAL maintenance of a persisted IVFPQ store — the FAISS
    `add` lifecycle for the compressed tier: assign + residual-encode
    the batch against the STORED centroids and codebooks, append to the
    batch's cluster partitions. Cost ∝ |batch| (one Arrow encode pass +
    an append touching only the batch's clusters); the corpus codes are
    never read. Invariant (q_llm_ivfpq_upsert): the grown codes table
    is row-identical to re-encoding the full corpus against the same
    stored artifacts. Codebooks and centroids stay fixed between
    periodic retrains (the documented trade — encode quality degrades
    gracefully with the un-retrained fraction, exactly as IVF members).

    Precondition: batch ids must be NEW (dedup upstream — an id already
    in the store would be duplicated). Publishes as an atomic
    generation commit (single-writer via the store lease; readers see
    the pre- or post-upsert store, never a torn batch)."""
    with store_generation(path, "ivfpq_upsert_index") as gen:
        cents, books = load_ivfpq_artifacts(spark, path)
        extras = _store_extra_cols(spark, path, id_col)
        (
            _ivfpq_encode_df(new_df, cents, books, id_col, vec_col, extras)
            .write.mode("append")
            .partitionBy("cluster_id")
            .parquet(os.path.join(gen, "codes"))
        )


def ivfpq_delete_index(
    spark,
    path: str,
    del_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """INCREMENTAL deletion from a persisted IVFPQ store: assign the
    deletion batch against the STORED centroids (deterministic, so each
    row's cluster is exactly where its codes were written), anti-join
    the ids out of ONLY the affected cluster partitions (dynamic
    overwrite), and drop clusters left empty — dynamic overwrite alone
    would keep their stale files (the
    :func:`~.similarity._drop_empty_partitions` lesson). ``del_df``
    carries (id, vector) because the cluster is a function of the
    vector. Cost ∝ batch + touched-cluster occupancy. Publishes as an
    atomic generation commit — a concurrent reader sees the pre- or
    post-delete store, never a mix (local/DBFS-style paths only: the
    generation clone and emptied-partition drop are filesystem calls)."""
    from flink_quickstart_spark.operators.similarity import (
        _assign_members_df,
        _drop_empty_partitions,
    )
    from flink_quickstart_spark.operators.iterative import _release

    with store_generation(path, "ivfpq_delete_index") as gen:
        cents, _books = load_ivfpq_artifacts(spark, path)
        assigned = _assign_members_df(
            del_df, cents, id_col, vec_col
        ).localCheckpoint(eager=True)
        try:
            clusters = [
                int(r.cluster_id)
                for r in assigned.select("cluster_id").distinct().collect()
            ]
            if not clusters:
                raise AbortStoreGeneration  # empty batch — store untouched
            extras = _store_extra_cols(spark, path, id_col)
            survivors = (
                read_store(spark, path, "codes")
                .where(F.col("cluster_id").isin(clusters))
                .join(
                    assigned.select(F.col(id_col).alias("_del_id")).distinct(),
                    F.col(id_col) == F.col("_del_id"),
                    "left_anti",
                )
                .select(id_col, "codes", *extras, "cluster_id")
                .localCheckpoint(eager=True)
            )
            try:
                (
                    survivors.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("cluster_id")
                    .parquet(os.path.join(gen, "codes"))
                )
                surviving = {
                    (int(r.cluster_id),)
                    for r in survivors.select("cluster_id").distinct().collect()
                }
                _drop_empty_partitions(
                    os.path.join(gen, "codes"),
                    [(c,) for c in clusters],
                    surviving,
                    ["cluster_id"],
                )
            finally:
                _release(survivors)
        finally:
            _release(assigned)


def ivfpq_retrain_index(
    spark,
    path: str,
    corpus: DataFrame,
    n_clusters: int | None = None,
    m: int | None = None,
    k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    kmeans_iters: int = 5,
    sample_rows: int = 20_000,
    pq_iters: int = 10,
) -> dict:
    """PERIODIC retrain for the IVFPQ store — train → add → **retrain**
    (the K4g lifecycle, now for the compressed tier): between retrains
    :func:`ivfpq_upsert_index` encodes against the STORED
    centroids/codebooks forever, so under drift both the partitioning
    AND the residual quantization quality decay. Retrain re-learns both
    and re-encodes.

    One honest difference from :func:`~.similarity.ivf_retrain_index`:
    the IVF member table stores full vectors, so IVF retrains from the
    index's own data — but the IVFPQ store holds CODES only (that is
    its point), so retrain must read the full-precision ``corpus`` from
    the cold tier, exactly once, linearly. That is the documented cost
    of 16× at-rest compression: the periodic retrain is the one op that
    touches the float vectors (the same vectors the re-rank point-fetch
    already requires to exist). ``corpus`` must be the store's logical
    content (build inputs ∪ upserts ∖ deletes) — guarded by a loud
    count check, since a wrong corpus would silently fork the store.

    Steps: re-run the bounded-sample deterministic k-means + residual
    codebook training on ``corpus`` (same seed/sample discipline as
    :func:`ivfpq_build_index`), re-encode in ONE linear Arrow pass into
    the staged next GENERATION (codes+centroids+codebooks written
    fresh), and publish with one atomic pointer flip — a reader never
    observes new codes with old codebooks (mixing generations would
    corrupt every ADC score), or any intermediate state at all. Returns
    the drift report (centroid shift, occupancy skew before/after).

    Determinism contract (the q_llm_ivfpq_retrain oracle):
    retrain(build(base) + upsert(batch), corpus=base ∪ batch) is
    bit-identical (centroids, codebooks) and row-identical (codes) to a
    FRESH :func:`ivfpq_build_index` on base ∪ batch with the same seed.
    Atomic generation commit (single-writer via the store lease; local
    paths — the publish is a pointer flip)."""
    from flink_quickstart_spark.operators.similarity import _train_centroids

    with store_generation(
        path,
        "ivfpq_retrain_index",
        replace_subdirs=("codes", "centroids", "codebooks"),
    ) as gen:
        old_cents, old_books = load_ivfpq_artifacts(spark, path)
        kc = n_clusters if n_clusters is not None else len(old_cents)
        mm = m if m is not None else old_books.shape[0]
        kk = k if k is not None else old_books.shape[1]

        occ_rows = (
            read_store(spark, path, "codes")
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        occ_before = {int(r.cluster_id): int(r.n) for r in occ_rows}
        n_stored = sum(occ_before.values())
        n_corpus = corpus.count()
        if n_corpus != n_stored:
            raise ValueError(
                f"ivfpq_retrain_index: corpus has {n_corpus} rows but the "
                f"store holds {n_stored} codes — retrain must be given the "
                "store's exact logical content (build inputs ∪ upserts ∖ "
                "deletes), or the store would silently fork from its corpus."
            )

        new_cents = _train_centroids(
            corpus, id_col, vec_col, kc, seed, kmeans_iters, sample_rows
        )
        sample = (
            corpus.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample_rows)
            .toPandas()
        )
        mat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        resid = mat - new_cents[np.argmax(mat @ new_cents.T, axis=1)]
        new_books = _train_subspace_codebooks(
            resid, mm, kk, seed, pq_iters, "ivfpq_retrain_index"
        )

        # all three subdirs are replaced, so they are written fresh into
        # the staged generation (replace_subdirs skipped the clone) —
        # the former staging/trash rename dance is subsumed by the
        # atomic generation publish
        extras = _store_extra_cols(spark, path, id_col)
        (
            _ivfpq_encode_df(
                corpus, new_cents, new_books, id_col, vec_col, extras
            )
            .write.mode("overwrite")
            .partitionBy("cluster_id")
            .parquet(os.path.join(gen, "codes"))
        )
        spark.createDataFrame(
            [(int(i), [float(x) for x in c]) for i, c in enumerate(new_cents)],
            "cluster_id int, centroid array<double>",
        ).write.mode("overwrite").parquet(os.path.join(gen, "centroids"))
        spark.createDataFrame(
            [
                (int(s), int(c), [float(x) for x in new_books[s, c]])
                for s in range(new_books.shape[0])
                for c in range(new_books.shape[1])
            ],
            "subspace int, code int, centroid array<double>",
        ).write.mode("overwrite").parquet(os.path.join(gen, "codebooks"))

        occ_after = {
            int(r.cluster_id): int(r.n)
            for r in spark.read.parquet(os.path.join(gen, "codes"))
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        sims = old_cents @ new_cents.T
        shift = 1.0 - sims.max(axis=1)

        def _skew(occ: dict[int, int]) -> float:
            if not occ:
                return 0.0
            vals = list(occ.values())
            return max(vals) / (sum(vals) / len(vals))

        return {
            "n_clusters": int(len(new_cents)),
            "n_codes": int(sum(occ_after.values())),
            "centroid_shift_mean": float(np.round(shift.mean(), 6)),
            "centroid_shift_max": float(np.round(shift.max(), 6)),
            "occupancy_skew_before": float(np.round(_skew(occ_before), 4)),
            "occupancy_skew_after": float(np.round(_skew(occ_after), 4)),
        }


__all__ = [
    "pq_train_codebooks",
    "pq_encode_df",
    "pq_build_index",
    "pq_upsert_index",
    "pq_delete_index",
    "pq_decode_df",
    "pq_query_index",
    "load_codebooks",
    "ivfpq_build_index",
    "ivfpq_query_index",
    "ivfpq_upsert_index",
    "ivfpq_delete_index",
    "ivfpq_retrain_index",
    "load_ivfpq_artifacts",
]
