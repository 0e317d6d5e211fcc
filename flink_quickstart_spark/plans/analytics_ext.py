"""Round-4 analytics extensions — embedding second-moment statistics
(covariance, PCA), retrieval fusion (RRF), data-quality audits
(Benford), rollup GROUPING_ID, training-example materialization
(chunk stitching, span corruption), the nearest-direction as-of join,
CUPED experiment readouts, calendar-function tier two, and the REAL
multimodal keys (PPM pixel stats, dHash, WAV audio features, y4m
frame sampling). Reference surface [PK]: none of these exist in the
canonical Flink quickstart (checkout empty — SURVEY.md §0); they
belong to the LLM-data-pipeline mandate (BASELINE.json north star)
and the DQ/experimentation tiers a production corpus pipeline runs
alongside it.

House rules as everywhere: JVM-side Column expressions in the hot path,
partial+final aggregation shapes, broadcast for anything dim-sized, and
a DuckDB oracle per key (exact value or deterministic contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_quickstart_spark.plans.registry import register, tables

DIMS = 64


@register(
    "q_embed_covariance",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    SELECT a.i AS di, b.i AS dj,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(a.x * b.x) - avg(a.x) * avg(b.x), 6) + 0.0 AS cov
    FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
    tags=("batch", "llm", "similarity", "profiling"),
)
def q_embed_covariance(spark, sf_dir):
    """LLM-ext: the upper-triangle covariance matrix of the embedding
    corpus — the second-moment summary behind PCA/whitening/Mahalanobis
    and the drift monitor that catches correlated-dimension collapse
    (q_embed_dim_stats sees marginals only). Population covariance from
    raw moments, identical formula on both engines, rounded to 6.

    Scale shape: each row expands to its dims·(dims+1)/2 = 2080 upper-
    triangle products as ONE FLAT DOUBLE ARRAY inside a generator
    expression (plain-double codegen, no per-pair structs; no self-join
    of the exploded table — the oracle's join form would shuffle
    |corpus|·dims rows, this shuffles only the 2080 partial aggregates
    per partition thanks to map-side combine). The (pos → di, dj)
    triangle decoding and the per-dimension means attach afterwards as
    broadcast joins against CONSTANT-size tables (2080 and 64 rows).
    Output is constant regardless of corpus: 100 TB of vectors → one
    pass, one tiny shuffle, a 2080-row matrix."""
    t = tables(spark, sf_dir)
    emb = t.embeddings.select(
        F.col("embedding").cast("array<double>").alias("e")
    )
    prods = F.expr(
        f"""flatten(transform(sequence(0, {DIMS - 1}), i ->
            transform(sequence(i, {DIMS - 1}), j -> e[i] * e[j])))"""
    )
    sums = (
        emb.select(F.posexplode(prods).alias("pos", "prod"))
        .groupBy("pos")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("prod").alias("e_prod"))
    )
    # constant lookup tables: triangle position -> (di, dj), dim -> mean
    tri = [
        (pos, i + 1, j + 1)
        for pos, (i, j) in enumerate(
            (i, j) for i in range(DIMS) for j in range(i, DIMS)
        )
    ]
    tri_df = spark.createDataFrame(tri, "pos int, di bigint, dj bigint")
    means = (
        emb.select(F.posexplode("e").alias("d", "x"))
        .groupBy("d")
        .agg(F.avg("x").alias("mean_x"))
    )
    m1 = means.select(
        (F.col("d") + 1).alias("di"), F.col("mean_x").alias("mi")
    )
    m2 = means.select(
        (F.col("d") + 1).alias("dj"), F.col("mean_x").alias("mj")
    )
    return (
        sums.join(F.broadcast(tri_df), "pos")
        .join(F.broadcast(m1), "di")
        .join(F.broadcast(m2), "dj")
        .select(
            "di",
            "dj",
            "n",
            # + 0.0 canonicalizes IEEE -0.0 to +0.0 (engines disagree on
            # the sign of a rounded-to-zero covariance)
            (
                F.round(F.col("e_prod") - F.col("mi") * F.col("mj"), 6)
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


@register(
    "q_embed_pca_project",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_projected,
           4 AS k,
           true AS orthonormal,
           true AS eigs_sorted,
           true AS projected_var_matches_eigs,
           true AS explained_frac_valid
    FROM embeddings
    """,
    tags=("batch", "llm", "similarity"),
)
def q_embed_pca_project(spark, sf_dir):
    """LLM-ext: PCA projection of the embedding corpus onto its top-4
    principal components — the dimensionality-reduction step before
    cheap clustering/visualization/indexing. Eigendecomposition is not
    SQL-expressible, so the oracle is a DETERMINISTIC CONTRACT (the
    repo's accuracy-contract pattern, cf. q_llm_ann_ivf): the builder
    emits one row of independently computed checks that must all hold —
    every projected row accounted for, basis orthonormal, eigenvalues
    sorted, and the DISTRIBUTED per-component variance of the projected
    coordinates matching the driver-side eigenvalues within 1% (the
    end-to-end proof that the broadcast projection applied to the corpus
    realizes the covariance model). Hash-match fails iff any check
    fails.

    Scale shape: the covariance reduction is a one-pass constant-output
    aggregate; its dims²-scalar result (an O(dims²) driver collect —
    aggregate-sized, waived in plan_audit) is eigendecomposed on the
    driver (64×64, microseconds) and the top-k basis returns as a
    broadcast closure; projection itself is map-side — no shuffle.
    Exactly how a 100 TB corpus gets a PCA: reduce, solve small,
    broadcast back.

    r13-opt (guide §4.2): both passes are ``mapInArrow`` partial
    reductions — one BLAS ``Mᵀ M`` / projection matmul per Arrow batch
    emitting a single partial row — replacing the 2080-struct-per-row
    explode (52 M structs through a hash aggregate at sf0.1) and the
    per-row ``zip_with``/``aggregate`` expression folds. Driver-side
    combination of the per-batch partials is aggregate-sized (a few
    rows × dims² doubles). Float summation order changes; every
    consumer of those floats is a contract check with a 1e-8/1 % band,
    and none of the floats reach the output (booleans + exact count)."""
    import numpy as np
    import pyarrow as pa

    from flink_quickstart_spark.sources.tables import spread_unsplittable

    t = tables(spark, sf_dir)
    # r12-opt (guide §2.5): row-group-adaptive spread (no-op on a
    # multi-file corpus) parallelizes the reduction over a single-row-
    # group input.
    emb = spread_unsplittable(t.embeddings, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e")
    )

    def _batch_matrix(batch: "pa.RecordBatch") -> "np.ndarray":
        col = batch.column(0)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        if flat.size == batch.num_rows * DIMS:
            return flat.reshape(-1, DIMS)
        # ragged/null fallback — not expected on this corpus
        return np.asarray(col.to_pylist(), dtype=np.float64).reshape(
            -1, DIMS
        )

    def _moments(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            m = _batch_matrix(b)
            yield pa.RecordBatch.from_pydict(
                {
                    "n": pa.array([m.shape[0]], pa.int64()),
                    "s_x": pa.array(
                        [m.sum(axis=0).tolist()], pa.list_(pa.float64())
                    ),
                    "s_xx": pa.array(
                        [(m.T @ m).ravel().tolist()], pa.list_(pa.float64())
                    ),
                }
            )

    parts = emb.mapInArrow(
        _moments, "n bigint, s_x array<double>, s_xx array<double>"
    ).collect()
    n = sum(r["n"] for r in parts)
    mean = sum(np.asarray(r["s_x"]) for r in parts) / n
    raw = sum(np.asarray(r["s_xx"]).reshape(DIMS, DIMS) for r in parts) / n
    cov = raw - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:4]
    top_eigs = eigvals[order]
    basis = eigvecs[:, order]  # 64×4
    # deterministic sign: first nonzero component of each vector positive
    for c in range(basis.shape[1]):
        nz = np.flatnonzero(np.abs(basis[:, c]) > 1e-12)
        if len(nz) and basis[nz[0], c] < 0:
            basis[:, c] = -basis[:, c]

    orthonormal = bool(
        np.max(np.abs(basis.T @ basis - np.eye(4))) < 1e-8
    )
    eigs_sorted = bool(np.all(np.diff(top_eigs) <= 1e-12))
    trace = float(np.trace(cov))
    explained = float(top_eigs.sum()) / trace if trace > 0 else 0.0

    # distributed check: the broadcast basis applied to the corpus must
    # realize the covariance model — per-component variance of the
    # PROJECTED coordinates matches the driver-side eigenvalues. Same
    # partial-reduction shape: one (M−mean)·basis matmul per batch.
    mean_c, basis_c = mean.copy(), basis.copy()

    def _proj_stats(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            p = (_batch_matrix(b) - mean_c) @ basis_c  # rows × 4
            yield pa.RecordBatch.from_pydict(
                {
                    "n": pa.array([p.shape[0]], pa.int64()),
                    "s_p": pa.array(
                        [p.sum(axis=0).tolist()], pa.list_(pa.float64())
                    ),
                    "s_pp": pa.array(
                        [(p * p).sum(axis=0).tolist()],
                        pa.list_(pa.float64()),
                    ),
                }
            )

    pstats = emb.mapInArrow(
        _proj_stats, "n bigint, s_p array<double>, s_pp array<double>"
    ).collect()
    n_proj = sum(r["n"] for r in pstats)
    s_p = sum(np.asarray(r["s_p"]) for r in pstats)
    s_pp = sum(np.asarray(r["s_pp"]) for r in pstats)
    proj_var = s_pp / n_proj - (s_p / n_proj) ** 2
    var_ok = all(
        abs(proj_var[c] - top_eigs[c]) <= 0.01 * max(top_eigs[c], 1e-12)
        for c in range(4)
    )
    return spark.createDataFrame(
        [
            (
                int(n_proj),
                4,
                orthonormal,
                eigs_sorted,
                bool(var_ok),
                bool(0.0 < explained <= 1.0 + 1e-12),
            )
        ],
        "n_projected bigint, k int, orthonormal boolean, "
        "eigs_sorted boolean, projected_var_matches_eigs boolean, "
        "explained_frac_valid boolean",
    )


@register(
    "q_dq_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
    ),
    tot AS (SELECT sum(n) AS t FROM c)
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / t, 6) AS frac,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_frac,
           round(abs(CAST(n AS DOUBLE) / t - log10(1.0 + 1.0 / digit)), 6)
             AS abs_dev
    FROM c CROSS JOIN tot
    """,
    tags=("batch", "agg", "dq"),
)
def q_dq_benford(spark, sf_dir):
    """DQ-ext: Benford's-law audit of the order-amount column — the
    classic fabricated-data / unit-mix detector: the observed first-
    significant-digit distribution against log10(1 + 1/d), with the
    per-digit absolute deviation. Real transactional amounts track
    Benford; a synthetic or truncated feed shows up as a flat or spiked
    digit histogram long before any downstream model does.

    Scale shape: digit extraction is a per-row expression, then one
    9-group hash aggregate (partial+final); the total joins back as a
    1-row broadcast scalar. Constant output, linear scan, no wide
    shuffle — runnable on every ingest batch at any scale."""
    t = tables(spark, sf_dir)
    d = (
        t.orders.where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = d.agg(F.sum("n").alias("t"))
    frac = F.col("n").cast("double") / F.col("t")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(frac, 6).alias("frac"),
            F.round(benford, 6).alias("benford_frac"),
            F.round(F.abs(frac - benford), 6).alias("abs_dev"),
        )
    )


@register(
    "q_sql_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
             AS gid,
           CASE CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
                WHEN 0 THEN 'status+priority'
                WHEN 1 THEN 'status'
                ELSE 'grand total' END AS level,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    tags=("batch", "agg", "sql"),
)
def q_sql_grouping_id(spark, sf_dir):
    """D6-ext: GROUPING_ID over a rollup — the disambiguation bit-vector
    that separates "subtotal row" from "the group value happened to be
    NULL" (the reason report writers use GROUPING(), not IS NULL, to
    label rollup levels). Spark's ``grouping_id()`` and DuckDB's
    ``GROUPING()`` produce the same bit encoding (1 bit per rolled-up
    column, most-significant first), compared exactly, with a derived
    human-readable level label.

    Scale shape: Catalyst plans rollup as Expand (3 rows per input here)
    feeding one partial+final hash aggregate — the same single-shuffle
    cost as a plain grouped agg, multiplied by the rollup depth."""
    t = tables(spark, sf_dir)
    return (
        t.orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "gid",
            F.when(F.col("gid") == 0, F.lit("status+priority"))
            .when(F.col("gid") == 1, F.lit("status"))
            .otherwise(F.lit("grand total"))
            .alias("level"),
            "n",
            "revenue",
        )
    )


STITCH_OVERLAP = 10  # q_llm_chunk's stride-40/window-50 overlap width


@register(
    "q_llm_chunk_stitch",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
      FROM documents
    ), st AS (
      SELECT doc_id, t, unnest(range(0, len(t), 40)) AS start
      FROM toks WHERE len(t) > 0
    ), chunks AS (
      SELECT doc_id, CAST(start // 40 AS BIGINT) AS chunk_id,
             array_slice(t, start + 1, start + 50) AS c
      FROM st
    ), fp AS (
      SELECT doc_id, chunk_id,
             CAST(len(c) AS BIGINT) AS n_tok,
             array_to_string(array_slice(c, 1, {STITCH_OVERLAP}), ' ')
               AS head_fp,
             array_to_string(
               array_slice(c, greatest(len(c) - {STITCH_OVERLAP} + 1, 1),
                           len(c)), ' ') AS tail_fp
      FROM chunks
    )
    SELECT a.doc_id AS d1, a.chunk_id AS c1,
           b.doc_id AS d2, b.chunk_id AS c2,
           CASE WHEN a.doc_id = b.doc_id AND b.chunk_id = a.chunk_id + 1
                THEN 1 ELSE 0 END AS true_adjacent
    FROM fp a JOIN fp b ON a.tail_fp = b.head_fp
    WHERE a.n_tok = 50 AND b.n_tok >= {STITCH_OVERLAP}
      AND NOT (a.doc_id = b.doc_id AND a.chunk_id = b.chunk_id)
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_chunk_stitch(spark, sf_dir):
    """LLM-ext: chunk-boundary stitching — given a chunked corpus (the
    q_llm_chunk output shape: 50-token windows, stride 40, 10-token
    overlap), recover which chunk follows which by matching each full
    chunk's 10-token TAIL fingerprint against every chunk's 10-token
    HEAD fingerprint. ``true_adjacent`` labels whether the stitch is the
    genuine successor — the false-stitch rate is precisely the
    boilerplate-collision rate a re-assembly pipeline must handle when
    provenance metadata is lost.

    Scale shape: fingerprints are per-chunk expressions; the stitch
    discovery is ONE hash equi-join on the overlap string (never an
    all-pairs comparison); output is bounded by fingerprint collisions.
    The same shape at 100 TB: explode to chunks, two narrow columns,
    one bucketed join."""
    t = tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    docs = t.documents.select("doc_id", toks.alias("t")).where(F.size("t") > 0)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("t") - 1, F.lit(0)), F.lit(40)
    )
    chunk = F.slice(F.col("t"), F.col("start") + 1, 50)
    fp = (
        docs.select("doc_id", "t", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / 40).cast("long").alias("chunk_id"),
            chunk.alias("c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("c").cast("long").alias("n_tok"),
            F.array_join(F.slice("c", 1, STITCH_OVERLAP), " ").alias(
                "head_fp"
            ),
            F.array_join(
                F.slice(
                    F.col("c"),
                    F.greatest(
                        F.size("c") - STITCH_OVERLAP + 1, F.lit(1)
                    ),
                    STITCH_OVERLAP,
                ),
                " ",
            ).alias("tail_fp"),
        )
    )
    a = fp.where(F.col("n_tok") == 50).select(
        F.col("doc_id").alias("d1"),
        F.col("chunk_id").alias("c1"),
        F.col("tail_fp").alias("fp"),
    )
    b = fp.where(F.col("n_tok") >= STITCH_OVERLAP).select(
        F.col("doc_id").alias("d2"),
        F.col("chunk_id").alias("c2"),
        F.col("head_fp").alias("fp"),
    )
    return (
        a.join(b, "fp")
        .where(~((F.col("d1") == F.col("d2")) & (F.col("c1") == F.col("c2"))))
        .select(
            "d1",
            "c1",
            "d2",
            "c2",
            F.when(
                (F.col("d1") == F.col("d2"))
                & (F.col("c2") == F.col("c1") + 1),
                1,
            )
            .otherwise(0)
            .alias("true_adjacent"),
        )
    )


SPAN_STRIDE = 20  # one 3-token masked span per 20 tokens ≈ 15% corruption
SPAN_LEN = 3


@register(
    "q_llm_span_mask",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
      FROM documents
    )
    SELECT doc_id,
           array_to_string(list_filter(
             list_transform(range(1, len(t) + 1), i ->
               CASE WHEN (i - 1) % {SPAN_STRIDE} = 0
                    THEN '<extra_id_' || CAST((i - 1) // {SPAN_STRIDE}
                                              AS VARCHAR) || '>'
                    WHEN (i - 1) % {SPAN_STRIDE} < {SPAN_LEN} THEN ''
                    ELSE t[i] END),
             w -> w <> ''), ' ') AS masked_text,
           array_to_string(list_filter(
             list_transform(range(1, len(t) + 1), i ->
               CASE WHEN (i - 1) % {SPAN_STRIDE} = 0
                    THEN '<extra_id_' || CAST((i - 1) // {SPAN_STRIDE}
                                              AS VARCHAR) || '> ' || t[i]
                    WHEN (i - 1) % {SPAN_STRIDE} < {SPAN_LEN} THEN t[i]
                    ELSE '' END),
             w -> w <> ''), ' ') AS target_text,
           CAST(len(list_filter(range(1, len(t) + 1),
                                i -> (i - 1) % {SPAN_STRIDE} < {SPAN_LEN}))
                AS BIGINT) AS n_masked
    FROM toks WHERE len(t) > 0
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_span_mask(spark, sf_dir):
    """LLM-ext: deterministic T5-style span corruption — every 20-token
    stride masks a 3-token span (≈15% corruption): the masked input
    replaces each span with one ``<extra_id_k>`` sentinel, the target
    sequence lists each sentinel followed by the tokens it hides. A real
    pipeline randomizes span starts per epoch; the REGISTERED form pins
    them to the stride grid so both engines produce byte-identical
    output (swap the grid for a seeded hash of (doc_id, span) for
    production randomness — same plan).

    Scale shape: pure per-row array expressions (indexed transform →
    filter → join) — no shuffle, no UDF, embarrassingly parallel;
    exactly the map-only job span corruption should be at 100 TB."""
    t = tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    docs = t.documents.select("doc_id", toks.alias("t")).where(F.size("t") > 0)
    masked = F.expr(
        f"""array_join(filter(transform(t, (w, i) ->
            CASE WHEN i % {SPAN_STRIDE} = 0
                 THEN concat('<extra_id_', CAST(i DIV {SPAN_STRIDE}
                                                AS STRING), '>')
                 WHEN i % {SPAN_STRIDE} < {SPAN_LEN} THEN ''
                 ELSE w END),
            w -> w != ''), ' ')"""
    )
    target = F.expr(
        f"""array_join(filter(transform(t, (w, i) ->
            CASE WHEN i % {SPAN_STRIDE} = 0
                 THEN concat('<extra_id_', CAST(i DIV {SPAN_STRIDE}
                                                AS STRING), '> ', w)
                 WHEN i % {SPAN_STRIDE} < {SPAN_LEN} THEN w
                 ELSE '' END),
            w -> w != ''), ' ')"""
    )
    n_masked = F.expr(
        f"size(filter(sequence(0, size(t) - 1), "
        f"i -> i % {SPAN_STRIDE} < {SPAN_LEN}))"
    ).cast("bigint")
    return docs.select(
        "doc_id",
        masked.alias("masked_text"),
        target.alias("target_text"),
        n_masked.alias("n_masked"),
    )


@register(
    "q_join_asof_nearest",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS c_id, user_id, ts, epoch_us(ts) AS c_us
          FROM events WHERE event_type = 'click'),
    b AS (SELECT p.event_id, cb.c_id AS b_id, cb.c_us AS b_us
          FROM p ASOF LEFT JOIN c cb
            ON p.user_id = cb.user_id AND p.ts >= cb.ts),
    f AS (SELECT p.event_id, cf.c_id AS f_id, cf.c_us AS f_us
          FROM p ASOF LEFT JOIN c cf
            ON p.user_id = cf.user_id AND p.ts < cf.ts)
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           CASE WHEN b_id IS NOT NULL AND (f_id IS NULL
                     OR epoch_us(p.ts) - b_us <= f_us - epoch_us(p.ts))
                THEN b_id ELSE f_id END AS click_id,
           CASE WHEN b_id IS NOT NULL AND (f_id IS NULL
                     OR epoch_us(p.ts) - b_us <= f_us - epoch_us(p.ts))
                THEN b_us ELSE f_us END AS click_ts_us,
           CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                WHEN b_id IS NOT NULL AND (f_id IS NULL
                     OR epoch_us(p.ts) - b_us <= f_us - epoch_us(p.ts))
                THEN 'backward' ELSE 'forward' END AS direction
    FROM p JOIN b ON p.event_id = b.event_id
           JOIN f ON p.event_id = f.event_id
    """,
    tags=("batch", "join"),
)
def q_join_asof_nearest(spark, sf_dir):
    """C10-ext: NEAREST as-of join — each purchase gets the click closest
    in time in EITHER direction (the sensor-alignment / attribution
    semantics when causality can run both ways), ties and exact-equal
    timestamps resolving backward. Oracle = two native DuckDB ASOF
    joins (backward non-strict, forward strict) fused by a gap CASE —
    the same tie policy as the operator.

    Scale shape: one shuffle on user_id, one window sort serving both
    the running-last (backward) and running-first (forward) candidate
    fills (:func:`operators.joins.asof_join_nearest`) — linear, no
    range-join candidate pairs."""
    from flink_quickstart_spark.operators.joins import asof_join_nearest

    t = tables(spark, sf_dir)
    purchases = t.events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = t.events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join_nearest(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id"],
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("r_event_id").alias("click_id"),
        F.unix_micros("r_ts").alias("click_ts_us"),
        "direction",
    )


PPM_SIDE = 16  # 16×16 RGB → 768 pixel bytes per image


@register(
    "q_multimodal_ppm_stats",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, length(text) AS n,
             unnest(range(0, {PPM_SIDE * PPM_SIDE * 3})) AS p
      FROM documents WHERE length(text) > 0
    ),
    b AS (
      SELECT doc_id, CAST(p % 3 AS BIGINT) AS channel,
             ascii(substr(text, CAST((p % n) + 1 AS INT), 1)) AS byte
      FROM px JOIN documents USING (doc_id)
    )
    SELECT doc_id, channel,
           CAST(sum(byte) AS BIGINT) AS sum_byte,
           CAST(min(byte) AS BIGINT) AS min_byte,
           CAST(max(byte) AS BIGINT) AS max_byte
    FROM b GROUP BY doc_id, channel
    """,
    tags=("batch", "llm", "multimodal"),
)
def q_multimodal_ppm_stats(spark, sf_dir):
    """K8 made REAL: encode each document into a genuine binary-PPM
    image (utf-8 bytes cycled into a 16×16 RGB raster, distributed
    ``mapInPandas`` encode), then DECODE THE ACTUAL IMAGE BYTES with the
    pure-numpy P6 codec and report per-channel pixel statistics. The
    oracle recomputes every pixel independently from the text (ASCII
    corpus ⇒ byte == codepoint), so a hash match proves the binary
    encode → Arrow transfer → header parse → frombuffer decode round
    trip is bit-exact — no codec library involved, no deterministic
    fake. Compressed codecs remain the pluggable stub tier.

    Scale shape: two map-only Arrow stages (encode, decode+stats) and
    one hash aggregate onto 3 rows per image — linear in corpus bytes,
    payload column pruned for any metadata-only consumer."""
    from flink_quickstart_spark.operators.multimodal import (
        attach_ppm_media,
        decode_ppm,
    )
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    t = tables(spark, sf_dir)
    media = attach_ppm_media(t.documents, "doc_id", "text", side=PPM_SIDE)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_ppm(payload).astype(np.int64)
                for ch in range(3):
                    c = px[:, :, ch]
                    rows.append(
                        (int(mid), ch, int(c.sum()), int(c.min()), int(c.max()))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "channel", "sum_byte", "min_byte", "max_byte"
                ],
            )

    return media.mapInPandas(
        stats,
        "doc_id bigint, channel bigint, sum_byte bigint, "
        "min_byte bigint, max_byte bigint",
    )


WAV_N = 2048  # samples per synthesized clip (operators/multimodal.py)


@register(
    "q_multimodal_wav_stats",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST(p AS BIGINT) AS p,
             ascii(substr(text, CAST((p % length(text)) + 1 AS INT), 1))
               - 128 AS c
      FROM (SELECT doc_id, text, unnest(range(0, {WAV_N})) AS p
            FROM documents WHERE length(text) > 0)
    ),
    lagd AS (
      SELECT doc_id, c,
             lag(c) OVER (PARTITION BY doc_id ORDER BY p) AS prev
      FROM s
    )
    SELECT doc_id,
           CAST({WAV_N} AS BIGINT) AS n_samples,
           CAST(sum(c * c) AS BIGINT) AS sum_sq,
           CAST(sum(CASE WHEN c * prev < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_cross,
           CAST(max(abs(c)) AS BIGINT) AS peak_abs
    FROM lagd GROUP BY doc_id
    """,
    tags=("batch", "llm", "multimodal"),
)
def q_multimodal_wav_stats(spark, sf_dir):
    """K8 audio tier made REAL: encode each document into a genuine
    RIFF/WAV 16-bit-mono PCM clip (2048 samples, distributed
    ``mapInPandas`` encode), DECODE THE ACTUAL CONTAINER — RIFF magic,
    fmt chunk walk, little-endian frombuffer — and report real audio
    features: energy (integer-exact sum of squares of the centered
    samples), zero-crossing count, and peak amplitude. The oracle
    recomputes every sample from the source bytes, so a hash match
    certifies the full binary audio round trip with no codec library.

    Scale shape: two map-only Arrow stages and a per-clip O(1) feature
    row — linear in corpus bytes; the same envelope as the image tier."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from flink_quickstart_spark.operators.multimodal import (
        attach_wav_media,
        decode_wav,
    )

    t = tables(spark, sf_dir)
    media = attach_wav_media(t.documents, "doc_id", "text")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, samples = decode_wav(payload)
                c = samples.astype(np.int64) // 256  # undo ×256 scaling
                cross = int(((c[1:] * c[:-1]) < 0).sum())
                rows.append(
                    (
                        int(mid),
                        len(c),
                        int((c * c).sum()),
                        cross,
                        int(np.abs(c).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sum_sq", "n_zero_cross", "peak_abs"
                ],
            )

    return media.mapInPandas(
        stats,
        "doc_id bigint, n_samples bigint, sum_sq bigint, "
        "n_zero_cross bigint, peak_abs bigint",
    )


Y4M_PLANE = 16 * 16  # bytes per plane; frame stride = 3 * plane


@register(
    "q_multimodal_video_frames",
    oracle=f"""
    WITH fr AS (
      SELECT doc_id, text, length(text) AS n,
             unnest([0, 2]) AS frame_no
      FROM documents WHERE length(text) > 0
    ),
    px AS (
      SELECT doc_id, frame_no,
             ascii(substr(text,
               CAST(((frame_no * {3 * Y4M_PLANE} + p) % n) + 1 AS INT), 1))
               AS y
      FROM fr, unnest(range(0, {Y4M_PLANE})) AS u(p)
    )
    SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
           CAST(sum(y) AS BIGINT) AS luma_sum,
           CAST(min(y) AS BIGINT) AS luma_min,
           CAST(max(y) AS BIGINT) AS luma_max
    FROM px GROUP BY doc_id, frame_no
    """,
    tags=("batch", "llm", "multimodal"),
)
def q_multimodal_video_frames(spark, sf_dir):
    """K8 video tier made REAL: encode each document into a genuine
    YUV4MPEG2 clip (4 frames, 16×16 C444 — the ffmpeg-pipe interchange
    container), DECODE THE ACTUAL STREAM — header tags, FRAME markers,
    plane frombuffer — then frame-sample every 2nd frame and report
    per-frame luma-plane statistics (integer-exact sum/min/max). The
    oracle recomputes every sampled luma byte from the source text, so
    the hash match certifies container parse + frame indexing + plane
    extraction end to end. This upgrades q_multimodal_framesample's
    metadata-only plan into real frame decode.

    Scale shape: encode and decode+sample are map-only Arrow stages;
    sampling drops frames BEFORE any per-pixel work, the
    explode-before-decode discipline at real scale; output is two rows
    per clip."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from flink_quickstart_spark.operators.multimodal import (
        attach_y4m_media,
        decode_y4m,
    )

    t = tables(spark, sf_dir)
    media = attach_y4m_media(t.documents, "doc_id", "text")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _fps, frames = decode_y4m(payload)
                for fno in range(0, frames.shape[0], 2):  # sample stride 2
                    luma = frames[fno, 0].astype(np.int64)
                    rows.append(
                        (
                            int(mid),
                            fno,
                            int(luma.sum()),
                            int(luma.min()),
                            int(luma.max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_no", "luma_sum", "luma_min", "luma_max"],
            )

    return media.mapInPandas(
        stats,
        "doc_id bigint, frame_no bigint, luma_sum bigint, "
        "luma_min bigint, luma_max bigint",
    )


@register(
    "q_fn_datetime_extended",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start,
           CAST(CAST(o_orderdate AS DATE)
                + ((7 + 1 - CAST(isodow(o_orderdate) AS INT) - 1)
                   % 7 + 1) AS DATE) AS next_monday
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("batch", "function"),
)
def q_fn_datetime_extended(spark, sf_dir):
    """H2b: the second date/time tier — calendar arithmetic beyond
    q_fn_datetime: month-offset with end-of-month clamping (add_months
    ≡ ``+ INTERVAL``), last_day, quarter, ISO week, day-of-year,
    quarter truncation, and next-Monday (Spark's ``next_day`` vs an
    explicit isodow formula on the oracle — the strictly-after
    convention is asserted equal across engines). All per-row JVM
    expressions; predicate pushed to the scan.

    Scale shape: pure map — no shuffle, codegen end to end."""
    t = tables(spark, sf_dir)
    return t.orders.where(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).alias("plus3m"),
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
        F.dayofyear("o_orderdate").cast("bigint").alias("doy"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("qtr_start"),
        F.next_day("o_orderdate", "Mon").alias("next_monday"),
    )


@register(
    "q_ab_cuped",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value
                      ELSE 0 END) AS pre,
             sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value
                      ELSE 0 END) AS post
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT avg(pre) AS ex, avg(post) AS ey,
             avg(pre * post) AS exy, avg(pre * pre) AS exx
      FROM u
    ),
    adj AS (
      SELECT variant, post,
             post - ((exy - ex * ey) / (exx - ex * ex)) * (pre - ex) AS a
      FROM u CROSS JOIN g
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(post), 6) AS mean_post,
           round(avg(a), 6) AS mean_adj,
           round(avg(post * post) - avg(post) * avg(post), 6) AS var_post,
           round(avg(a * a) - avg(a) * avg(a), 6) AS var_adj,
           round(1.0 - (avg(a * a) - avg(a) * avg(a))
                       / (avg(post * post) - avg(post) * avg(post)), 6)
             AS var_reduction
    FROM adj GROUP BY variant
    """,
    tags=("batch", "agg", "experiment"),
)
def q_ab_cuped(spark, sf_dir):
    """D-ext: CUPED variance reduction — the standard experimentation
    technique: regress each user's experiment-period metric on their
    PRE-period metric (theta = cov(pre, post)/var(pre), pooled across
    variants), subtract the predictable component, and read out the
    adjusted means whose variance — and hence the experiment's required
    sample size — drops by the squared correlation. Identical raw-
    moment formulas on both engines (population moments written out,
    no engine covar/var builtins); the mid-month cut is the pre/post
    boundary and user_id%2 the assignment, both deterministic.

    Scale shape: one hash aggregate to per-user (pre, post), one 1-row
    global moment aggregate broadcast back (waived scalar cross), one
    final 2-group aggregate. Linear, two narrow shuffles — the shape a
    100 TB experiment readout must have."""
    t = tables(spark, sf_dir)
    cut = F.lit("2024-01-16").cast("timestamp")
    u = t.events.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias(
            "pre"
        ),
        F.sum(
            F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)
        ).alias("post"),
    ).select(
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("variant"),
        "pre",
        "post",
    )
    g = u.agg(
        F.avg("pre").alias("ex"),
        F.avg("post").alias("ey"),
        F.avg(F.col("pre") * F.col("post")).alias("exy"),
        F.avg(F.col("pre") * F.col("pre")).alias("exx"),
    )
    theta = (F.col("exy") - F.col("ex") * F.col("ey")) / (
        F.col("exx") - F.col("ex") * F.col("ex")
    )
    a = F.col("post") - theta * (F.col("pre") - F.col("ex"))
    adj = u.crossJoin(F.broadcast(g)).select("variant", "post", a.alias("a"))
    pvar = F.avg(F.col("post") * F.col("post")) - F.avg("post") * F.avg("post")
    avar = F.avg(F.col("a") * F.col("a")) - F.avg("a") * F.avg("a")
    return adj.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("post"), 6).alias("mean_post"),
        F.round(F.avg("a"), 6).alias("mean_adj"),
        F.round(pvar, 6).alias("var_post"),
        F.round(avar, 6).alias("var_adj"),
        F.round(F.lit(1.0) - avar / pvar, 6).alias("var_reduction"),
    )


def _dhash_oracle_sql() -> str:
    """Generate the exact dHash oracle: for each (row r, col c) of the
    9×8 nearest-neighbor grid over the 16×16 raster, gray = (R+G+B)//3
    of the cycled text bytes; bit (r*8+c) set iff gray[r][c] >
    gray[r][c+1]. Two 32-bit words, identical packing to the Spark
    side. The SQL is mechanical, so it is generated, not hand-written."""
    side = 16
    ys = [(r * side) // 8 for r in range(8)]
    xs = [(c * side) // 9 for c in range(9)]

    def gray(r, c):
        base = (ys[r] * side + xs[c]) * 3
        parts = " + ".join(
            f"ascii(substr(text, CAST(({base + ch} % n) + 1 AS INT), 1))"
            for ch in range(3)
        )
        return f"(({parts}) // 3)"

    def word(lo, hi, shift):
        terms = []
        for b in range(lo, hi):
            r, c = divmod(b, 8)
            terms.append(
                f"CASE WHEN {gray(r, c)} > {gray(r, c + 1)} "
                f"THEN CAST({1 << (b - shift)} AS BIGINT) ELSE 0 END"
            )
        return " + ".join(terms)

    return f"""
    SELECT doc_id,
           CAST({word(0, 32, 0)} AS BIGINT) AS w0,
           CAST({word(32, 64, 32)} AS BIGINT) AS w1
    FROM (SELECT doc_id, text, length(text) AS n FROM documents
          WHERE length(text) > 0)
    """


@register(
    "q_multimodal_dhash",
    oracle=_dhash_oracle_sql(),
    tags=("batch", "llm", "multimodal", "dedup"),
)
def q_multimodal_dhash(spark, sf_dir):
    """K8 dedup tier on REAL pixels: the difference hash (dHash) — the
    standard perceptual fingerprint for near-identical image detection:
    nearest-neighbor sample the decoded image to a 9×8 grayscale grid,
    set bit (r, c) iff the pixel is brighter than its right neighbor,
    pack 64 bits into two 32-bit words (identical split to
    q_embed_sign_bits, so every partial sum is exactly representable).
    Grouping on (w0, w1) — or banding the words for hamming-distance
    buckets — is the image analog of the text near-dup tiers. The
    oracle is GENERATED SQL that recomputes every sampled pixel from
    the source bytes, so the hash match certifies the decode + sampling
    + packing pipeline end to end.

    Scale shape: one Arrow-batched decode+hash stage (vectorized numpy
    per batch), output two ints per image — embarrassingly parallel,
    no shuffle; the dedup group-by downstream is one hash aggregate on
    an 8-byte key."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from flink_quickstart_spark.operators.multimodal import (
        attach_ppm_media,
        decode_ppm,
    )

    t = tables(spark, sf_dir)
    media = attach_ppm_media(t.documents, "doc_id", "text", side=16)
    ys = (np.arange(8) * 16) // 8
    xs = (np.arange(9) * 16) // 9

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_ppm(payload).astype(np.int64)
                gray = px.sum(axis=2) // 3
                grid = gray[np.ix_(ys, xs)]  # 8×9
                bits = (grid[:, :-1] > grid[:, 1:]).astype(np.int64)
                flat = bits.reshape(-1)  # bit b = r*8+c
                w0 = int((flat[:32] << np.arange(32)).sum())
                w1 = int((flat[32:] << np.arange(32)).sum())
                out.append((int(mid), w0, w1))
            yield pd.DataFrame(out, columns=["doc_id", "w0", "w1"])

    return media.mapInPandas(dhash, "doc_id bigint, w0 bigint, w1 bigint")


RRF_K = 60
RRF_TOPN = 50


@register(
    "q_text_rrf_fusion",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id,
             len(text) - len(replace(text, 'data', '')) AS m_data,
             len(text) - len(replace(text, 'model', '')) AS m_model
      FROM documents
    ),
    ra AS (
      SELECT doc_id, row_number() OVER (ORDER BY m_data DESC, doc_id)
               AS rnk
      FROM tf WHERE m_data > 0
      ORDER BY m_data DESC, doc_id LIMIT {RRF_TOPN}
    ),
    rb AS (
      SELECT doc_id, row_number() OVER (ORDER BY m_model DESC, doc_id)
               AS rnk
      FROM tf WHERE m_model > 0
      ORDER BY m_model DESC, doc_id LIMIT {RRF_TOPN}
    ),
    fused AS (
      SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
             round(COALESCE(1.0 / ({RRF_K} + ra.rnk), 0)
                   + COALESCE(1.0 / ({RRF_K} + rb.rnk), 0), 6) AS rrf,
             CAST(COALESCE(ra.rnk, -1) AS BIGINT) AS rank_a,
             CAST(COALESCE(rb.rnk, -1) AS BIGINT) AS rank_b
      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    )
    SELECT doc_id, rrf, rank_a, rank_b
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
    """,
    tags=("batch", "llm", "text", "search"),
)
def q_text_rrf_fusion(spark, sf_dir):
    """LLM-ext: reciprocal-rank fusion of two retrievers — the standard
    zero-tuning way to merge heterogeneous rankings (lexical + semantic,
    or two query variants): each retriever contributes 1/(60 + rank) for
    its top-50, absent docs contribute 0, fused list is the top-20 by
    summed score. Retrievers here are occurrence-count rankings for two
    query terms (substring-match counts — identical, engine-portable
    scoring), ranks made deterministic with the doc_id tiebreak;
    rank -1 encodes "not retrieved by this arm".

    Scale shape: each retriever is a TakeOrderedAndProject top-50 over a
    linear scan (no global sort, no global window over the corpus); the
    rank row_number then runs over the CONSTANT 50-row result (waived in
    plan_audit — input is limit-bounded), and the fusion join is 50×50.
    At 100 TB only the scans grow."""
    t = tables(spark, sf_dir)
    from pyspark.sql import Window

    def matches(term):
        return F.length("text") - F.length(
            F.regexp_replace("text", term, "")
        )

    tf = t.documents.select(
        "doc_id",
        matches("data").alias("m_data"),
        matches("model").alias("m_model"),
    )

    def arm(col):
        top = (
            tf.where(F.col(col) > 0)
            .orderBy(F.col(col).desc(), "doc_id")
            .limit(RRF_TOPN)
        )
        w = Window.orderBy(F.col(col).desc(), "doc_id")
        return top.select(
            "doc_id", F.row_number().over(w).alias("rnk")
        )

    ra = arm("m_data").select(
        F.col("doc_id").alias("a_id"), F.col("rnk").alias("a_rnk")
    )
    rb = arm("m_model").select(
        F.col("doc_id").alias("b_id"), F.col("rnk").alias("b_rnk")
    )
    fused = ra.join(rb, F.col("a_id") == F.col("b_id"), "full_outer").select(
        F.coalesce("a_id", "b_id").alias("doc_id"),
        F.round(
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("a_rnk")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("b_rnk")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        F.coalesce("a_rnk", F.lit(-1)).cast("bigint").alias("rank_a"),
        F.coalesce("b_rnk", F.lit(-1)).cast("bigint").alias("rank_b"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)
