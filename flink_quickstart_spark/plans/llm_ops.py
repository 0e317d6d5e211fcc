"""LLM-data-pipeline query keys (SURVEY.md §2.K): dedup family, embedding
similarity search, text analysis. Mandated beyond the Flink-quickstart
reference surface — these are first-class operators for a 100 TB
training-data pipeline.

Randomized ops (MinHash LSH, random-projection ANN) are seeded for
reproducibility but remain engine-specific, so they register
deterministic CONTRACT oracles (recall / candidate-set predicates the
SQL side can evaluate) rather than value-identity ones. Every exact op
carries a full value-identity DuckDB oracle; no key is rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_quickstart_spark.functions import text as X
from flink_quickstart_spark.operators.dedup import (
    exact_dedup,
    jaccard_neardup_pairs,
    minhash_lsh_verified_pairs,
    simhash64,
    word_shingles,
)
from flink_quickstart_spark.operators.similarity import (
    brute_knn,
    cosine_neardup_pairs,
    ivf_topk,
    lsh_ann_buckets,
)
from flink_quickstart_spark.plans.registry import register, tables


@register(
    "q_llm_dedup_exact",
    oracle="""
    SELECT sha256(text) AS content_sha,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT)    AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_dedup_exact(spark, sf_dir):
    """K1: exact dedup by content hash — one shuffle on the sha256 key."""
    t = tables(spark, sf_dir)
    return exact_dedup(t.documents, "text", "doc_id")


@register(
    "q_llm_neardup",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
           FROM toks WHERE len(w) >= 3),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS n_common
               FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT d1, d2, n_common,
           round(CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common), 6) AS jaccard
    FROM common
    JOIN sizes s1 ON d1 = s1.doc_id
    JOIN sizes s2 ON d2 = s2.doc_id
    WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) >= 0.5
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_neardup(spark, sf_dir):
    """K2: exact n-gram Jaccard near-dup pairs (threshold 0.5) via a
    shingle inverted-index self-join — deterministic, hence sql-oracle.
    The hot-shingle DF cap (the quadratic-candidate guard at 100 TB) is
    enabled but non-binding here: measured max shingle DF is 7 at sf0.01
    / 25 at sf0.1, far below 1000, so results equal the uncapped op."""
    t = tables(spark, sf_dir)
    return jaccard_neardup_pairs(
        t.documents, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=1000
    )


@register(
    "q_llm_neardup_minhash",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
           FROM toks WHERE len(w) >= 3),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS n_common
               FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT d1, d2,
           round(CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common), 6) AS jaccard
    FROM common
    JOIN sizes s1 ON d1 = s1.doc_id
    JOIN sizes s2 ON d2 = s2.doc_id
    WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) >= 0.5
    """,
    tags=("batch", "llm", "dedup", "approx"),
)
def q_llm_neardup_minhash(spark, sf_dir):
    """K2b: MinHash LSH near-dup (seed=42) with the standard verify step
    — the sublinear 100 TB path. LSH generates candidates with a loosened
    signature cutoff; the exact shingle Jaccard is then computed for the
    candidates only (never the full pair matrix) and pairs ≥ 0.5 kept.
    Output values are exact, so the oracle is the exact all-pairs Jaccard
    SQL — a pair the bands miss entirely (P ≤ (1−j)^16 ≈ 1.5e-5 at the
    threshold) would surface as a row-count mismatch. Verified recall
    25/25 at sf0.01."""
    t = tables(spark, sf_dir)
    return minhash_lsh_verified_pairs(t.documents, "doc_id", "text", threshold=0.5)


@register(
    "q_llm_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM toks WHERE tok <> ''
    ), bits AS (
      SELECT doc_id, b,
             sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM hashed, unnest(range(60)) AS t(b)
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_simhash(spark, sf_dir):
    """K2c: SimHash fingerprints with the portable md5-60 token hash —
    the fingerprints themselves value-match the DuckDB oracle (which
    recomputes the full majority-vote from the same md5 bits). The
    xxhash64 flavor (same operator, ``token_hash="xxhash64"``) is the
    cheaper production default; its statistical behavior is identical."""
    t = tables(spark, sf_dir)
    return simhash64(t.documents, "doc_id", "text", token_hash="md5_60")


@register(
    "q_llm_knn",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT query_id, nbr_id, round(sim, 6) AS sim, rank FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS nbr_id,
             list_cosine_similarity(a.e, b.e) AS sim,
             CAST(row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY list_cosine_similarity(a.e, b.e) DESC, b.vec_id)
                  AS BIGINT) AS rank
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ) WHERE rank <= 3
    """,
    tags=("batch", "llm", "similarity", "headline"),
)
def q_llm_knn(spark, sf_dir):
    """K3: exact brute-force cosine top-3 per vector via broadcast-numpy
    ``mapInPandas`` (one BLAS matmul per Arrow batch). The HOF expression
    route measured 185× slower than DuckDB — do not ship it (SURVEY §6)."""
    t = tables(spark, sf_dir)
    return brute_knn(t.embeddings, k=3)


@register(
    "q_llm_neardup_cosine",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT a.vec_id AS d1, b.vec_id AS d2,
           round(list_cosine_similarity(a.e, b.e), 6) AS sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.4
    """,
    tags=("batch", "llm", "dedup", "similarity"),
)
def q_llm_neardup_cosine(spark, sf_dir):
    """K2d: embedding-cosine near-dup pairs (semantic dedup tier) — exact
    pairs with cosine ≥ 0.4 via the broadcast-matrix mapInPandas pattern;
    only above-threshold pairs ever leave the Python worker."""
    t = tables(spark, sf_dir)
    return cosine_neardup_pairs(t.embeddings, threshold=0.4)


@register(
    "q_llm_ann_ivf",
    oracle="""
    SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
           TRUE AS recall_ok
    FROM embeddings
    """,
    tags=("batch", "llm", "similarity", "approx"),
)
def q_llm_ann_ivf(spark, sf_dir):
    """K4b: IVF approximate top-3 — centroid-bucketed search (probe 4 of
    16 clusters), the partition-pruning scale path. Approximate by
    design, so the oracle checks the ACCURACY CONTRACT: global recall@3
    vs the exact brute-force top-3 must be ≥ 0.5 (measured 0.61 on this
    unclustered random data; real corpora with cluster structure recall
    far higher). The oracle asserts the query count and
    ``recall_ok = TRUE`` — a recall collapse flips the boolean."""
    t = tables(spark, sf_dir)
    brute = brute_knn(t.embeddings, k=3).select("query_id", "nbr_id")
    ivf = ivf_topk(t.embeddings, k=3, n_clusters=16, n_probe=4).select(
        "query_id", "nbr_id", F.lit(1).alias("hit")
    )
    return brute.join(ivf, ["query_id", "nbr_id"], "left").agg(
        F.countDistinct("query_id").alias("n_queries"),
        (
            (F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1))) >= 0.5
        ).alias("recall_ok"),
    )


@register(
    "q_llm_ann_lsh",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
           TRUE AS recall_ok
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.4
    """,
    tags=("batch", "llm", "similarity", "approx"),
)
def q_llm_ann_lsh(spark, sf_dir):
    """K4: ANN candidates via random-projection LSH (seed=42) — the scale
    path where the corpus no longer broadcasts. Bucket-join candidates
    within euclidean 1.2 (≈ cosine 0.28 on unit-norm vectors). The oracle
    checks the ACCURACY CONTRACT: of the exact cosine ≥ 0.4 pairs, LSH
    must recover ≥ 85% (measured 58/59 at sf0.01, 64/66 at sf0.001); the
    oracle asserts the exact pair count and ``recall_ok = TRUE``."""
    t = tables(spark, sf_dir)
    truth = cosine_neardup_pairs(t.embeddings, threshold=0.4).select("d1", "d2")
    cand = lsh_ann_buckets(t.embeddings, threshold=1.2).select(
        "d1", "d2", F.lit(1).alias("hit")
    )
    return truth.join(cand, ["d1", "d2"], "left").agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        (
            (F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1))) >= 0.85
        ).alias("recall_ok"),
    )


@register(
    "q_llm_wordcount",
    oracle="""
    SELECT lang, word, cnt FROM (
      SELECT lang, word, CAST(count(*) AS BIGINT) AS cnt,
             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, word) AS rn
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY lang, word
    ) WHERE rn <= 10
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_wordcount(spark, sf_dir):
    """K5: top-10 terms per language — explode + two-level agg + top-k."""
    t = tables(spark, sf_dir)
    from pyspark.sql import Window

    counted = (
        t.documents.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("word"))
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .drop("rn")
    )


@register(
    "q_llm_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE word <> '' GROUP BY doc_id, word
    ), df AS (
      SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.word, tf.tf, df.df,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_tfidf(spark, sf_dir):
    """K5b: hand-computed TF-IDF (deterministic, unlike hashed ML-lib
    variants): tf per (doc, word), document frequency per word,
    idf = ln(N/df). The df side is a broadcastable vocabulary dim."""
    t = tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = t.documents.count()
    return tf.join(F.broadcast(df), "word").select(
        "doc_id",
        "word",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4).alias(
            "tfidf"
        ),
    )


@register(
    "q_llm_langstats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT)       AS n_docs,
           round(avg(n_chars), 4)         AS avg_chars,
           CAST(min(n_chars) AS BIGINT)   AS min_chars,
           CAST(max(n_chars) AS BIGINT)   AS max_chars,
           round(avg(length(text)), 4)    AS avg_len
    FROM documents GROUP BY lang
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_langstats(spark, sf_dir):
    """K6: per-language corpus stats (plus n_chars sanity vs length)."""
    t = tables(spark, sf_dir)
    return t.documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg(F.length("text")), 4).alias("avg_len"),
    )


_LEXICON = (("fast", 1), ("big", 1), ("small", -1), ("slow", -1), ("dup", -2))


@register(
    "q_llm_lexicon_score",
    oracle=f"""
    WITH lex(word, weight) AS (VALUES {", ".join(f"('{w}', {s})" for w, s in _LEXICON)}),
    toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
    SELECT d.doc_id, CAST(coalesce(sum(l.weight), 0) AS BIGINT) AS score
    FROM documents d
    LEFT JOIN toks t ON d.doc_id = t.doc_id
    LEFT JOIN lex l ON t.word = l.word
    GROUP BY d.doc_id
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_lexicon_score(spark, sf_dir):
    """K7: lexicon scoring (sentiment-style): broadcast a tiny weighted
    word list against exploded tokens; sum per document."""
    t = tables(spark, sf_dir)
    lex = spark.createDataFrame(list(_LEXICON), "word string, weight int")
    toks = t.documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    scored = (
        toks.join(F.broadcast(lex), "word", "left")
        .groupBy("doc_id")
        .agg(F.coalesce(F.sum("weight"), F.lit(0)).cast("long").alias("score"))
    )
    # keep docs whose token list was empty (none in this data, but correct)
    return (
        t.documents.select("doc_id")
        .join(scored, "doc_id", "left")
        .select("doc_id", F.coalesce("score", F.lit(0)).cast("long").alias("score"))
    )


@register(
    "q_text_quality",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS ttr,
           round(CAST(len(list_filter(toks, t -> lower(t) IN ('the','a','of','and','to')))
                      AS DOUBLE) / len(toks), 4) AS stop_ratio,
           round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                 / len(toks), 4) AS mean_tok_len
    FROM m
    """,
    tags=("batch", "llm", "text"),
)
def q_text_quality(spark, sf_dir):
    """Text quality metrics: token counts, type-token ratio, stopword
    ratio, mean token length — the cheap pre-filter tier of a training
    data pipeline, all as JVM expressions."""
    t = tables(spark, sf_dir)
    txt = F.col("text")
    return t.documents.select(
        "doc_id",
        X.n_tokens(txt).alias("n_tokens"),
        F.size(F.array_distinct(X.tokens(txt))).cast("long").alias("n_distinct"),
        X.type_token_ratio(txt).alias("ttr"),
        X.stopword_ratio(txt).alias("stop_ratio"),
        X.mean_token_len(txt).alias("mean_tok_len"),
    )


@register(
    "q_text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
                AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))
                AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
    tags=("batch", "llm", "text"),
)
def q_text_tokens(spark, sf_dir):
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    token count (word runs + isolated symbols) — the budget estimator."""
    t = tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        X.n_tokens("text").alias("n_ws_tokens"),
        X.n_bpe_tokens("text").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "q_text_langid",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN CAST(len(list_filter(list_filter(string_split_regex(text, '\\s+'),
                                                      t -> t <> ''),
                                          t -> lower(t) IN ('the','a','of','is')))
                     AS DOUBLE)
                / len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) > 0.02
                THEN 'en' ELSE 'und' END AS predicted_lang
    FROM documents
    """,
    tags=("batch", "llm", "text"),
)
def q_text_langid(spark, sf_dir):
    """Marker-based language ID (deterministic heuristic tier; the n-gram
    profile extension keeps the same expression shape)."""
    t = tables(spark, sf_dir)
    return t.documents.select(
        "doc_id", "lang", X.lang_id("text").alias("predicted_lang")
    )


@register(
    "q_text_fingerprint",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           list_min(list_transform(range(1, len(w) - 1),
                    i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS fp
    FROM toks WHERE len(w) >= 3
    """,
    tags=("batch", "llm", "text"),
)
def q_text_fingerprint(spark, sf_dir):
    """Winnowing-style fingerprint: min md5 over word trigram shingles —
    portable (md5), order-insensitive, one expression per row. r12-opt:
    the per-row expression is heavy (16 md5s per doc) and ran inside the
    single-task scan of a few-row-group input — row-group-adaptive
    spread (guide §2.5; no-op on a multi-file corpus) parallelizes it
    (3.2 s → 0.6 s at sf0.1, noop sink)."""
    from flink_quickstart_spark.sources.tables import spread_unsplittable

    t = tables(spark, sf_dir)
    docs = spread_unsplittable(t.documents, sf_dir)
    return docs.where(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", X.fingerprint("text", 3).alias("fp")
    )


@register(
    "q_multimodal_decode",
    # The stub decoder derives feature[0] from the first 4 sha256 digest
    # bytes (little-endian uint32 / 2^32, cast to float32) — DuckDB can
    # rebuild that exactly from hex, so even the Arrow decode path is
    # value-hash-checked against an independent engine. Real decoders
    # plug into operators/multimodal and would demote this to rows-only.
    oracle="""
    SELECT 'image/fake' AS media_type,
           CAST(count(*) AS BIGINT)        AS n_media,
           CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
           round(avg(CAST(
             CAST(('0x' || substr(sha256(text), 7, 2) || substr(sha256(text), 5, 2)
                        || substr(sha256(text), 3, 2) || substr(sha256(text), 1, 2))
                  AS BIGINT) / 4294967296.0 AS REAL)), 6) AS mean_feat0
    FROM documents
    """,
    tags=("batch", "llm", "multimodal", "pandas-udf"),
)
def q_multimodal_decode(spark, sf_dir):
    """K8: the full multimodal pipeline over real Spark plumbing —
    documents → binary payload + typed metadata (attach_fake_media) →
    Arrow-batched mapInPandas decode (deterministic fake features) →
    per-media aggregate. At 100 TB the decode stage is the cost center:
    metadata filters run BEFORE it (column pruning keeps payload bytes
    unread for pruned rows), and batch size is tuned by payload bytes."""
    from flink_quickstart_spark.operators.multimodal import (
        attach_fake_media,
        decode_stub,
    )

    t = tables(spark, sf_dir)
    media = attach_fake_media(t.documents, "doc_id", "text")
    decoded = decode_stub(media, deterministic_fake=True)
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg(F.element_at("feature", 1)), 6).alias("mean_feat0"),
    )


@register(
    "q_sample_split",
    oracle="""
    SELECT doc_id,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
    tags=("batch", "llm", "sampling"),
)
def q_sample_split(spark, sf_dir):
    """Training-pipeline staple: deterministic hash-based train/test
    split. md5 of the stable id — identical hex on every engine and
    every run, no RNG state — gives each doc a reproducible bucket;
    first hex digit in {0,1} → 'test' (12.5%). At 100 TB this is a pure
    map (no shuffle, no sampling coordination), and the same expression
    splits consistently across tables that share the id."""
    t = tables(spark, sf_dir)
    h = F.md5(F.col("doc_id").cast("string"))
    return t.documents.select(
        "doc_id",
        F.substring(h, 1, 2).alias("h2"),
        F.when(F.substring(h, 1, 1).isin("0", "1"), "test")
        .otherwise("train")
        .alias("split"),
    )


@register(
    "q_profile_columns",
    oracle="""
    SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_orderkey) AS BIGINT)   AS n_distinct,
           round(min(o_orderkey), 4) AS min_num, round(max(o_orderkey), 4) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           round(min(o_totalprice), 4), round(max(o_totalprice), 4),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           NULL, NULL, min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           NULL, NULL, min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
    tags=("batch", "llm", "quality"),
)
def q_profile_columns(spark, sf_dir):
    """Data-quality column profiler (the validation step every training
    pipeline runs before ingest): per column — row count, null count,
    distinct count, min/max. One pass per column group; Catalyst shares
    the scan via reused exchange where possible, and every aggregate is
    map-side combined. At 100 TB, profile from a hash sample
    (q_sample_split) instead of the full table when exactness is not
    required."""
    t = tables(spark, sf_dir)
    o = t.orders

    def num_profile(col):
        return o.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.round(F.min(col).cast("double"), 4).alias("min_num"),
            F.round(F.max(col).cast("double"), 4).alias("max_num"),
            F.lit(None).cast("string").alias("min_str"),
            F.lit(None).cast("string").alias("max_str"),
        )

    def str_profile(col):
        return o.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.lit(None).cast("double").alias("min_num"),
            F.lit(None).cast("double").alias("max_num"),
            F.min(col).alias("min_str"),
            F.max(col).alias("max_str"),
        )

    return (
        num_profile("o_orderkey")
        .unionByName(num_profile("o_totalprice"))
        .unionByName(str_profile("o_orderstatus"))
        .unionByName(str_profile("o_orderpriority"))
    )


@register(
    "q_text_langid_ngram",
    oracle="""
    WITH train AS (
      SELECT * FROM documents
      WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) NOT IN ('0', '1')
    ), train_tri AS (
      SELECT lang, unnest(list_transform(range(1, strlen(text) - 1),
                                         i -> substr(text, i, 3))) AS tri
      FROM train
    ), profile AS (
      SELECT lang, tri FROM (
        SELECT lang, tri,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY count(*) DESC, tri) AS rn
        FROM train_tri GROUP BY lang, tri
      ) WHERE rn <= 20
    ), doc_tri AS (
      SELECT doc_id, lang AS true_lang,
             unnest(list_transform(range(1, strlen(text) - 1),
                                   i -> substr(text, i, 3))) AS tri
      FROM documents
    ), scored AS (
      SELECT d.doc_id, d.true_lang, p.lang AS cand_lang,
             CAST(count(*) AS BIGINT) AS score
      FROM doc_tri d JOIN profile p ON d.tri = p.tri
      GROUP BY 1, 2, 3
    )
    SELECT doc_id, true_lang, cand_lang AS predicted_lang, score
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, cand_lang) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    tags=("batch", "llm", "text"),
)
def q_text_langid_ngram(spark, sf_dir):
    """K6/text tier 2: corpus-trained n-gram-profile language ID (the
    classic Cavnar–Trenkle shape, public method): build top-20 character
    -trigram profiles per language from the md5-hash TRAIN split
    (q_sample_split's rule), score every document by profile-trigram
    hits, predict the argmax language (deterministic tie-breaks). The
    profile is O(langs × 20) — a broadcast dim at any corpus size; the
    trigram explode is a narrow map; one shuffle per aggregate."""
    from pyspark.sql import Window

    from flink_quickstart_spark.sources.tables import spread_unsplittable

    t = tables(spark, sf_dir)
    # r12-opt (guide §2.5): both trigram explodes multiply the corpus
    # ~3× in the SAME task as the scan — a few-row-group input runs
    # them single-threaded; row-group-adaptive spread (no-op on a real
    # multi-file corpus) measured 4.6 s → 1.1 s at sf0.1 (noop sink).
    docs = spread_unsplittable(t.documents, sf_dir)
    # Guard len<3: sequence(1, 0) would default to step -1 and yield
    # [1, 0] (bogus sub-3-char "trigrams"); emit an empty array instead,
    # matching the oracle's empty range(1, strlen-1).
    tri_expr = F.expr(
        "CASE WHEN length(text) >= 3 THEN"
        " transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
        " ELSE array() END"
    )
    train = docs.where(
        ~F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    )
    train_tri = train.select("lang", F.explode(tri_expr).alias("tri"))
    w_prof = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("tri"))
    profile = (
        train_tri.groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w_prof))
        .where(F.col("rn") <= 20)
        .select(F.col("lang").alias("cand_lang"), "tri")
    )
    doc_tri = docs.select(
        "doc_id", F.col("lang").alias("true_lang"), F.explode(tri_expr).alias("tri")
    )
    scored = (
        doc_tri.join(F.broadcast(profile), "tri")
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand_lang")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select(
            "doc_id", "true_lang", F.col("cand_lang").alias("predicted_lang"), "score"
        )
    )


@register(
    "q_sample_stratified",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0', '1', '2', '3')
      AND event_type IN ('purchase', 'click')
    GROUP BY event_type
    """,
    tags=("batch", "llm", "sampling"),
)
def q_sample_stratified(spark, sf_dir):
    """Stratified deterministic sampling: ~25% per chosen stratum via the
    md5-hash rule (first hex digit in 0-3) — the reproducible analog of
    ``sampleBy`` (whose RNG is engine-specific). Pure map + one
    aggregate; rates tune per stratum by widening the digit set, and the
    same rows are selected on any engine, any run, any partitioning —
    the property that matters when a 100 TB sample must be re-derivable."""
    t = tables(spark, sf_dir)
    h1 = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
    return (
        t.events.where(
            h1.isin("0", "1", "2", "3")
            & F.col("event_type").isin("purchase", "click")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


@register(
    "q_llm_dedup_groups",
    # The same shingle-Jaccard pairs CTE as q_llm_neardup, closed into
    # clusters by a recursive min-label transitive closure (tiny pair set
    # at gate scale; the Spark side iterates instead — the scale path).
    oracle="""
    WITH RECURSIVE
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
           FROM toks WHERE len(w) >= 3),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_common
               FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
    pairs AS (SELECT d1, d2 FROM common
              JOIN sizes s1 ON d1 = s1.doc_id
              JOIN sizes s2 ON d2 = s2.doc_id
              WHERE CAST(n_common AS DOUBLE) / (s1.n + s2.n - n_common) >= 0.5),
    edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
              UNION SELECT d2, d1 FROM pairs),
    reach(node, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.node),
    comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
    csize AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
    SELECT d.doc_id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS canon_id,
           CAST(coalesce(s.cluster_size, 1) AS BIGINT)     AS cluster_size,
           CAST(CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id
                THEN 1 ELSE 0 END AS INT)                  AS is_canonical
    FROM documents d
    LEFT JOIN comp c  ON d.doc_id = c.node
    LEFT JOIN csize s ON c.component = s.component
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_dedup_groups(spark, sf_dir):
    """K2 completion: near-dup PAIRS → dedup GROUPS. Connected components
    (min-label propagation, operators/iterative.py) over the Jaccard
    pair graph assigns every document a canonical id (the smallest doc id
    in its near-dup cluster) — the row a 100 TB dedup pass would keep.
    Pair generation is the bucketed inverted-index join; CC shuffles on
    node id only; singleton docs never enter the iteration (they join
    back with cluster_size 1)."""
    from flink_quickstart_spark.operators.iterative import connected_components

    t = tables(spark, sf_dir)
    pairs = jaccard_neardup_pairs(
        t.documents, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=1000
    )
    edges = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    comp = connected_components(edges)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    canon = F.coalesce(F.col("component"), F.col("doc_id"))
    return (
        t.documents.select("doc_id")
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .join(sizes, "component", "left")
        .select(
            "doc_id",
            canon.cast("long").alias("canon_id"),
            F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
            F.when(canon == F.col("doc_id"), 1).otherwise(0).cast("int").alias("is_canonical"),
        )
    )


# Gopher/C4-style quality rules [PK: Rae et al. 2021 "Scaling Language
# Models" app. A (Gopher rules); Raffel et al. 2020 (C4 filters)] —
# thresholds here are the public heuristics adapted to the synthetic
# corpus vocabulary.
_GOPHER_STOPWORDS = ("the", "a", "of", "and", "to")


@register(
    "q_text_gopher_filters",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
      FROM documents),
    counts AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
    per AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT)  AS n_words,
             CAST(max(c) AS BIGINT)  AS top_word_freq,
             CAST(sum(length(tok) * c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS mean_wl,
             CAST(sum(CASE WHEN tok IN ('the','a','of','and','to') THEN c ELSE 0 END)
                  AS BIGINT) AS n_stop
      FROM counts GROUP BY doc_id)
    SELECT doc_id, n_words, round(mean_wl, 4) AS mean_word_len,
           top_word_freq, n_stop,
           CAST(CASE WHEN n_words BETWEEN 20 AND 100000 THEN 1 ELSE 0 END AS INT) AS ok_nwords,
           CAST(CASE WHEN mean_wl BETWEEN 2 AND 10 THEN 1 ELSE 0 END AS INT)      AS ok_meanlen,
           CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT)                   AS ok_stopwords,
           CAST(CASE WHEN CAST(top_word_freq AS DOUBLE) / n_words <= 0.2
                THEN 1 ELSE 0 END AS INT)                                         AS ok_repetition,
           CAST(CASE WHEN n_words BETWEEN 20 AND 100000
                      AND mean_wl BETWEEN 2 AND 10
                      AND n_stop >= 2
                      AND CAST(top_word_freq AS DOUBLE) / n_words <= 0.2
                THEN 1 ELSE 0 END AS INT)                                         AS keep
    FROM per
    """,
    tags=("batch", "llm", "text"),
)
def q_text_gopher_filters(spark, sf_dir):
    """Gopher/C4-style document quality rules: word-count bounds, mean
    word length bounds, stopword presence, top-word repetition cap —
    the public pre-training filter battery. One explode + two hash aggs
    (per-(doc,word) then per-doc) — linear, shuffle on doc_id, no
    Python. Rule flags emitted as INT (portable hashing) plus the
    combined keep flag; every comparison is on exact integer-derived
    doubles, so the booleans are engine-stable."""
    t = tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", F.explode(X.tokens("text")).alias("tok")
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    per = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.max("c").alias("top_word_freq"),
        (
            F.sum(F.length("tok") * F.col("c")).cast("double")
            / F.sum("c").cast("double")
        ).alias("mean_wl"),
        F.sum(
            F.when(F.col("tok").isin(*_GOPHER_STOPWORDS), F.col("c")).otherwise(0)
        ).alias("n_stop"),
    )
    ok_nwords = F.col("n_words").between(20, 100000)
    ok_meanlen = F.col("mean_wl").between(2, 10)
    ok_stop = F.col("n_stop") >= 2
    ok_rep = F.col("top_word_freq").cast("double") / F.col("n_words") <= 0.2
    as_int = lambda c: F.when(c, 1).otherwise(0).cast("int")  # noqa: E731
    return per.select(
        "doc_id",
        "n_words",
        F.round("mean_wl", 4).alias("mean_word_len"),
        "top_word_freq",
        "n_stop",
        as_int(ok_nwords).alias("ok_nwords"),
        as_int(ok_meanlen).alias("ok_meanlen"),
        as_int(ok_stop).alias("ok_stopwords"),
        as_int(ok_rep).alias("ok_repetition"),
        as_int(ok_nwords & ok_meanlen & ok_stop & ok_rep).alias("keep"),
    )


# Phone/email patterns kept to syntax shared by Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
_PII_PHONE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
_PII_EMAIL = "[a-z0-9._]+@[a-z0-9.-]+[.][a-z]{2,}"


@register(
    "q_text_pii_scrub",
    oracle=f"""
    WITH txt AS (
      SELECT c_custkey,
             c_name || ' call ' ||
             printf('%02d-%03d-%03d-%04d',
                    c_custkey % 90 + 10, c_custkey % 900 + 100,
                    (c_custkey * 7) % 900 + 100, c_custkey % 9000 + 1000) ||
             ' or mail ' || lower(replace(c_name, '#', '')) || '@example.com'
             AS text
      FROM customer)
    SELECT c_custkey,
           regexp_replace(regexp_replace(text, '{_PII_PHONE}', '[PHONE]', 'g'),
                          '{_PII_EMAIL}', '[EMAIL]', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}'))
              + len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_pii
    FROM txt
    """,
    tags=("batch", "llm", "text"),
)
def q_text_pii_scrub(spark, sf_dir):
    """PII scrubbing (training-data hygiene): redact phone/email patterns
    and count redactions — pure JVM regexp expressions (regexp_replace +
    regexp_count), linear, pushdown-friendly. The corpus has no organic
    PII, so deterministic phone/email strings are synthesized from the
    customer key FIRST and the scrubber is value-checked against them —
    the regex machinery (the part that matters) is fully exercised.
    Patterns restricted to the Java-regex ∩ RE2 common subset."""
    t = tables(spark, sf_dir)
    key = F.col("c_custkey")
    text = F.concat(
        F.col("c_name"),
        F.lit(" call "),
        F.format_string(
            "%02d-%03d-%03d-%04d",
            key % 90 + 10,
            key % 900 + 100,
            (key * 7) % 900 + 100,
            key % 9000 + 1000,
        ),
        F.lit(" or mail "),
        F.lower(F.regexp_replace("c_name", "#", "")),
        F.lit("@example.com"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, _PII_PHONE, "[PHONE]"), _PII_EMAIL, "[EMAIL]"
    )
    n_pii = (
        F.regexp_count(text, F.lit(_PII_PHONE))
        + F.regexp_count(text, F.lit(_PII_EMAIL))
    ).cast("long")
    return t.customer.select(
        "c_custkey", scrubbed.alias("scrubbed"), n_pii.alias("n_pii")
    )


@register(
    "q_text_fuzzy_match",
    oracle="""
    SELECT a.c_custkey AS id1, b.c_custkey AS id2,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    tags=("batch", "llm", "text"),
)
def q_text_fuzzy_match(spark, sf_dir):
    """Fuzzy entity matching: same-nation name pairs within Levenshtein
    distance 1 — the record-linkage shape, evaluated with
    DELETION-NEIGHBORHOOD (SymSpell-style) blocking rather than a
    same-nation self-join. The r6 sf1 sweep exposed the old nation
    block as a disguised corpus-quadratic: a FIXED-cardinality blocking
    key means block sizes grow linearly with the corpus and pair work
    quadratically (measured ~630× time for 100× data). Deletion
    blocking is EXACT for lev ≤ 1 — two strings within one edit
    necessarily share a key among {identity} ∪ {delete-one-char}:
    substitution shares the deletion at the edited position,
    insertion/deletion shares the shorter string itself — and a
    bucket's size is bounded by alphabet × length (the strings within
    one insertion of the key), independent of corpus size. One explode
    (len+1 keys/row), one equi-join on the key, distinct, then the
    exact levenshtein verify on candidates only. Both engines implement
    classic unweighted edit distance; oracle (the naive blocked join)
    unchanged."""
    t = tables(spark, sf_dir)
    c = t.customer.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    name = F.col("name")
    del_keys = F.array_union(
        F.array(name),
        F.transform(
            F.sequence(F.lit(1), F.length(name)),
            lambda i: F.concat(
                name.substr(F.lit(1), i - F.lit(1)),
                name.substr(i + F.lit(1), F.length(name)),
            ),
        ),
    )
    k = c.withColumn("key", F.explode(del_keys))
    a = k.select(
        F.col("id").alias("id1"), F.col("name").alias("name1"),
        F.col("nk").alias("nk1"), "key",
    )
    b = k.select(
        F.col("id").alias("id2"), F.col("name").alias("name2"),
        F.col("nk").alias("nk2"), "key",
    )
    lev = F.levenshtein("name1", "name2")
    return (
        a.join(b, "key")
        .where((F.col("id1") < F.col("id2")) & (F.col("nk1") == F.col("nk2")))
        .select("id1", "id2", "name1", "name2")
        .distinct()
        .where(lev <= 1)
        .select("id1", "id2", lev.cast("long").alias("lev"))
    )


@register(
    "q_llm_decontaminate",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
           FROM toks WHERE len(w) >= 3),
    bench AS (SELECT doc_id FROM documents
              WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f')),
    bench_sh AS (SELECT DISTINCT shingle FROM sh
                 JOIN bench USING (doc_id)),
    train_sh AS (SELECT sh.doc_id, sh.shingle FROM sh
                 WHERE sh.doc_id NOT IN (SELECT doc_id FROM bench)),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
              FROM train_sh GROUP BY doc_id),
    overlap AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
                FROM train_sh t JOIN bench_sh b ON t.shingle = b.shingle
                GROUP BY t.doc_id)
    SELECT s.doc_id, s.n_shingles,
           coalesce(o.n_overlap, 0) AS n_overlap,
           round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / s.n_shingles, 4)
             AS overlap_frac,
           CAST(CASE WHEN CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / s.n_shingles
                          >= 0.2 THEN 1 ELSE 0 END AS INT) AS contaminated
    FROM sizes s LEFT JOIN overlap o ON s.doc_id = o.doc_id
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_decontaminate(spark, sf_dir):
    """Benchmark decontamination [PK: the n-gram overlap procedure of
    GPT-3 app. C / PaLM app. — public methodology]: flag training
    documents sharing too many shingles with a held-out benchmark set.
    The benchmark here is the deterministic md5-rule subset (~12.5% of
    docs) so the check is oracle-reproducible; in production it is the
    actual eval suite. Plan: one shingle inverted-index semi-overlap
    join + two hash aggs. At 100 TB the benchmark shingle set is tiny
    relative to the corpus — broadcast it and the scan stays
    one-pass, shuffling only (doc_id, overlap-count) partials."""
    from flink_quickstart_spark.session import tracked_persist
    from flink_quickstart_spark.sources.tables import spread_unsplittable

    t = tables(spark, sf_dir)
    # r13-opt (§5, the r12 neardup-family pattern): the shingle table
    # feeds THREE subtrees (bench shingles, train sizes, train overlap)
    # and was re-exploded for each; materialize it once (columnar
    # cache, spills, drainable via release_tracked_persists). The
    # spread parallelizes the explode over a single-row-group input
    # (§2.5 — no-op on a multi-file corpus).
    sh = tracked_persist(
        word_shingles(
            spread_unsplittable(t.documents, sf_dir, "documents"),
            "doc_id",
            "text",
            3,
        )
    )
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "e", "f"
    )
    bench_ids = t.documents.where(is_bench).select("doc_id")
    bench_sh = (
        sh.join(bench_ids, "doc_id").select("shingle").distinct()
    )
    train_sh = sh.join(bench_ids, "doc_id", "left_anti")
    sizes = train_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    overlap = (
        train_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    frac = F.coalesce("n_overlap", F.lit(0)).cast("double") / F.col("n_shingles")
    return (
        sizes.join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(frac, 4).alias("overlap_frac"),
            F.when(frac >= 0.2, 1).otherwise(0).cast("int").alias("contaminated"),
        )
    )


@register(
    "q_multimodal_framesample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, CAST(floor(n_chars * 100.0 / 1000) AS INT) + 1))
                * 1000 AS BIGINT) AS frame_ts_ms
    FROM documents
    WHERE n_chars > 0
    """,
    tags=("batch", "llm", "multimodal"),
)
def q_multimodal_framesample(spark, sf_dir):
    """K8: video frame-sampling PLAN (operators/multimodal.py) — explode
    metadata into per-frame timestamp rows BEFORE any decode, so the
    expensive decode stage (a mapInPandas over payload bytes, stubbed in
    this container) runs only on the pruned frame set. Fake video
    durations derive deterministically from n_chars (100 ms per char),
    making the explode arithmetic — the part Spark owns — exactly
    oracle-checkable. The payload column is never read: column pruning
    keeps this metadata-only at any corpus size."""
    from flink_quickstart_spark.operators.multimodal import frame_sample_plan

    t = tables(spark, sf_dir)
    media = t.documents.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.lit("video/fake").alias("media_type"),
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            (F.col("n_chars") * 100).cast("long").alias("duration_ms"),
            F.lit("fake0").alias("codec"),
        ).alias("meta"),
    )
    frames = frame_sample_plan(media, every_ms=1000)
    return frames.select(
        "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    )


@register(
    "q_llm_chunk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
      FROM documents
    ), st AS (
      SELECT doc_id, t, unnest(range(0, len(t), 40)) AS start
      FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(start // 40 AS BIGINT) AS chunk_id,
           CAST(len(array_slice(t, start + 1, start + 50)) AS BIGINT) AS n_tokens,
           array_to_string(array_slice(t, start + 1, start + 50), ' ') AS chunk_text
    FROM st
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_chunk(spark, sf_dir):
    """Context-window chunking — the tokenize→window step every training
    pipeline runs before packing: overlapping 50-token windows with
    stride 40 (10-token overlap so no boundary n-gram is lost). All
    JVM-side array expressions (split → sequence of starts → explode →
    slice → array_join): per-row fanout is ceil(n_tokens/stride) with no
    shuffle at all — the operator is embarrassingly parallel and scales
    linearly with corpus bytes at 100 TB."""
    t = tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    docs = t.documents.select("doc_id", toks.alias("t")).where(F.size("t") > 0)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("t") - 1, F.lit(0)), F.lit(40)
    )
    chunk = F.slice(F.col("t"), F.col("start") + 1, 50)
    return (
        docs.select("doc_id", "t", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / 40).cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@register(
    "q_llm_dedup_spans",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, len(w) - 3),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                              || w[i+3] || ' ' || w[i+4])) AS shingle
           FROM toks WHERE len(w) >= 5),
    df AS (SELECT shingle, count(*) AS d FROM sh GROUP BY shingle)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           round(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS dup_fraction
    FROM sh JOIN df USING (shingle)
    GROUP BY doc_id
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_dedup_spans(spark, sf_dir):
    """Span-level duplication signal (the exact-substring-dedup
    diagnostic): per document, the fraction of its distinct 5-token
    shingles that also occur in at least one OTHER copy in the corpus —
    the filter signal behind 'remove documents that are mostly
    boilerplate'. Two shuffles total (shingle DF agg + join back on
    shingle), both on the shingle key; the DISTINCT per (doc, shingle)
    bounds inverted-index fanout exactly as the Jaccard tier does.

    The join-back pins SHUFFLE_HASH with the frequency table as the
    sharded build side (r7 sf10text probe finding): ``dfreq`` is
    vocabulary-sized (it grows with the corpus) but Catalyst sizes the
    aggregate off the pre-explode parquet scan, so static planning
    chose a doomed broadcast of the whole distinct-shingle table at
    100× documents ("Not enough memory to build and broadcast") — and
    the agg already hash-partitions dfreq on shingle, so SHJ reuses
    that exchange."""
    from flink_quickstart_spark.session import tracked_persist

    t = tables(spark, sf_dir)
    # Two consumers (the DF aggregate and the join-back) re-ran the
    # scan+explode+distinct shingle pipeline; one materialization
    # replaces both — the same r12-opt concession as the Jaccard tier
    # (operators/dedup.py; measured 6.3 s → 1.0 s at sf0.1, noop sink).
    # Tracked (r13): session.release_tracked_persists() drains it.
    sh = tracked_persist(word_shingles(t.documents, "doc_id", "text", n=5))
    # d counts DOCUMENTS per shingle (sh is distinct per doc), so d >= 2
    # means the span recurs outside this document.
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("d"))
    dup = F.sum(F.when(F.col("d") >= 2, 1).otherwise(0))
    return (
        sh.join(dfreq.hint("shuffle_hash"), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            dup.cast("long").alias("n_dup_spans"),
            F.round(dup / F.count(F.lit(1)).cast("double"), 6).alias(
                "dup_fraction"
            ),
        )
    )


@register(
    "q_llm_pack_sequences",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    ), run AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS ending
      FROM tok
    )
    SELECT doc_id, n_tokens,
           CAST(ending - n_tokens AS BIGINT) AS start_offset,
           CAST((ending - n_tokens) // 2048 AS BIGINT) AS seq_id
    FROM run
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_pack_sequences(spark, sf_dir):
    """Concat-and-split sequence packing — GPT-style pretraining's 'lay
    all documents end to end in a deterministic order, then cut every
    2048 tokens': each doc gets its global token start_offset and the id
    of the context window its first token lands in. The prefix sum is
    the distributed two-phase ``global_running_sum``
    (operators/rank.py): range-bucket on doc_id, per-bucket sums to the
    driver, broadcast offsets, per-bucket running window — NO
    single-partition WindowExec, unlike the naive
    ``sum().over(Window.orderBy(...))``, so the packing plan survives a
    100 TB corpus."""
    from flink_quickstart_spark.operators.rank import global_running_sum

    t = tables(spark, sf_dir)
    docs = t.documents.select("doc_id", X.n_tokens("text").alias("n_tokens"))
    packed = global_running_sum(
        docs, "n_tokens", [F.col("doc_id")], "doc_id", out_col="ending"
    )
    start = F.col("ending") - F.col("n_tokens")
    return packed.select(
        "doc_id",
        "n_tokens",
        start.cast("long").alias("start_offset"),
        F.floor(start / 2048).cast("long").alias("seq_id"),
    )


@register(
    "q_llm_sample_balanced",
    oracle="""
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
      FROM documents
    ) WHERE rn <= 60
    """,
    tags=("batch", "llm", "sampling"),
)
def q_llm_sample_balanced(spark, sf_dir):
    """Language-balanced subcorpus — the data-mixture op: cap every
    language at K=60 docs, choosing the K with the smallest
    md5(doc_id), so the selection is a deterministic uniform draw that
    re-derives identically on any engine/run (no RNG state). Unlike the
    rate-based q_sample_stratified, this is a cap-K mixture: the window
    is PARTITIONED by language and Catalyst inserts WindowGroupLimit,
    so each map task pre-prunes to its local top-K before the shuffle —
    the same plan shape as q_topk_pergroup, safe for a dominant
    language at 100 TB."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        t.documents.select(
            "lang", "doc_id", F.row_number().over(w).cast("long").alias("rn")
        )
        .where(F.col("rn") <= 60)
    )


@register(
    "q_embed_norm",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 6) AS l2_norm,
           CAST(len(embedding) AS BIGINT) AS dim
    FROM embeddings
    """,
    tags=("batch", "llm", "embedding"),
)
def q_embed_norm(spark, sf_dir):
    """K-ext: per-vector L2 norm + dimensionality — the sanity gate every
    embedding pipeline runs before cosine math (catches zero vectors and
    ragged dims). Pure JVM higher-order functions (AGGREGATE over the
    array), no Python: a narrow map that whole-stage-codegens, so at
    100 TB it rides the scan with zero shuffle."""
    t = tables(spark, sf_dir)
    e = F.col("embedding").cast("array<double>")
    sq_sum = F.aggregate(
        F.transform(e, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    return t.embeddings.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


@register(
    "q_embed_quantize_int8",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    s AS (SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
          FROM v)
    SELECT vec_id, round(scale, 9) AS scale,
           CAST(list_sum(list_transform(e, x -> floor(x / scale + 0.5)))
                AS BIGINT) AS q_checksum,
           round(list_max(list_transform(e,
                 x -> abs(floor(x / scale + 0.5) * scale - x))), 9) AS max_abs_err
    FROM s
    """,
    tags=("batch", "llm", "embedding"),
)
def q_embed_quantize_int8(spark, sf_dir):
    """K-ext: symmetric per-vector int8 quantization — the storage tier
    for 100 TB embedding corpora (4× smaller than float32, exact dequant
    bound scale/2). Emits the per-vector scale, the quantized-value
    checksum, and the max dequantization error. Rounding is implemented
    as ``floor(x/scale + 0.5)`` explicitly on BOTH engines so tie
    behavior is pinned independent of each engine's ROUND mode. All JVM
    higher-order functions — narrow, shuffle-free, codegen'd."""
    t = tables(spark, sf_dir)
    amax = F.aggregate(
        F.transform(F.col("e"), F.abs), F.lit(0.0), lambda a, x: F.greatest(a, x)
    )
    quant = lambda x, s: F.floor(x / s + F.lit(0.5))  # noqa: E731
    # NOTE: the output alias must NOT reuse the internal column name —
    # Spark's lateral column alias resolution would make later
    # expressions in the same select see the ROUNDED value.
    s = F.col("s_raw")
    return (
        t.embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        .withColumn("s_raw", amax / F.lit(127.0))
        .select(
            "vec_id",
            F.round("s_raw", 9).alias("scale"),
            F.aggregate(
                F.transform(F.col("e"), lambda x: quant(x, s)),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            .cast("bigint")
            .alias("q_checksum"),
            F.round(
                F.aggregate(
                    F.transform(
                        F.col("e"), lambda x: F.abs(quant(x, s) * s - x)
                    ),
                    F.lit(0.0),
                    lambda a, x: F.greatest(a, x),
                ),
                9,
            ).alias("max_abs_err"),
        )
    )


@register(
    "q_llm_bm25",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
           FROM toks WHERE tok IN ('data', 'model', 'system')
           GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n,
                     (SELECT avg(dl) FROM dl) AS avgdl),
    df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           FROM tf GROUP BY tok)
    SELECT tf.doc_id AS doc_id, round(sum(
             ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
           ), 6) AS bm25
    FROM tf, stats
    JOIN df ON tf.tok = df.tok
    JOIN dl ON tf.doc_id = dl.doc_id
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id
    LIMIT 20
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_bm25(spark, sf_dir):
    """K-ext: BM25 retrieval scoring (k1=1.2, b=0.75) for a fixed query
    over the corpus — the lexical-retrieval half of every RAG / data-
    curation stack. Whole pipeline is exact JVM SQL: tokenize → explode →
    tf per (doc, term), df per term, doc length — three hash aggregates
    over ONE tokenization pass; the tiny df/avgdl sides broadcast. At
    100 TB this is the same shape as TF-IDF: no all-pairs work, shuffle
    keyed on doc_id / term only."""
    t = tables(spark, sf_dir)
    terms = ("data", "model", "system")
    k1, b = 1.2, 0.75
    toks = t.documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = (
        toks.where(F.col("tok").isin(*terms))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    n_docs = t.documents.select(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    avgdl = dl.select(F.avg("dl").alias("avgdl"))
    df_ = tf.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    score = idf * F.col("tf") * (k1 + 1.0) / denom
    # Scalars (corpus size, mean doc length) attach as 1-row broadcasts.
    # This plans as BroadcastNestedLoopJoin, which is LINEAR for a 1-row
    # side (per-partition column concat, not a quadratic probe) — waived
    # by name in tools/plan_audit.py; an equi-join on a constant key
    # would be folded back to the same plan by Catalyst.
    return (
        tf.join(F.broadcast(df_), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@register(
    "q_llm_xent_unigram",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
    good AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    cnt AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM good GROUP BY tok),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM good)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(-sum(ln(cnt.c / tot.n)) / count(*), 6) AS cross_entropy
    FROM good JOIN cnt USING (tok), tot
    GROUP BY doc_id
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_xent_unigram(spark, sf_dir):
    """K-ext: per-document cross-entropy under the corpus unigram LM —
    the classic perplexity-flavored quality signal (high = off-
    distribution document). Two hash aggregates over one tokenization
    pass; the unigram table joins back BROADCAST (vocabulary ≪ corpus at
    any scale); the scalar total crosses as a one-row broadcast. No
    Python, no sort — the shape survives 100 TB."""
    t = tables(spark, sf_dir)
    toks = (
        t.documents.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = toks.select(F.count(F.lit(1)).cast("double").alias("n"))
    # Fold the corpus-total scalar INTO the vocabulary table first (a
    # 1-row × vocab-sized cross — bounded work), then hit the token
    # stream with ONE BroadcastHashJoin carrying the ready-made
    # probability: the FACT side never crosses a nested-loop join; the
    # residual 1-row BNLJ on the vocab side is linear and waived by name
    # in tools/plan_audit.py.
    vocab_p = cnt.crossJoin(F.broadcast(tot))
    return (
        toks.join(F.broadcast(vocab_p), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                -F.sum(F.log(F.col("c") / F.col("n"))) / F.count(F.lit(1)), 6
            ).alias("cross_entropy"),
        )
    )


@register(
    "q_dq_constraints",
    oracle="""
    SELECT * FROM (
      SELECT 'orders_pk_unique' AS constraint_name,
             CAST((SELECT count(*) FROM
                   (SELECT o_orderkey FROM orders
                    GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT)
               AS n_violations
      UNION ALL
      SELECT 'lineitem_orderkey_fk',
             CAST((SELECT count(*) FROM lineitem
                   WHERE l_orderkey NOT IN
                         (SELECT o_orderkey FROM orders)) AS BIGINT)
      UNION ALL
      SELECT 'orders_custkey_fk',
             CAST((SELECT count(*) FROM orders
                   WHERE o_custkey NOT IN
                         (SELECT c_custkey FROM customer)) AS BIGINT)
      UNION ALL
      SELECT 'events_value_nonnull',
             CAST((SELECT count(*) FROM events
                   WHERE value IS NULL) AS BIGINT)
      UNION ALL
      SELECT 'lineitem_qty_range',
             CAST((SELECT count(*) FROM lineitem
                   WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
      UNION ALL
      SELECT 'documents_text_nonempty',
             CAST((SELECT count(*) FROM documents
                   WHERE text IS NULL OR text = '') AS BIGINT)
    ) ORDER BY constraint_name
    """,
    tags=("batch", "llm", "quality"),
)
def q_dq_constraints(spark, sf_dir):
    """K-ext: data-quality constraint battery (Deequ/Great-Expectations
    shape) — the validation gate a training-data pipeline runs before
    accepting a drop: primary-key uniqueness, referential integrity
    across the star schema, null checks, range checks, non-empty text.

    Each constraint is one aggregate/anti-join returning a violation
    COUNT (never the violating rows — at 100 TB you page through
    violations separately). Uniqueness is a groupBy-HAVING; FKs are
    LEFT ANTI joins (never NOT IN's null-trap semantics on the Spark
    side; the testdata keys are non-null so the oracle's NOT IN is
    equivalent); everything shuffles at most once per constraint."""
    t = tables(spark, sf_dir)

    def one(name, cnt_df):
        return cnt_df.select(
            F.lit(name).alias("constraint_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )

    pk_dupes = (
        t.orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
    )
    li_fk = t.lineitem.join(
        t.orders.select("o_orderkey"),
        t.lineitem.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    ord_fk = t.orders.join(
        t.customer.select("c_custkey"),
        t.orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    ev_null = t.events.where(F.col("value").isNull())
    qty_range = t.lineitem.where(
        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
    )
    doc_empty = t.documents.where(
        F.col("text").isNull() | (F.col("text") == "")
    )
    checks = [
        ("orders_pk_unique", pk_dupes),
        ("lineitem_orderkey_fk", li_fk),
        ("orders_custkey_fk", ord_fk),
        ("events_value_nonnull", ev_null),
        ("lineitem_qty_range", qty_range),
        ("documents_text_nonempty", doc_empty),
    ]
    out = one(*checks[0])
    for name, df in checks[1:]:
        out = out.unionByName(one(name, df))
    return out.orderBy("constraint_name")


@register(
    "q_llm_minhash_signatures",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
           FROM toks WHERE len(w) >= 3)
    SELECT doc_id, CAST(i AS BIGINT) AS hash_idx,
           min(CAST(('0x' || substr(md5(shingle || '#' || i), 1, 15))
                    AS BIGINT)) AS sig
    FROM sh, unnest(range(16)) t(i)
    GROUP BY doc_id, i
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_minhash_signatures(spark, sf_dir):
    """K2b (signature layer): 16-hash MinHash signatures computed with
    the PORTABLE md5-60bit hash family h_i(s) = md5(s || '#' || i) — the
    signatures themselves are bit-identical across engines (md5 is
    universal), so the sketch layer is value-checked directly, not just
    through downstream pair recall. Sketch property: P[sig_i(A) =
    sig_i(B)] = Jaccard(A, B).

    Plan: one shingle explode × 16-hash posexplode, then a single hash
    aggregate keyed (doc, i) — fanout is bounded (16×), everything JVM.
    At 100 TB this replaces the per-doc shingle SET with 16 longs: the
    compression step that makes band-bucket dedup storage-feasible; the
    production default swaps md5 for xxhash64 (same shape, cheaper)."""
    from flink_quickstart_spark.operators.dedup import (
        portable_minhash_signatures,
    )

    t = tables(spark, sf_dir)
    # shared with the persisted signature store (r8): the exact same
    # expressions build {store}/bands, so any session's store rows
    # value-match this key's oracle.
    # r13: the shingle distinct is removed (§2.4, operators/dedup.py)
    # and the operator spreads a narrow scan itself (§2.5), so the 16×
    # md5 kernel runs map-side at full parallelism with ONE exchange
    # left in the plan (the 16-longs-per-doc partial-agg output).
    return portable_minhash_signatures(t.documents, "doc_id", "text")


@register(
    "q_embed_centroid",
    oracle="""
    WITH ex AS (SELECT d.lang,
                       generate_subscripts(CAST(e.embedding AS DOUBLE[]), 1) - 1
                         AS dim,
                       unnest(CAST(e.embedding AS DOUBLE[])) AS x
                FROM documents d
                JOIN embeddings e ON e.vec_id = d.doc_id)
    SELECT lang, CAST(dim AS BIGINT) AS dim,
           round(avg(x), 6) AS centroid_val,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM ex GROUP BY lang, dim
    """,
    tags=("batch", "llm", "embedding"),
)
def q_embed_centroid(spark, sf_dir):
    """K-ext: per-group embedding centroid (class prototype / cluster
    mean) — the reduction behind k-means updates, label prototypes, and
    drift monitoring. posexplode flattens (group, dim, value); one hash
    aggregate averages per (group, dim). The explode is a 64× narrow
    fanout but rows are 3 columns wide, and the aggregate combines
    map-side — at 100 TB this beats any driver-side vector math and
    never materializes per-group vector lists."""
    t = tables(spark, sf_dir)
    joined = t.documents.select("doc_id", "lang").join(
        t.embeddings.select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").cast("array<double>").alias("e"),
        ),
        "doc_id",
    )
    flat = joined.select(
        "lang", F.posexplode("e").alias("dim", "x")
    )
    return flat.groupBy("lang", "dim").agg(
        F.round(F.avg("x"), 6).alias("centroid_val"),
        F.count(F.lit(1)).alias("n_vectors"),
    ).select(
        "lang", F.col("dim").cast("bigint").alias("dim"), "centroid_val", "n_vectors"
    )


@register(
    "q_llm_ingest_dedup",
    oracle="""
    WITH corpus AS (SELECT doc_id, sha256(text) AS sha FROM documents
                    WHERE doc_id % 10 <> 0),
    batch AS (SELECT doc_id, sha256(text) AS sha FROM documents
              WHERE doc_id % 10 = 0)
    SELECT b.doc_id,
           CASE WHEN c.sha IS NULL AND b.rn = 1 THEN 'accept'
                WHEN c.sha IS NULL THEN 'dup_in_batch'
                ELSE 'dup_of_corpus' END AS decision
    FROM (SELECT doc_id, sha,
                 row_number() OVER (PARTITION BY sha ORDER BY doc_id) AS rn
          FROM batch) b
    LEFT JOIN (SELECT DISTINCT sha FROM corpus) c ON b.sha = c.sha
    ORDER BY b.doc_id
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_ingest_dedup(spark, sf_dir):
    """K-ext: INCREMENTAL ingest dedup — the continuous-pipeline shape:
    a new batch (doc_id % 10 = 0 here; in production, today's crawl) is
    deduped against the standing corpus AND against itself, emitting an
    accept/duplicate decision per document. Cost is proportional to the
    BATCH, never the corpus: the batch's hash set joins the corpus hash
    index (at 100 TB a bucketed-by-sha table, making this join
    shuffle-free on the corpus side); within-batch dedup is one window
    over the batch only. Contrast with q_llm_dedup_exact, which re-scans
    the full corpus."""
    t = tables(spark, sf_dir)
    hashed = t.documents.select(
        "doc_id", F.sha2("text", 256).alias("sha")
    )
    corpus_sha = (
        hashed.where(F.expr("doc_id % 10 <> 0")).select("sha").distinct()
    )
    batch = hashed.where(F.expr("doc_id % 10 = 0"))
    w = Window.partitionBy("sha").orderBy("doc_id")
    ranked = batch.withColumn("rn", F.row_number().over(w))
    return (
        ranked.join(
            corpus_sha.withColumn("in_corpus", F.lit(1)), "sha", "left"
        )
        .select(
            "doc_id",
            F.when(
                F.col("in_corpus").isNull() & (F.col("rn") == 1), "accept"
            )
            .when(F.col("in_corpus").isNull(), "dup_in_batch")
            .otherwise("dup_of_corpus")
            .alias("decision"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_sample_importance",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             least(1.0, CAST(n_chars AS DOUBLE) / 300.0) AS keep_p,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) / 4294967296.0 AS u
      FROM documents)
    SELECT doc_id, lang, round(keep_p, 6) AS keep_p
    FROM scored WHERE u < keep_p
    """,
    tags=("batch", "llm", "sampling"),
)
def q_sample_importance(spark, sf_dir):
    """Training-pipeline staple: IMPORTANCE sampling — keep each document
    with probability proportional to a quality/weight signal (here:
    length-proportional, capped at 1). The uniform draw is md5-derived
    from the stable id — identical on every engine and run, NO RNG
    state, so the sample is re-derivable anywhere (the property
    up/down-weighting pretraining sources requires for reproducibility).
    Pure map: no shuffle, no coordination, embarrassingly parallel at
    any scale."""
    t = tables(spark, sf_dir)
    keep_p = F.least(F.lit(1.0), F.col("n_chars").cast("double") / 300.0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        t.documents.select(
            "doc_id", "lang", keep_p.alias("keep_p"), u.alias("u")
        )
        .where(F.col("u") < F.col("keep_p"))
        .select("doc_id", "lang", F.round("keep_p", 6).alias("keep_p"))
    )


@register(
    "q_llm_mix_datasets",
    oracle="""
    WITH sizes AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
                   FROM documents GROUP BY lang),
    targets(lang, w) AS (VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.2),
                                ('es', 0.05), ('it', 0.05)),
    -- scale so the most-oversubscribed language is fully used
    ratios AS (SELECT s.lang, t.w / s.n AS r FROM sizes s
               JOIN targets t ON s.lang = t.lang),
    accept AS (SELECT lang, r / (SELECT max(r) FROM ratios) AS p FROM ratios)
    SELECT d.doc_id, d.lang, round(a.p, 6) AS accept_p
    FROM documents d
    JOIN accept a ON d.lang = a.lang
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0 < a.p
    """,
    tags=("batch", "llm", "sampling"),
)
def q_llm_mix_datasets(spark, sf_dir):
    """Training-pipeline staple: DATASET MIXING — subsample each source
    (here: language) so the surviving corpus matches target mixture
    weights, keeping the binding source intact (per-source acceptance
    p_s = (w_s/n_s) / max_s'(w_s'/n_s'), so the most-oversubscribed
    source passes whole and every other source downsamples to
    proportion). Acceptance draws are md5-deterministic per doc — the
    mixture is exactly reproducible. Plan: per-source counts (one agg),
    a 5-row ratio table broadcast back, then a pure filter map over the
    corpus — one shuffle total at any scale."""
    t = tables(spark, sf_dir)
    sizes = t.documents.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    targets = t.documents.sparkSession.createDataFrame(
        [("en", 0.5), ("de", 0.2), ("fr", 0.2), ("es", 0.05), ("it", 0.05)],
        "lang string, w double",
    )
    ratios = sizes.join(targets, "lang").select(
        "lang", (F.col("w") / F.col("n")).alias("r")
    )
    max_r = ratios.agg(F.max("r").alias("max_r"))
    accept = ratios.crossJoin(F.broadcast(max_r)).select(
        "lang", (F.col("r") / F.col("max_r")).alias("p")
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        t.documents.join(F.broadcast(accept), "lang")
        .where(u < F.col("p"))
        .select("doc_id", "lang", F.round("p", 6).alias("accept_p"))
    )


@register(
    "q_multimodal_resize",
    # attach_fake_media derives width = strlen%1024+1, height =
    # strlen%768+1; the resize geometry is pure arithmetic, so DuckDB
    # recomputes the whole stage from the text lengths.
    oracle="""
    WITH m AS (SELECT doc_id AS media_id,
                      strlen(text) % 1024 + 1 AS w,
                      strlen(text) % 768 + 1 AS h
               FROM documents),
    s AS (SELECT media_id, w, h,
                 least(1.0, 256.0 / greatest(w, h)) AS scale FROM m)
    SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(greatest(1, floor(w * scale)) AS INTEGER) AS out_width,
           CAST(greatest(1, floor(h * scale)) AS INTEGER) AS out_height
    FROM s
    """,
    tags=("batch", "llm", "multimodal", "pandas-udf"),
)
def q_multimodal_resize(spark, sf_dir):
    """K8 (resize stage): aspect-ratio-preserving fit into 256² via the
    Arrow-batched mapInPandas path a real image resize uses — geometry
    computed per batch in Python, payload column pruned away entirely
    (the plan never reads the bytes when only geometry is consumed).
    The arithmetic is value-checked against DuckDB recomputing it from
    the deterministic metadata."""
    from flink_quickstart_spark.operators.multimodal import (
        attach_fake_media,
        resize_plan,
    )

    t = tables(spark, sf_dir)
    media = attach_fake_media(t.documents, "doc_id", "text")
    return resize_plan(media, max_side=256)


@register(
    "q_llm_cooccur_pmi",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    tok2 AS (SELECT doc_id, word FROM tok WHERE word <> ''),
    wc AS (SELECT word, count(*) AS df FROM tok2 GROUP BY word),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    pairs AS (
      SELECT a.word AS w1, b.word AS w2, CAST(count(*) AS BIGINT) AS n_pair
      FROM tok2 a JOIN tok2 b ON a.doc_id = b.doc_id AND a.word < b.word
      GROUP BY a.word, b.word
    )
    SELECT w1, w2, n_pair,
           round(ln(CAST(n_pair AS DOUBLE) * n.n
                    / (CAST(ca.df AS DOUBLE) * cb.df)), 4) AS pmi
    FROM pairs
    JOIN wc ca ON pairs.w1 = ca.word
    JOIN wc cb ON pairs.w2 = cb.word
    CROSS JOIN n_docs n
    WHERE n_pair >= 20
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_cooccur_pmi(spark, sf_dir):
    """LLM-ext: word co-occurrence PMI — the collocation-mining /
    phrase-detection primitive (word2vec-era PMI matrices, quality
    filters for boilerplate phrase detection). Per-document DISTINCT
    tokens, self-joined within doc_id to undirected pairs (w1 < w2),
    then PMI = ln(P(w1,w2) / (P(w1)·P(w2))) with document frequencies
    as the probability estimates. Support floor n_pair ≥ 20 keeps the
    output the head of the distribution.

    Scale shape: the pair self-join is the textbook co-occurrence
    explosion — bounded here because it joins per-doc DISTINCT token
    lists (cost Σ tokens_d², not corpus²). At 100 TB the standard
    mitigations compose: per-doc token cap, document-frequency floor
    on the join input (a word seen once can't reach any support
    threshold), and the same hot-shingle DF cap used by the near-dup
    inverted index. Document frequencies broadcast back onto the pair
    aggregate — two shuffles total."""
    t = tables(spark, sf_dir)
    tok = (
        t.documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .where(F.col("word") != "")
        .distinct()
    )
    n_docs = t.documents.agg(
        F.countDistinct("doc_id").alias("n_docs")
    )  # 1-row scalar, broadcast-crossed below (waived pattern, no collect)
    wc = tok.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .groupBy(F.col("a.word").alias("w1"), F.col("b.word").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= 20)
    )
    return (
        pairs.join(wc.select(F.col("word").alias("w1"), F.col("df").alias("df1")), "w1")
        .join(wc.select(F.col("word").alias("w2"), F.col("df").alias("df2")), "w2")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    F.col("n_pair").cast("double")
                    * F.col("n_docs")
                    / (F.col("df1").cast("double") * F.col("df2"))
                ),
                4,
            ).alias("pmi"),
        )
    )


@register(
    "q_llm_global_shuffle",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS UBIGINT) AS BIGINT) AS h8
      FROM documents
    )
    SELECT doc_id, h8,
           CAST(row_number() OVER (ORDER BY h8, doc_id) AS BIGINT) AS pos
    FROM h
    """,
    tags=("batch", "llm", "sampling"),
)
def q_llm_global_shuffle(spark, sf_dir):
    """Training-pipeline staple: deterministic global shuffle — every
    epoch's data order must be reproducible (resumable training, bitwise
    re-runs), so the 'shuffle' is a SORT by a keyed hash, never an RNG.
    md5 of the stable id → first 8 hex chars as a bigint → global
    position over (hash, id).

    The global position comes from operators/rank.global_row_number:
    range-bucket on the hash, per-bucket window, prefix-summed offsets —
    NO single-reducer global window. At 100 TB the shuffle is a range
    partition by hash (uniform by construction — the hash is the value
    being bucketed), each bucket numbers independently, and the offsets
    are a driver-side vector of <= `buckets` longs."""
    from flink_quickstart_spark.operators.rank import global_row_number

    t = tables(spark, sf_dir)
    h = t.documents.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h8"),
    )
    return global_row_number(
        h, order_by=[F.col("h8").asc(), F.col("doc_id").asc()],
        bucket_col="h8", out_col="pos",
    ).select("doc_id", "h8", F.col("pos").cast("long").alias("pos"))


@register(
    "q_llm_shard_assign",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS UBIGINT) % 16 AS BIGINT) AS shard
      FROM documents
    ),
    per AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS shard_chars
      FROM assigned GROUP BY shard
    ),
    tot AS (SELECT sum(shard_chars) AS total_chars FROM per)
    SELECT shard, n_docs, shard_chars,
           round(shard_chars * 16.0 / total_chars, 4) AS balance
    FROM per CROSS JOIN tot
    """,
    tags=("batch", "llm", "sampling"),
)
def q_llm_shard_assign(spark, sf_dir):
    """Training-pipeline staple: output sharding — assign each doc to
    one of 16 shards by stable hash and report per-shard balance
    (shard bytes ÷ ideal share; 1.0 = perfectly even). The hash-mod
    assignment is a pure map (no shuffle to assign, one agg shuffle to
    audit); writing then becomes ``df.repartition(shard).write`` with
    each output file's size predictable from this audit. The balance
    column is the go/no-go signal for salting or re-sharding before a
    100 TB write fans out to fixed shard counts."""
    t = tables(spark, sf_dir)
    assigned = t.documents.select(
        "doc_id",
        "n_chars",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long"),
            F.lit(16),
        ).alias("shard"),
    )
    per = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("shard_chars"),
    )
    tot = per.agg(F.sum("shard_chars").alias("total_chars"))
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "shard_chars",
        F.round(F.col("shard_chars") * 16.0 / F.col("total_chars"), 4).alias(
            "balance"
        ),
    )


@register(
    "q_llm_heavy_hitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tok2 AS (SELECT word FROM tok WHERE word <> ''),
    tot AS (SELECT count(*) AS n_tokens FROM tok2)
    SELECT word, CAST(count(*) AS BIGINT) AS cnt,
           round(count(*) * 1.0 / n_tokens, 6) AS freq
    FROM tok2 CROSS JOIN tot
    GROUP BY word, n_tokens
    HAVING count(*) >= n_tokens * 0.02
    """,
    tags=("batch", "llm", "text", "approx"),
)
def q_llm_heavy_hitters(spark, sf_dir):
    """LLM-ext: φ-heavy hitters (φ=2%) over the token stream — the
    'which tokens dominate the corpus' question behind stopword
    derivation, tokenizer-vocab audits and hot-key detection. Sketch-
    then-verify: per-partition Misra-Gries summaries (≤64 rows per
    partition leave each task regardless of partition size — the wide
    pass never shuffles the token distribution) yield a guaranteed
    candidate SUPERSET, then one exact count over the broadcast
    candidate set applies the true threshold. Output is therefore
    exactly the true heavy hitters — the oracle is the plain exact
    frequency filter. See operators/freq.py for the pigeonhole bound."""
    from flink_quickstart_spark.operators.freq import heavy_hitters

    t = tables(spark, sf_dir)
    tokens = t.documents.select(
        F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    return heavy_hitters(tokens, "word", phi=0.02, capacity=64)


@register(
    "q_llm_xent_bigram",
    oracle="""
    WITH tok AS (
      SELECT doc_id, pos, word FROM (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE word <> ''
    ),
    bi AS (
      SELECT doc_id, word AS w1,
             lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok
    ),
    bi2 AS (SELECT doc_id, w1, w2 FROM bi WHERE w2 IS NOT NULL),
    c12 AS (SELECT w1, w2, count(*) AS n12 FROM bi2 GROUP BY w1, w2),
    c1  AS (SELECT w1, count(*) AS n1 FROM bi2 GROUP BY w1)
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-avg(ln(CAST(c12.n12 AS DOUBLE) / c1.n1)), 4) AS xent_bigram
    FROM bi2 b
    JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
    JOIN c1  ON b.w1 = c1.w1
    GROUP BY b.doc_id
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_xent_bigram(spark, sf_dir):
    """LLM-ext: per-document cross-entropy under the corpus BIGRAM LM —
    the next rung above q_llm_xent_unigram on the model-based-quality
    ladder (context-sensitive: a doc of common words in uncommon ORDER
    now scores high). P(w2|w1) = c(w1,w2)/c(w1·) estimated from the
    corpus itself; per-doc score = −avg ln P over its bigrams.

    Scale shape: one tokenization pass with positions, bigrams from a
    per-doc lead() window (partition-local after one doc_id shuffle),
    then two count aggregates joined back — the bigram vocabulary is
    the only wide side and it shuffles once. No smoothing needed: the
    LM is fit on the scored corpus, so every observed bigram has
    positive count."""
    t = tables(spark, sf_dir)
    tok = (
        t.documents.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        .where(F.col("word") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        tok.select(
            "doc_id",
            F.col("word").alias("w1"),
            F.lead("word").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    return (
        bi.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.avg(F.log(F.col("n12").cast("double") / F.col("n1"))), 4
            ).alias("xent_bigram"),
        )
    )


@register(
    "q_sample_temperature",
    oracle="""
    WITH per AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n_docs) AS n FROM per),
    scored AS (
      SELECT lang, n_docs,
             CAST(n_docs AS DOUBLE) / n AS p,
             pow(CAST(n_docs AS DOUBLE) / n, 0.7) AS p_tau
      FROM per CROSS JOIN tot
    ),
    z AS (SELECT sum(p_tau) AS z FROM scored)
    SELECT lang, n_docs,
           round(p, 6)               AS p,
           round(p_tau / z, 6)       AS q,
           round(p_tau / z / p, 6)   AS sample_weight
    FROM scored CROSS JOIN z
    """,
    tags=("batch", "llm", "sampling"),
)
def q_sample_temperature(spark, sf_dir):
    """LLM-ext: temperature-scaled language resampling (the mBERT /
    XLM-R exponential-smoothing recipe, τ=0.7): target share
    q_l ∝ p_l^τ upweights low-resource languages; the emitted
    ``sample_weight`` = q_l/p_l is the per-document acceptance/
    repetition factor a pipeline multiplies into its sampler. Pure
    aggregate math — two scalar broadcasts (corpus total, normalizer),
    no shuffle beyond the per-lang count."""
    t = tables(spark, sf_dir)
    per = t.documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(F.sum("n_docs").cast("double").alias("n"))
    scored = per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.col("n_docs") / F.col("n")).alias("p"),
        F.pow(F.col("n_docs") / F.col("n"), 0.7).alias("p_tau"),
    )
    z = scored.agg(F.sum("p_tau").alias("z"))
    return scored.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        F.round("p", 6).alias("p"),
        F.round(F.col("p_tau") / F.col("z"), 6).alias("q"),
        F.round(F.col("p_tau") / F.col("z") / F.col("p"), 6).alias(
            "sample_weight"
        ),
    )


@register(
    "q_dq_sequence_gaps",
    oracle="""
    WITH seq AS (
      SELECT event_id,
             lag(event_id) OVER (ORDER BY event_id) AS prev_id
      FROM events
    ),
    gaps AS (
      SELECT prev_id + 1 AS gap_start, event_id - 1 AS gap_end,
             event_id - prev_id - 1 AS n_missing
      FROM seq WHERE event_id - prev_id > 1
    )
    SELECT CAST(count(*) AS BIGINT)                      AS n_gaps,
           CAST(coalesce(sum(n_missing), 0) AS BIGINT)   AS n_missing_total,
           CAST(coalesce(max(n_missing), 0) AS BIGINT)   AS widest_gap,
           CAST(coalesce(min(gap_start), -1) AS BIGINT)  AS first_gap_start
    FROM gaps
    """,
    tags=("batch", "llm", "quality"),
)
def q_dq_sequence_gaps(spark, sf_dir):
    """DQ-ext: sequence-gap detection — the completeness audit for any
    monotonically-keyed feed (Kafka offsets, CDC LSNs, event ids): find
    every hole in the id sequence, its width, and the total missing
    count.

    A naive ``lag() OVER (ORDER BY id)`` is a single-reducer window at
    scale, so this uses the two-level bucketed formulation: ids hash
    into 4096-wide ranges (``id DIV 4096``), intra-bucket gaps come
    from a lag window PARTITIONED by bucket (fully parallel), and
    cross-bucket gaps from a lag over the per-bucket (min, max, count)
    aggregate — ≤ range/4096 rows, aggregate-sized, the same
    small-side concession as the two-phase rank's offset vector. Empty
    buckets between non-adjacent buckets are themselves gaps and fall
    out of the boundary lag naturally."""
    t = tables(spark, sf_dir)
    B = 4096
    ids = t.events.select(
        "event_id", (F.col("event_id") - (F.col("event_id") % B)).alias("bucket")
    )
    intra_w = Window.partitionBy("bucket").orderBy("event_id")
    intra = (
        ids.select(
            "event_id", F.lag("event_id").over(intra_w).alias("prev_id")
        )
        .where(F.col("event_id") - F.col("prev_id") > 1)
        .select(
            (F.col("prev_id") + 1).alias("gap_start"),
            (F.col("event_id") - F.col("prev_id") - 1).alias("n_missing"),
        )
    )
    # Bucket summaries: tiny (range/B rows); boundary gaps between the
    # max of one non-empty bucket and the min of the next.
    summaries = ids.groupBy("bucket").agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    bound_w = Window.orderBy("bucket")
    inter = (
        summaries.select(
            "lo", F.lag("hi").over(bound_w).alias("prev_hi")
        )
        .where(F.col("lo") - F.col("prev_hi") > 1)
        .select(
            (F.col("prev_hi") + 1).alias("gap_start"),
            (F.col("lo") - F.col("prev_hi") - 1).alias("n_missing"),
        )
    )
    gaps = intra.unionByName(inter)
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.coalesce(F.sum("n_missing"), F.lit(0)).alias("n_missing_total"),
        F.coalesce(F.max("n_missing"), F.lit(0)).alias("widest_gap"),
        F.coalesce(F.min("gap_start"), F.lit(-1)).alias("first_gap_start"),
    )


@register(
    "q_llm_dedup_prefix",
    oracle="""
    WITH pref AS (
      SELECT doc_id, lang,
             md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS pfp
      FROM documents
    ),
    grp AS (
      SELECT pfp, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(min(doc_id) AS BIGINT)   AS keep_id
      FROM pref GROUP BY pfp
      HAVING count(*) > 1
    )
    SELECT p.pfp, g.n_docs, g.keep_id,
           CAST(p.doc_id AS BIGINT) AS drop_id
    FROM pref p JOIN grp g ON p.pfp = g.pfp
    WHERE p.doc_id <> g.keep_id
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_dedup_prefix(spark, sf_dir):
    """K-ext: prefix-fingerprint dedup — hash of the first 8 tokens.
    Catches template/boilerplate-start duplicates that full-content
    hashing misses (same opening, divergent tails: mirrored articles,
    re-crawls with appended footers) and that shingle Jaccard only
    finds at quadratic candidate cost. One md5 over a bounded prefix →
    one shuffle on the 16-byte fingerprint → keep the lowest id per
    collision group, emit the drops. At 100 TB this is the cheap first
    pass BEFORE near-dup: constant work per doc regardless of doc
    length, fingerprint cardinality ≈ corpus size."""
    t = tables(spark, sf_dir)
    pfp = F.md5(
        F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
    )
    pref = t.documents.select("doc_id", pfp.alias("pfp"))
    grp = (
        pref.groupBy("pfp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .where(F.col("n_docs") > 1)
    )
    return (
        pref.join(grp, "pfp")
        .where(F.col("doc_id") != F.col("keep_id"))
        .select("pfp", "n_docs", "keep_id", F.col("doc_id").alias("drop_id"))
    )


@register(
    "q_text_repetition",
    oracle="""
    WITH tok AS (
      SELECT doc_id, pos, word FROM (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE word <> ''
    ),
    bi AS (
      SELECT doc_id, word || ' ' || lead(word) OVER (
               PARTITION BY doc_id ORDER BY pos) AS bigram
      FROM tok
    ),
    bc AS (
      SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS c
      FROM bi WHERE bigram IS NOT NULL GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           round(1.0 - CAST(count(*) AS DOUBLE) / sum(c), 6)
             AS dup_bigram_frac,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_bigram_frac
    FROM bc GROUP BY doc_id HAVING sum(c) >= 5
    """,
    tags=("batch", "llm", "text"),
)
def q_text_repetition(spark, sf_dir):
    """LLM-ext: within-document repetition signals — the Gopher
    repetition battery's n-gram half: the fraction of word-bigram
    occurrences that are repeats (1 - distinct/total) and the share
    taken by the single most frequent bigram. Boilerplate, keyword
    stuffing, and degenerate-generation text all light up here while
    passing length/stopword checks.

    Scale shape: tokenize + adjacent-pair construction entirely inside
    array expressions (no shuffle until the per-(doc,bigram) count),
    then two hash aggregates keyed by doc_id — linear in corpus size,
    no Python. Docs with <5 bigrams excluded (ratios unstable)."""
    t = tables(spark, sf_dir)
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    bigrams = F.expr(
        "transform(sequence(0, size(toks) - 2),"
        " i -> concat(toks[i], ' ', toks[i + 1]))"
    )
    bi = (
        t.documents.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
    )
    bc = bi.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    return (
        bc.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.round(
                1.0 - F.count(F.lit(1)).cast("double") / F.sum("c"), 6
            ).alias("dup_bigram_frac"),
            F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
                "top_bigram_frac"
            ),
        )
        .where(F.col("n_bigrams") >= 5)
    )


@register(
    "q_llm_tfidf_cosine",
    oracle="""
    WITH tf AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE word <> '' GROUP BY doc_id, word
    ),
    df AS (
      SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id, tf.word,
             tf.tf * ln(1.0 + n.n_docs / df.df) AS wt
      FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
      WHERE df.df <= 100
    ),
    norms AS (
      SELECT doc_id, sqrt(sum(wt * wt)) AS nrm FROM w GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.wt * b.wt) AS dot
      FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT d1, d2, round(dot / (x.nrm * y.nrm), 6) AS cos_sim
    FROM dots JOIN norms x ON d1 = x.doc_id JOIN norms y ON d2 = y.doc_id
    WHERE x.nrm > 0 AND y.nrm > 0 AND dot / (x.nrm * y.nrm) >= 0.5
    """,
    tags=("batch", "llm", "dedup", "similarity"),
)
def q_llm_tfidf_cosine(spark, sf_dir):
    """LLM-ext: sparse TF-IDF cosine similarity between document pairs —
    the lexical-similarity tier between shingle-Jaccard (surface
    overlap) and embedding cosine (semantic): weighted-term dot
    products, so near-dups with light paraphrasing still score. Weight
    = tf * ln(1 + N/df); pairs at cos >= 0.5 emitted.

    Scale shape: an inverted-index (term-postings) self-join — pairs
    meet only on shared terms, never all-pairs — with the same
    document-frequency cap as q_llm_neardup (terms with df > 100
    dropped on BOTH sides; stopword-grade terms carry ~no IDF weight
    and would otherwise quadratically blow up the hottest postings
    lists). One shuffle builds tf, one the postings join; norms join
    back broadcast-sized."""
    t = tables(spark, sf_dir)
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    tf = (
        t.documents.select("doc_id", F.explode(toks).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = t.documents.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    w = (
        tf.join(df.where(F.col("df") <= 100), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            (
                F.col("tf") * F.log(1.0 + F.col("n_docs") / F.col("df"))
            ).alias("wt"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.sum(F.col("a.wt") * F.col("b.wt")).alias("dot"))
    )
    x = norms.alias("x")
    y = norms.alias("y")
    cos = F.col("dot") / (F.col("x.nrm") * F.col("y.nrm"))
    return (
        dots.join(x, F.col("d1") == F.col("x.doc_id"))
        .join(y, F.col("d2") == F.col("y.doc_id"))
        .where((F.col("x.nrm") > 0) & (F.col("y.nrm") > 0) & (cos >= 0.5))
        .select("d1", "d2", F.round(cos, 6).alias("cos_sim"))
    )


@register(
    "q_llm_domain_budget",
    oracle="""
    WITH per_source AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(list_filter(string_split(text, ' '),
                                      w -> w <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS z FROM per_source)
    SELECT source, n_docs, n_tokens,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / tot.z, 6) AS alloc_frac,
           CAST(floor(1000000 * sqrt(CAST(n_tokens AS DOUBLE)) / tot.z)
                AS BIGINT) AS budget_tokens
    FROM per_source CROSS JOIN tot
    """,
    tags=("batch", "llm", "sampling"),
)
def q_llm_domain_budget(spark, sf_dir):
    """LLM-ext: per-domain token-budget allocation under sqrt-scaling —
    the mixture-design step between corpus stats and sampling: each
    source's share of a fixed training budget is proportional to the
    square root of its token mass (the standard up-weight-the-tail
    compromise between proportional and uniform mixing; cf. the
    temperature resampling key, of which sqrt is the tau=2 point).
    Emits the audit table: docs, tokens, allocated fraction, and the
    floor'd token budget out of 1M.

    Scale shape: one hash aggregate to per-source totals (token counts
    computed inside an array expression — no explode, no shuffle of
    token rows), then scalar normalization against the broadcast
    1-row total. O(#sources) output."""
    t = tables(spark, sf_dir)
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    per_source = t.documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok.cast("long")).alias("n_tokens"),
    )
    tot = per_source.agg(
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("z")
    )
    s = F.sqrt(F.col("n_tokens").cast("double"))
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(s / F.col("z"), 6).alias("alloc_frac"),
        F.floor(1000000 * s / F.col("z")).cast("long").alias("budget_tokens"),
    )


@register(
    "q_anon_kanonymity",
    oracle="""
    WITH qi AS (
      SELECT event_type,
             EXTRACT(hour FROM ts) AS hr,
             user_id % 100 AS cohort,
             CAST(count(*) AS BIGINT) AS grp_size
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN grp_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(sum(CASE WHEN grp_size < 5 THEN grp_size ELSE 0 END)
                AS BIGINT) AS rows_at_risk,
           round(CAST(sum(CASE WHEN grp_size < 5 THEN grp_size ELSE 0 END)
                 AS DOUBLE) / sum(grp_size), 6) AS frac_at_risk
    FROM qi GROUP BY event_type
    """,
    tags=("batch", "agg", "privacy"),
)
def q_anon_kanonymity(spark, sf_dir):
    """Privacy-ext: k-anonymity audit over a quasi-identifier tuple —
    before events ship to a training corpus, count how many
    (event_type, hour-of-day, user-cohort) equivalence classes have
    fewer than k=5 members and what fraction of rows sit in them: the
    re-identification exposure report that gates release (small groups
    must be suppressed or generalized).

    Scale shape: two stacked hash aggregates — rows to QI-group sizes,
    group sizes to per-event_type exposure — both partial+final,
    map-side combined; the second input is one row per QI group."""
    t = tables(spark, sf_dir)
    qi = t.events.groupBy(
        "event_type",
        F.hour("ts").alias("hr"),
        (F.col("user_id") % 100).alias("cohort"),
    ).agg(F.count(F.lit(1)).alias("grp_size"))
    small = F.when(F.col("grp_size") < 5, F.col("grp_size")).otherwise(0)
    return qi.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("grp_size") < 5, 1).otherwise(0)).alias(
            "n_small_groups"
        ),
        F.sum(small).alias("rows_at_risk"),
        F.round(
            F.sum(small).cast("double") / F.sum("grp_size"), 6
        ).alias("frac_at_risk"),
    )


def sign_bit_words(embeddings: DataFrame) -> DataFrame:
    """(vec_id, w0, w1): the 64-dim embedding packed into two 32-bit sign
    words — bit i set iff component i > 0, words split at dim 32 so every
    partial sum stays exactly representable. Shared by the registered
    ``q_embed_sign_bits`` builder and its invariant test so the test
    exercises the production packing expression, not a re-derivation."""

    def word(lo: int, hi: int, shift: int):
        return F.expr(
            f"aggregate(sequence({lo}, {hi}), CAST(0 AS BIGINT),"
            f" (acc, i) -> acc + IF(element_at(embedding, i + 1) > 0,"
            f" shiftleft(CAST(1 AS BIGINT), i - {shift}), CAST(0 AS BIGINT)))"
        )

    return embeddings.select(
        "vec_id",
        word(0, 31, 0).alias("w0"),
        word(32, 63, 32).alias("w1"),
    )


@register(
    "q_embed_sign_bits",
    oracle="""
    WITH bits AS (
      SELECT vec_id,
             CAST((SELECT sum(CASE WHEN u.x > 0
                              THEN CAST(power(2, u.i - 1) AS BIGINT)
                              ELSE 0 END)
                   FROM (SELECT unnest(embedding) AS x,
                                generate_subscripts(embedding, 1) AS i) u
                   WHERE u.i <= 32) AS BIGINT) AS w0,
             CAST((SELECT sum(CASE WHEN u.x > 0
                              THEN CAST(power(2, u.i - 33) AS BIGINT)
                              ELSE 0 END)
                   FROM (SELECT unnest(embedding) AS x,
                                generate_subscripts(embedding, 1) AS i) u
                   WHERE u.i > 32) AS BIGINT) AS w1
      FROM embeddings
    )
    SELECT w0, w1,
           CAST(count(*) AS BIGINT)   AS n_vecs,
           CAST(min(vec_id) AS BIGINT) AS keep_id
    FROM bits GROUP BY w0, w1 HAVING count(*) >= 2
    """,
    tags=("batch", "llm", "similarity"),
)
def q_embed_sign_bits(spark, sf_dir):
    """LLM-ext: sign-bit binarization of embeddings — the 64-dim float
    vector collapses to two 32-bit words of sign bits (the zero-cost
    special case of random-hyperplane LSH where the hyperplanes are the
    axes), then exact-collision groups are candidate semantic
    duplicates. 32 bytes/vector → 8 bytes: the compaction that makes
    billion-vector candidate generation a plain hash aggregate.

    Scale shape: bit packing runs inside an array-fold expression (no
    explode — each row does 64 comparisons in codegen), then one hash
    aggregate on the fingerprint. Identical packing on both engines:
    bit i set iff component i > 0, words split at dim 32 so every
    partial sum stays exactly representable."""
    t = tables(spark, sf_dir)
    bits = sign_bit_words(t.embeddings)
    return (
        bits.groupBy("w0", "w1")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("vec_id").alias("keep_id"),
        )
        .where(F.col("n_vecs") >= 2)
    )


@register(
    "q_llm_dedup_paragraph",
    oracle="""
    WITH sents AS (
      SELECT DISTINCT doc_id, sent FROM (
        SELECT doc_id, trim(unnest(string_split(text, '.'))) AS sent
        FROM documents
      ) WHERE len(list_filter(string_split(sent, ' '), w -> w <> '')) >= 3
    ),
    support AS (
      SELECT sent, CAST(count(*) AS BIGINT) AS n_docs
      FROM sents GROUP BY sent
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_sents,
           CAST(sum(CASE WHEN p.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_sents,
           round(CAST(sum(CASE WHEN p.n_docs > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS shared_frac
    FROM sents s JOIN support p ON s.sent = p.sent
    GROUP BY s.doc_id
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_dedup_paragraph(spark, sf_dir):
    """LLM-ext: sub-document (sentence-level) dedup — the C4-style
    granularity between exact whole-doc hashing and span n-grams:
    sentences of >= 3 words, deduped within-doc, then cross-corpus
    support counts; each doc reports how many of its sentences appear
    verbatim in OTHER documents (boilerplate, license headers, quoted
    chain text). Docs above a shared_frac threshold get dropped or
    trimmed by the cascade.

    Scale shape: explode to distinct (doc, sentence), one hash
    aggregate for sentence support, one hash join back (sentence-keyed
    — in production the join key is a sentence HASH, here the raw
    string so the oracle is expressible), one per-doc aggregate.
    Linear in sentence mass; no all-pairs anywhere."""
    t = tables(spark, sf_dir)
    words = F.filter(F.split(F.col("sent"), r"\s+"), lambda x: x != "")
    sents = (
        t.documents.select(
            "doc_id", F.explode(F.split("text", r"\.")).alias("raw")
        )
        .select("doc_id", F.trim("raw").alias("sent"))
        .where(F.size(words) >= 3)
        .distinct()
    )
    support = sents.groupBy("sent").agg(F.count(F.lit(1)).alias("n_docs"))
    shared = F.when(F.col("n_docs") > 1, 1).otherwise(0)
    return (
        sents.join(support, "sent")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sents"),
            F.sum(shared).alias("n_shared_sents"),
            F.round(
                F.sum(shared).cast("double") / F.count(F.lit(1)), 6
            ).alias("shared_frac"),
        )
    )


@register(
    "q_llm_vocab_growth",
    oracle="""
    WITH words AS (
      SELECT doc_id % 10 AS bucket, word FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE word <> ''
    ),
    tok_per_bucket AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
      FROM words GROUP BY bucket
    ),
    first_seen AS (
      SELECT word, min(bucket) AS first_bucket FROM words GROUP BY word
    ),
    new_per_bucket AS (
      SELECT first_bucket AS bucket, CAST(count(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY first_bucket
    )
    SELECT t.bucket,
           CAST(sum(t2.n_tokens) AS BIGINT) AS cum_tokens,
           CAST(sum(coalesce(n2.n_new, 0)) AS BIGINT) AS vocab_size
    FROM tok_per_bucket t
    JOIN tok_per_bucket t2 ON t2.bucket <= t.bucket
    LEFT JOIN new_per_bucket n2 ON n2.bucket = t2.bucket
    GROUP BY t.bucket
    """,
    tags=("batch", "llm", "text"),
)
def q_llm_vocab_growth(spark, sf_dir):
    """LLM-ext: vocabulary-growth (Heaps'-law) curve — cumulative
    distinct-word count as the corpus grows, the sanity check behind
    tokenizer-vocab sizing and dedup verification (a deduped corpus
    grows vocabulary faster per token). Cumulative DISTINCT is the
    classically expensive part; it reduces to a linear program via
    first-occurrence attribution: each word contributes +1 to the
    bucket where it FIRST appears, so the curve is a running sum over
    per-bucket counts.

    Scale shape: one min-aggregate per word (the only vocabulary-wide
    shuffle), one count per bucket, then the cumulative join runs over
    the 10-row bucket table. Never materializes a per-prefix distinct."""
    t = tables(spark, sf_dir)
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    words = t.documents.select(
        (F.col("doc_id") % 10).alias("bucket"),
        F.explode(toks).alias("word"),
    )
    tok_per_bucket = words.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    new_per_bucket = (
        words.groupBy("word")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    t1 = tok_per_bucket.alias("t")
    t2 = tok_per_bucket.alias("t2")
    n2 = new_per_bucket.alias("n2")
    return (
        t1.join(t2, F.col("t2.bucket") <= F.col("t.bucket"))
        .join(n2, F.col("n2.bucket") == F.col("t2.bucket"), "left")
        .groupBy(F.col("t.bucket").alias("bucket"))
        .agg(
            F.sum("t2.n_tokens").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n2.n_new"), F.lit(0))).alias(
                "vocab_size"
            ),
        )
    )


@register(
    "q_llm_token_len_hist",
    oracle="""
    WITH lens AS (
      SELECT CAST(floor(log2(len(list_filter(string_split(text, ' '),
                                             w -> w <> '')))) AS BIGINT)
               AS log2_bucket
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), w -> w <> '')) >= 1
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lens)
    SELECT log2_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) / tot.n, 6) AS share
    FROM lens CROSS JOIN tot
    GROUP BY log2_bucket, tot.n
    """,
    tags=("batch", "llm", "profiling"),
)
def q_llm_token_len_hist(spark, sf_dir):
    """LLM-ext: document-length histogram in log2 token buckets — the
    sequence-length planning input for packing (q_llm_pack_sequences)
    and truncation policy: how much of the corpus lives at each length
    scale. Token counting stays inside an array expression; the
    histogram is one hash aggregate over a handful of buckets.

    Scale shape: no explode — each doc contributes one pre-bucketed
    row to a partial+final aggregate; the share normalizer is a 1-row
    broadcast scalar."""
    t = tables(spark, sf_dir)
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
    lens = t.documents.where(n_tok >= 1).select(
        F.floor(F.log2(n_tok.cast("double"))).cast("long").alias(
            "log2_bucket"
        )
    )
    tot = lens.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        lens.crossJoin(F.broadcast(tot))
        .groupBy("log2_bucket", "n")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "log2_bucket",
            "n_docs",
            F.round(F.col("n_docs") / F.col("n"), 6).alias("share"),
        )
    )


@register(
    "q_sample_group_topk_hash",
    oracle="""
    SELECT source, doc_id, rn FROM (
      SELECT source, doc_id,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS rn
      FROM documents
    ) WHERE rn <= 5
    """,
    tags=("batch", "llm", "sampling"),
)
def q_sample_group_topk_hash(spark, sf_dir):
    """LLM-ext: exact-k uniform sample per group — k=5 documents per
    source, drawn by ranking on md5(doc_id): a deterministic,
    engine-reproducible stand-in for per-group reservoir sampling
    (the hash order is uniform-pseudorandom but re-derivable anywhere,
    unlike rand()-based reservoirs). Complements q_sample_stratified's
    FRACTION-based hash threshold: that can't promise a count; this
    promises exactly min(k, group size).

    Scale shape: one shuffle on the group key, per-group top-k via
    rank — Catalyst inserts WindowGroupLimit so each partition keeps
    only k candidates before and after the shuffle (the same
    optimization q_topk_pergroup is plan-asserted on); never a global
    sort."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        t.documents.select(
            "source", "doc_id", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") <= 5)
        .select("source", "doc_id", F.col("rn").cast("long").alias("rn"))
    )


@register(
    "q_llm_novelty",
    oracle="""
    WITH tok AS (
      SELECT doc_id, pos, word FROM (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE word <> ''
    ),
    tri AS (
      SELECT DISTINCT doc_id,
             word || ' ' || lead(word, 1) OVER w || ' '
                  || lead(word, 2) OVER w AS trigram
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(word, 2) OVER w IS NOT NULL
    ),
    first_seen AS (
      SELECT trigram, CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM tri GROUP BY trigram
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(sum(CASE WHEN f.first_doc = t.doc_id
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS novelty
    FROM tri t JOIN first_seen f ON t.trigram = f.trigram
    GROUP BY t.doc_id
    """,
    tags=("batch", "llm", "dedup", "text"),
)
def q_llm_novelty(spark, sf_dir):
    """LLM-ext: incremental novelty scoring — processing the corpus in
    doc_id order, what fraction of each document's word-trigrams has
    never been seen before? The curriculum/ordering signal (late
    near-duplicates score ~0) and the online-dedup admission test, via
    the same first-occurrence attribution as q_llm_vocab_growth: a
    trigram is "novel" for exactly the doc with the minimum doc_id
    containing it.

    Scale shape: trigrams from array expressions (distinct per doc),
    one min-aggregate over the trigram vocabulary — the only wide
    shuffle — then a hash join back and a per-doc aggregate. Linear;
    the streaming twin keeps the seen-set as keyed state."""
    t = tables(spark, sf_dir)
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    trigrams = F.expr(
        "transform(sequence(0, size(toks) - 3),"
        " i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]))"
    )
    tri = (
        t.documents.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 3)
        .select("doc_id", F.explode(trigrams).alias("trigram"))
        .distinct()
    )
    first_seen = tri.groupBy("trigram").agg(
        F.min("doc_id").alias("first_doc")
    )
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        tri.join(first_seen, "trigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(novel).alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
    )


@register(
    "q_llm_winnowing",
    oracle="""
    WITH tok AS (
      SELECT doc_id, pos, word FROM (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE word <> ''
    ),
    tri AS (
      SELECT doc_id, pos,
             CAST(('0x' || substr(md5(word || ' '
                    || lead(word, 1) OVER w || ' '
                    || lead(word, 2) OVER w), 1, 15)) AS BIGINT) AS h
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(word, 2) OVER w IS NOT NULL
    ),
    wins AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM tri
      QUALIFY lead(h, 3) OVER (PARTITION BY doc_id ORDER BY pos)
              IS NOT NULL
    ),
    selected AS (SELECT DISTINCT doc_id, fp FROM wins),
    df AS (
      SELECT fp FROM selected GROUP BY fp HAVING count(*) <= 100
    ),
    capped AS (SELECT s.* FROM selected s JOIN df USING (fp))
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM capped a JOIN capped b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_winnowing(spark, sf_dir):
    """K2d: full MOSS-style winnowing — the fingerprint-SET tier above
    q_text_fingerprint's single min-hash: hash every word trigram
    (portable md5-60), slide a 4-window over the hash sequence keeping
    each window's MINIMUM (the winnowing guarantee: any match of >=
    window+k-gram length shares a selected fingerprint), dedup the
    selections per doc, and report document pairs sharing >= 2
    fingerprints — the local-plagiarism/near-dup detector that catches
    PARTIAL overlap exact-hash dedup misses.

    Scale shape: selection is per-doc windows (one doc_id shuffle);
    density drops ~2/(window+1) before any join; the pair join is an
    inverted index on the selected fingerprint with the standard df<=100
    hot-fingerprint cap — never all-pairs. Same shape as q_llm_neardup
    with a provably-sampled shingle set."""
    t = tables(spark, sf_dir)
    tok = (
        t.documents.select(
            "doc_id",
            F.posexplode(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            ).alias("pos", "word"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = (
        tok.select(
            "doc_id",
            "pos",
            F.concat_ws(
                " ", "word", F.lead("word", 1).over(w), F.lead("word", 2).over(w)
            ).alias("s"),
            F.lead("word", 2).over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    winw = w.rowsBetween(Window.currentRow, 3)
    # r13-opt (§5): the selected-fingerprint set feeds the df cap AND
    # both sides of the pair self-join — four executions of the
    # explode + double-window + distinct chain without materialization.
    # Columnar cache, spills, drainable via release_tracked_persists.
    from flink_quickstart_spark.session import tracked_persist

    wins = tracked_persist(
        tri.select(
            "doc_id",
            F.min("h").over(winw).alias("fp"),
            F.lead("h", 3).over(w).alias("h3"),
        )
        .where(F.col("h3").isNotNull())
        .select("doc_id", "fp")
        .distinct()
    )
    df_ok = wins.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") <= 100
    )
    capped = wins.join(df_ok.select("fp"), "fp")
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 2)
    )


@register(
    "q_embed_dim_stats",
    oracle="""
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(x), 6) AS mean_x,
           round(sqrt(avg(x * x) - avg(x) * avg(x)), 6) AS std_x,
           round(min(x), 6) AS min_x,
           round(max(x), 6) AS max_x
    FROM (
      SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    GROUP BY dim
    """,
    tags=("batch", "llm", "similarity", "profiling"),
)
def q_embed_dim_stats(spark, sf_dir):
    """LLM-ext: per-dimension embedding statistics — the drift/health
    monitor for a vector corpus: mean/std/min/max for each of the 64
    dimensions (population std from explicit raw moments — engine-
    stable). Dead dimensions (std ~ 0), mean shift between snapshots,
    and range blowups (bad normalization upstream) all show here; it's
    also the input for deciding quantization scales
    (q_embed_quantize_int8) and binarization validity
    (q_embed_sign_bits).

    Scale shape: posexplode to (dim, value) then one hash aggregate
    onto 64 groups — partial+final, map-side combined; output is
    constant-size."""
    t = tables(spark, sf_dir)
    return (
        t.embeddings.select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "x"
            )
        )
        .select((F.col("pos") + 1).cast("long").alias("dim"), "x")
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("x"), 6).alias("mean_x"),
            F.round(
                F.sqrt(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")),
                6,
            ).alias("std_x"),
            F.round(F.min("x"), 6).alias("min_x"),
            F.round(F.max("x"), 6).alias("max_x"),
        )
    )


@register(
    "q_text_halves_overlap",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS toks
      FROM documents
    ),
    halves AS (
      SELECT doc_id,
             list_distinct(list_slice(toks, 1, len(toks) // 2)) AS h1,
             list_distinct(list_slice(toks, len(toks) // 2 + 1,
                                      len(toks))) AS h2
      FROM t WHERE len(toks) >= 10
    )
    SELECT doc_id,
           CAST(len(h1) AS BIGINT) AS n_h1,
           CAST(len(h2) AS BIGINT) AS n_h2,
           CAST(len(list_intersect(h1, h2)) AS BIGINT) AS n_common,
           round(CAST(len(list_intersect(h1, h2)) AS DOUBLE)
                 / (len(h1) + len(h2) - len(list_intersect(h1, h2))), 6)
             AS jaccard_halves
    FROM halves
    """,
    tags=("batch", "llm", "text"),
)
def q_text_halves_overlap(spark, sf_dir):
    """LLM-ext: intra-document half-overlap — the Jaccard similarity
    between a document's first and second half vocabularies: template
    pages, mirrored boilerplate and copy-paste padding score high while
    natural prose scores low (vocabulary shifts as a document
    progresses). Also exercises the array SET-operation surface
    (slice, distinct, intersect) that H5 covers only partially.

    Scale shape: everything happens inside array expressions on each
    row — slice, distinct, intersect are per-row, no explode and NO
    shuffle at all before the (absent) aggregation; the operator is a
    pure projection and scales with scan bandwidth."""
    t = tables(spark, sf_dir)
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    half = (F.size("toks") / 2).cast("int")
    base = (
        t.documents.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= 10)
        .select(
            "doc_id",
            F.array_distinct(F.slice("toks", 1, half)).alias("h1"),
            F.array_distinct(
                F.expr(
                    "slice(toks, CAST(size(toks) / 2 AS INT) + 1,"
                    " size(toks) - CAST(size(toks) / 2 AS INT))"
                )
            ).alias("h2"),
        )
    )
    n_common = F.size(F.array_intersect("h1", "h2"))
    return base.select(
        "doc_id",
        F.size("h1").cast("long").alias("n_h1"),
        F.size("h2").cast("long").alias("n_h2"),
        n_common.cast("long").alias("n_common"),
        F.round(
            n_common.cast("double")
            / (F.size("h1") + F.size("h2") - n_common),
            6,
        ).alias("jaccard_halves"),
    )


@register(
    "q_llm_dedup_cascade",
    oracle="""
    WITH base AS (SELECT doc_id, text FROM documents),
    s1 AS (  -- stage 1: exact content hash, keep min doc_id per group
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM base
      ) WHERE rn = 1
    ),
    s2 AS (  -- stage 2: 8-word prefix fingerprint over s1 survivors
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               row_number() OVER (
                 PARTITION BY md5(array_to_string(
                   string_split(text, ' ')[1:8], ' '))
                 ORDER BY doc_id) AS rn
        FROM s1
      ) WHERE rn = 1
    ),
    counts AS (
      SELECT (SELECT count(*) FROM base) AS n0,
             (SELECT count(*) FROM s1)   AS n1,
             (SELECT count(*) FROM s2)   AS n2
    )
    SELECT stage, n_removed, n_remaining FROM (
      SELECT 1 AS ord, 'exact_sha' AS stage,
             CAST(n0 - n1 AS BIGINT) AS n_removed,
             CAST(n1 AS BIGINT) AS n_remaining FROM counts
      UNION ALL
      SELECT 2, 'prefix_fp', CAST(n1 - n2 AS BIGINT),
             CAST(n2 AS BIGINT) FROM counts
    ) ORDER BY ord
    """,
    tags=("batch", "llm", "dedup"),
)
def q_llm_dedup_cascade(spark, sf_dir):
    """K1-capstone: the dedup CASCADE report — cheap tiers first, each
    stage filtering the previous stage's survivors: (1) exact content
    hash (md5, keep min doc_id), (2) 8-word prefix fingerprint. Emits
    removed/remaining per stage — the admission funnel every corpus
    build logs before the expensive near-dup tiers (MinHash, winnowing,
    embedding cosine) run on what's left. Ordering the tiers by cost is
    the scale decision: each stage's input is the previous stage's
    output, so the costly tiers see the smallest corpus.

    Scale shape: each stage is one hash-partitioned window (rank per
    fingerprint group) over the shrinking survivor set — linear per
    stage; counts are scalar aggregates."""
    t = tables(spark, sf_dir)
    base = t.documents.select("doc_id", "text")

    def survivors(df, fp_col):
        w = Window.partitionBy("fp").orderBy("doc_id")
        return (
            df.select("doc_id", "text", fp_col.alias("fp"))
            .select(
                "doc_id", "text", F.row_number().over(w).alias("rn")
            )
            .where(F.col("rn") == 1)
            .select("doc_id", "text")
        )

    s1 = survivors(base, F.md5("text"))
    prefix = F.md5(
        F.concat_ws(
            " ", F.slice(F.split("text", r"\s+"), 1, 8)
        )
    )
    s2 = survivors(s1, prefix)
    n0 = base.agg(F.count(F.lit(1)).alias("n0"))
    n1 = s1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n2"))
    counts = n0.crossJoin(n1).crossJoin(n2)
    stage1 = counts.select(
        F.lit("exact_sha").alias("stage"),
        (F.col("n0") - F.col("n1")).alias("n_removed"),
        F.col("n1").alias("n_remaining"),
    )
    stage2 = counts.select(
        F.lit("prefix_fp").alias("stage"),
        (F.col("n1") - F.col("n2")).alias("n_removed"),
        F.col("n2").alias("n_remaining"),
    )
    return stage1.unionByName(stage2)


@register(
    "q_llm_source_overlap",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT md5(text) AS h, source FROM documents
    ),
    pairs AS (
      SELECT a.source AS s1, b.source AS s2,
             CAST(count(*) AS BIGINT) AS n_shared_hashes
      FROM hashed a JOIN hashed b
        ON a.h = b.h AND a.source < b.source
      GROUP BY a.source, b.source
    ),
    sizes AS (
      SELECT source, CAST(count(DISTINCT md5(text)) AS BIGINT) AS n
      FROM documents GROUP BY source
    )
    SELECT p.s1, p.s2, p.n_shared_hashes,
           round(CAST(p.n_shared_hashes AS DOUBLE)
                 / least(x.n, y.n), 6) AS overlap_coeff
    FROM pairs p
    JOIN sizes x ON p.s1 = x.source
    JOIN sizes y ON p.s2 = y.source
    """,
    tags=("batch", "llm", "dedup", "profiling"),
)
def q_llm_source_overlap(spark, sf_dir):
    """LLM-ext: cross-source duplication matrix — for every pair of
    ingest sources, how many exact content hashes they share and the
    overlap coefficient (shared / smaller side): the report that
    catches one crawl re-ingesting another, mirror sites, and vendor
    datasets that repackage common corpora — BEFORE mixing weights
    (q_llm_mix_datasets) are computed on double-counted text.

    Scale shape: contents collapse to distinct (hash, source) first —
    the inverted-index join then meets only on shared hashes, grouped
    to an O(#sources^2) matrix; per-source sizes are one aggregate.
    Never pairwise over documents."""
    t = tables(spark, sf_dir)
    hashed = t.documents.select(
        F.md5("text").alias("h"), "source"
    ).distinct()
    a, b = hashed.alias("a"), hashed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_hashes"))
    )
    sizes = t.documents.groupBy("source").agg(
        F.countDistinct(F.md5("text")).alias("n")
    )
    x = sizes.withColumnRenamed("source", "s1").withColumnRenamed("n", "nx")
    y = sizes.withColumnRenamed("source", "s2").withColumnRenamed("n", "ny")
    return (
        pairs.join(F.broadcast(x), "s1")
        .join(F.broadcast(y), "s2")
        .select(
            "s1",
            "s2",
            "n_shared_hashes",
            F.round(
                F.col("n_shared_hashes").cast("double")
                / F.least("nx", "ny"),
                6,
            ).alias("overlap_coeff"),
        )
    )
