"""Invariant checks for the round-3 operators, validated on the real
testdata (not generated literals — the invariants are data-independent
mathematical properties the implementations must satisfy):

- int8 quantization: every dequantization error is bounded by scale/2,
  and every quantized magnitude is ≤ 127 (checked via the checksum
  bound |Σq| ≤ 64·127).
- interpolating resample: every interpolated value lies within the
  [min, max] of its segment endpoints, and every tick is strictly
  inside its segment.
- BM25: scores are strictly positive (idf of every term present in ≥1
  doc is > 0 under the +1 smoothing) and the output is top-20 sorted.
- cross-entropy: every per-doc value is ≥ the corpus-minimum possible
  (-ln of the most frequent token's probability can't exceed any doc's
  average) — concretely, cross_entropy > 0 and finite.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_quickstart_spark.plans import load_all, registry
from tests.conftest import SF_DIR

load_all()


def _run(spark, key):
    return registry.REGISTRY[key].builder(spark, SF_DIR)


def test_quantize_error_bounded_by_half_scale(spark):
    df = _run(spark, "q_embed_quantize_int8")
    bad = df.where(
        (F.col("max_abs_err") > F.col("scale") / 2 + 1e-12)
        | (F.abs(F.col("q_checksum")) > 64 * 127)
    ).count()
    assert bad == 0


def test_resample_values_within_segment_envelope(spark):
    # Rebuild segments and join the resampled output back: every
    # interpolated value must be within [least(v0,v1), greatest(v0,v1)].
    out = _run(spark, "q_ts_resample_interp")
    t = registry.tables(spark, SF_DIR)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        t.events.select(
            "user_id",
            "ts",
            "value",
            F.lead("ts").over(w).alias("t1"),
            F.lead("value").over(w).alias("v1"),
        )
        .where(F.col("t1").isNotNull() & (F.col("t1") > F.col("ts")))
        .select(
            "user_id",
            F.unix_micros("ts").alias("t0_us"),
            F.unix_micros("t1").alias("t1_us"),
            F.least("value", "v1").alias("lo"),
            F.greatest("value", "v1").alias("hi"),
        )
    )
    joined = out.join(seg, "user_id").where(
        (F.col("tick_us") > F.col("t0_us")) & (F.col("tick_us") <= F.col("t1_us"))
    )
    bad = joined.where(
        (F.col("value") < F.col("lo") - 1e-6) | (F.col("value") > F.col("hi") + 1e-6)
    ).count()
    assert bad == 0
    # every output tick falls inside exactly one segment of its user
    n_out = out.count()
    n_matched = joined.count()
    assert n_out == n_matched, f"{n_out} ticks vs {n_matched} segment matches"


def test_bm25_positive_and_sorted(spark):
    rows = _run(spark, "q_llm_bm25").collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25 for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_xent_positive_finite(spark):
    import math

    rows = _run(spark, "q_llm_xent_unigram").collect()
    assert rows
    for r in rows:
        assert r.cross_entropy > 0 and math.isfinite(r.cross_entropy)


def test_minhash_signature_jaccard_estimate(spark):
    """The defining MinHash property: for every doc pair, the fraction of
    agreeing signature components estimates shingle Jaccard. Validate the
    bound that matching signatures can only arise from non-disjoint
    shingle sets: sig agreement > 0 implies shared shingles (exact check
    on the small testdata)."""
    from flink_quickstart_spark.operators.dedup import word_shingles

    sigs = _run(spark, "q_llm_minhash_signatures")
    a = sigs.select(
        F.col("doc_id").alias("d1"), "hash_idx", F.col("sig").alias("s1")
    )
    b = sigs.select(
        F.col("doc_id").alias("d2"), "hash_idx", F.col("sig").alias("s2")
    )
    agree = (
        a.join(b, "hash_idx")
        .where((F.col("d1") < F.col("d2")) & (F.col("s1") == F.col("s2")))
        .select("d1", "d2")
        .distinct()
    )
    t = registry.tables(spark, SF_DIR)
    sh = word_shingles(t.documents, "doc_id", "text", 3)
    shared = (
        sh.select(F.col("doc_id").alias("d1"), "shingle")
        .join(sh.select(F.col("doc_id").alias("d2"), "shingle"), "shingle")
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    orphans = agree.join(shared, ["d1", "d2"], "left_anti").count()
    assert orphans == 0, "signature collision between disjoint shingle sets"
