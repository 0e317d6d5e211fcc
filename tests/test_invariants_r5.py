"""Round-5 invariant tests: BPE-merge training against a pure-Python
reference, and the Z-order bit-interleave against an integer-arithmetic
reference.
"""

from __future__ import annotations

from collections import Counter

from flink_quickstart_spark.operators.bpe import learn_bpe_merges
from flink_quickstart_spark.plans import load_all
from flink_quickstart_spark.plans.registry import REGISTRY
from tests.conftest import SF_DIR


def ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Single-machine BPE reference (Sennrich-style greedy merges,
    (count DESC, lhs, rhs) tie-break, left-to-right non-overlapping
    application)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (lhs, rhs), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lhs, rhs, lhs + rhs, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_on_synthetic_vocab(spark):
    counts = {
        "lower": 5, "lowest": 3, "newer": 6, "wider": 2,
        "aaaa": 4, "aaab": 2, "banana": 3, "bandana": 1,
    }
    words = spark.createDataFrame(list(counts.items()), "word string, cnt long")
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in learn_bpe_merges(spark, words, 10)
        .orderBy("step")
        .collect()
    ]
    assert got == ref_bpe(counts, 10)


def test_bpe_repeated_symbol_merge_is_greedy_nonoverlapping(spark):
    # "aaaa" alone: merge 1 must be (a,a) with count 3 (overlapping
    # pairs all counted), and applying it greedily gives (aa)(aa), so
    # merge 2 is (aa,aa) with count 1.
    words = spark.createDataFrame([("aaaa", 1)], "word string, cnt long")
    got = [
        (r.step, r.lhs, r.rhs, r.pair_count)
        for r in learn_bpe_merges(spark, words, 2).orderBy("step").collect()
    ]
    assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]


def test_bpe_registered_key_shape(spark):
    load_all()
    rows = (
        REGISTRY["q_llm_bpe_merges"].builder(spark, SF_DIR).orderBy("step").collect()
    )
    assert [r.step for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.merged == r.lhs + r.rhs for r in rows)
    # merge counts are non-increasing only within equal symbol
    # generations in general, but the FIRST merge must be the global
    # most-frequent pair:
    assert rows[0].pair_count == max(r.pair_count for r in rows)


def _ref_interleave(u: int, v: int, bits: int = 10) -> int:
    z = 0
    for i in range(bits):
        z |= ((u >> i) & 1) << (2 * i + 1)
        z |= ((v >> i) & 1) << (2 * i)
    return z


def test_zorder_interleave_matches_reference(spark):
    from flink_quickstart_spark.plans.analytics_r5 import _interleave_bits
    from pyspark.sql import functions as F

    cases = [(0, 0), (1, 0), (0, 1), (1023, 1023), (512, 256), (341, 682), (7, 1000)]
    df = spark.createDataFrame(cases, "u long, v long")
    got = {
        (r.u, r.v): r.z
        for r in df.withColumn(
            "z", _interleave_bits(F.col("u"), F.col("v"))
        ).collect()
    }
    for u, v in cases:
        assert got[(u, v)] == _ref_interleave(u, v), (u, v)
    # Morton property: z preserves per-dimension order within a fixed
    # other coordinate
    assert got[(1, 0)] > got[(0, 0)]
    assert got[(0, 1)] > got[(0, 0)]
    assert got[(1, 0)] > got[(0, 1)]  # u interleaved above v
