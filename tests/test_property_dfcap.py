"""Property check for the near-dup ``max_shingle_df`` cap (the 100 TB
knob of ``jaccard_neardup_pairs``): on corpora with PLANTED hot
(boilerplate) shingles the capped operator must

1. implement its documented contract EXACTLY — pairs and Jaccard values
   equal to a pure-Python re-derivation over the capped shingle
   universe; and
2. only ever drop pairs whose similarity was carried by hot shingles:
   if a pair's common shingles are all below the cap, removing hot
   shingles can only shrink the union, so capped Jaccard >= uncapped
   Jaccard and the pair SURVIVES. Any dropped pair therefore had
   boilerplate in its intersection — the precise justification for the
   cap at scale.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_quickstart_spark.operators.dedup import jaccard_neardup_pairs

N = 2  # shingle order (bigrams keep example corpora small)
THRESHOLD = 0.4
CAP = 3

BOILER = "bp0 bp1 bp2 bp3"  # 3 planted bigrams when appended

# A doc: up to 8 distinctive tokens from a small shared vocabulary (so
# genuine overlap happens), plus an optional boilerplate suffix.
doc = st.tuples(
    st.lists(st.integers(0, 11), min_size=0, max_size=8),
    st.booleans(),
)
corpus = st.lists(doc, min_size=2, max_size=9)


@pytest.fixture(scope="module")
def _spark():
    from flink_quickstart_spark import get_spark

    return get_spark(app_name="fqs-prop-dfcap")


def _text(tokens, boiler):
    # single-space join with no leading/trailing space — the operator
    # splits on " " without filtering empties, so the corpus must be
    # canonical for the Python reference to tokenize identically
    words = [f"w{t}" for t in tokens] + (BOILER.split(" ") if boiler else [])
    return " ".join(words)


def _shingles(text):
    toks = [w for w in text.split(" ") if w]
    return {
        " ".join(toks[i : i + N]) for i in range(len(toks) - N + 1)
    }


def _pairs(sets, threshold):
    out = {}
    for d1, d2 in combinations(sorted(sets), 2):
        s1, s2 = sets[d1], sets[d2]
        common = len(s1 & s2)
        union = len(s1 | s2)
        if common and union:
            j = round(common / union, 6)
            if j >= threshold:
                out[(d1, d2)] = (common, j)
    return out


@given(docs=corpus)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_dfcap_contract_and_drop_safety(_spark, docs):
    rows = [(i, _text(toks, boiler)) for i, (toks, boiler) in enumerate(docs)]
    df = _spark.createDataFrame(rows, "doc_id int, text string")

    # ---- pure-Python reference over the SAME corpus -------------------
    raw = {i: _shingles(t) for i, t in rows}
    df_count = {}
    for s in raw.values():
        for sh in s:
            df_count[sh] = df_count.get(sh, 0) + 1
    capped = {
        i: {sh for sh in s if df_count[sh] <= CAP} for i, s in raw.items()
    }
    expect_capped = _pairs(capped, THRESHOLD)
    expect_uncapped = _pairs(raw, THRESHOLD)

    # ---- 1. exact contract: operator == reference over capped universe
    got = {
        (r.d1, r.d2): (r.n_common, r.jaccard)
        for r in jaccard_neardup_pairs(
            df, "doc_id", "text", n=N, threshold=THRESHOLD, max_shingle_df=CAP
        ).collect()
    }
    assert got == expect_capped

    # ---- 2. drop safety: a dropped pair must have HOT common shingles
    for pair in set(expect_uncapped) - set(expect_capped):
        d1, d2 = pair
        hot_common = {
            sh for sh in raw[d1] & raw[d2] if df_count[sh] > CAP
        }
        assert hot_common, (
            f"pair {pair} was dropped by the cap but had no hot shingle "
            "in its intersection — the cap dropped a distinctive-overlap "
            "pair, violating its contract"
        )

    # ---- 3. uncapped operator == uncapped reference (cap=None baseline)
    got_un = {
        (r.d1, r.d2): (r.n_common, r.jaccard)
        for r in jaccard_neardup_pairs(
            df, "doc_id", "text", n=N, threshold=THRESHOLD, max_shingle_df=None
        ).collect()
    }
    assert got_un == expect_uncapped
