"""Text-analysis column builders for the documents pipeline.

Beyond the reference surface: mandated LLM-data-pipeline extension
(SURVEY.md §2.K5-K6 and the training-data operator mandate). Everything
here is a pure Column expression — JVM-side, whole-stage-codegen'd, no
Python in the hot path — so the same builders run unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny inline stopword/markers — deterministic and oracle-reproducible.
STOPWORDS = ("the", "a", "of", "and", "to")

# BPE-ish token pattern: runs of word chars OR single non-space symbols —
# a deterministic proxy for subword tokenizer counts.
BPE_TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def n_tokens(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def n_bpe_tokens(text: Column | str) -> Column:
    """Count of BPE-ish regex tokens (word runs + isolated symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0))).cast(
        "long"
    )


def type_token_ratio(text: Column | str, decimals: int = 4) -> Column:
    toks = tokens(text)
    return F.round(F.size(F.array_distinct(toks)) / F.size(toks), decimals)


def stopword_ratio(text: Column | str, decimals: int = 4) -> Column:
    toks = tokens(text)
    stop = F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
    return F.round(F.size(stop) / F.size(toks), decimals)


def mean_token_len(text: Column | str, decimals: int = 4) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return F.round(total / F.size(toks), decimals)


def quality_score(text: Column | str, decimals: int = 4) -> Column:
    """Composite quality heuristic in [0, 1]: rewards lexical diversity,
    sane token lengths, and non-trivial length; the standard cheap filter
    tier before expensive model-based scoring."""
    ttr = F.size(F.array_distinct(tokens(text))) / F.size(tokens(text))
    len_ok = F.least(F.size(tokens(text)) / F.lit(50.0), F.lit(1.0))
    meanlen = mean_token_len(text, 10)
    len_sane = F.when((meanlen >= 2) & (meanlen <= 12), 1.0).otherwise(0.5)
    return F.round((ttr + len_ok + len_sane) / 3.0, decimals)


def lang_id(text: Column | str) -> Column:
    """Deterministic marker-based language guess: 'en' when English
    stopword markers exceed 2% of tokens, else 'und' (undetermined).

    On corpora with real cross-language vocabulary, extend the marker
    table per language — the expression shape (array intersection ratio)
    stays identical and JVM-side.
    """
    toks = tokens(text)
    en_markers = F.filter(toks, lambda t: F.lower(t).isin("the", "a", "of", "is"))
    ratio = F.size(en_markers) / F.size(toks)
    return F.when(ratio > 0.02, "en").otherwise("und")


def fingerprint(text: Column | str, n: int = 3) -> Column:
    """Winnowing-style document fingerprint: the minimum md5 over word
    n-gram shingles — stable under shingle reordering, portable across
    engines (md5 is standard)."""
    toks = F.split(text, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)]),
    )
    return F.array_min(F.transform(grams, F.md5))
