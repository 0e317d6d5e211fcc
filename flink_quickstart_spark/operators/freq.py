"""Frequent-items (heavy hitters) via per-partition Misra-Gries.

The 100 TB question "which tokens exceed φ of the corpus?" does not need
a full token aggregation: a Misra-Gries summary of capacity k per
partition retains every item whose in-partition count exceeds
n_p/(k+1). By pigeonhole, any GLOBAL φ-heavy item (count ≥ φ·n) must
exceed n_p/(k+1) in at least one partition whenever k+1 > 1/φ, so the
union of per-partition summary keys is a guaranteed SUPERSET of the true
heavy hitters. A second exact pass counts only that (tiny, broadcastable)
candidate set and applies the exact threshold — output is therefore
EXACTLY the true heavy hitters, while the wide first pass never shuffles
the full token distribution, only ≤ k rows per partition.

This is the sketch-then-verify shape shared with the LSH near-dup path
(operators/dedup.py): approximate to find candidates sublinearly, exact
arithmetic to decide.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_summaries(
    tokens: DataFrame, token_col: str = "word", capacity: int = 64
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ ``capacity`` rows of
    (token, lower-bound count) per input partition, Arrow-batched."""

    def mg(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in pdfs:
            for w in pdf[token_col]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < capacity:
                    counters[w] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {token_col: list(counters), "cnt": list(counters.values())}
            )

    return tokens.select(token_col).mapInPandas(mg, f"{token_col} string, cnt long")


def heavy_hitters(
    tokens: DataFrame,
    token_col: str = "word",
    phi: float = 0.02,
    capacity: int = 64,
) -> DataFrame:
    """Exact φ-heavy hitters via MG candidates + exact verification.

    Requires ``capacity + 1 > 1/phi`` for the superset guarantee; raises
    otherwise rather than silently missing items.
    """
    if capacity + 1 <= 1.0 / phi:
        raise ValueError(
            f"capacity {capacity} too small for phi={phi}: need capacity+1 > 1/phi"
        )
    candidates = (
        misra_gries_summaries(tokens, token_col, capacity)
        .groupBy(token_col)
        .agg(F.sum("cnt").alias("mg_lower"))
        .select(token_col)
    )
    total = tokens.agg(F.count(F.lit(1)).alias("n_tokens"))
    exact = (
        tokens.join(F.broadcast(candidates), token_col, "left_semi")
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.col("n_tokens") * phi)
        .select(
            token_col,
            "cnt",
            F.round(F.col("cnt") / F.col("n_tokens"), 6).alias("freq"),
        )
    )
