"""Skew-handling helpers for hot-key joins and aggregations.

At 100 TB a handful of hot keys (a viral user_id, an empty-string token)
can pin a whole stage on one task. First line of defense is AQE's skew-
join splitting (enabled in session.py); these helpers cover the cases AQE
cannot fix:

- :func:`salted_agg` — two-phase aggregation for algebraic aggregates on
  a skewed group key: partial agg on (key, salt) then final agg on key.
- :func:`salted_join` — replicate the small side per salt so the big
  side's hot key spreads over N tasks (for joins where the small side is
  too big to broadcast but small enough to replicate N×).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from a stable per-row hash —
    avoids rand() so retried tasks produce identical output (required for
    exactly-once sinks and reproducible tests)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``groupBy(key, salt).agg(partial)`` →
    ``groupBy(key).agg(final)``. Only algebraic aggregates compose this
    way; the provided dict maps output name → partial aggregate column,
    re-aggregated by sum/min/max automatically when recognized.

    For counts pass ``F.count(...)``; for sums ``F.sum(...)``; for
    min/max pass those — each is merged with the matching re-aggregate.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    merges = []
    for name, c in aggs.items():
        expr = c._jc.toString().lower() if hasattr(c, "_jc") else ""
        if expr.startswith("min"):
            merges.append(F.min(name).alias(name))
        elif expr.startswith("max"):
            merges.append(F.max(name).alias(name))
        else:  # count and sum both merge by sum
            merges.append(F.sum(name).alias(name))
    return partial.groupBy(*key_cols).agg(*merges)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew join: salt the big side, replicate the small side once per
    salt value, join on (key, salt). Cost: small side shuffled n_salts×;
    benefit: each hot key spreads across n_salts tasks."""
    big_s = with_salt(big, n_salts)
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    small_r = small.crossJoin(F.broadcast(salts))
    joined = big_s.join(small_r, [on, "__salt"], how)
    return joined.drop("__salt")
