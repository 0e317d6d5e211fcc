"""Time-series similarity operators (SURVEY.md §2.K9 — stretch row).

Two tiers, mirroring the dedup/similarity families:

- **Feature tier** (SQL-expressible, JVM-side): per-key windowed
  statistical features — mean/std/extremes plus least-squares slope and
  correlation against time — computed with built-in aggregates so the
  whole plan stays in codegen. Registered as ``q_ts_features`` with a
  DuckDB oracle (plans/timeseries.py).

- **Shape tier** (Arrow-batched Python): z-normalized Euclidean distance
  between a query pattern and every sliding window of each key's series
  — the core primitive of UCR-suite-style subsequence search (public
  literature; cf. the time-series-similarity entry in PAPERS.md). NumPy
  strided windows inside ``applyInPandas``, one pandas frame per key.

Scale design (100 TB): the shape tier shuffles once on the key — state
is one key's series, which for telemetry-style data is O(10⁴-10⁶) rows
per key and fits comfortably in an Arrow batch. Keys far above that need
chunked windows with ``pattern_len-1`` overlap (documented, not needed at
test scale). The pattern is tiny and ships as a plain closure constant
(broadcast-equivalent). Distances are exact, deterministic floats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _znorm(a: np.ndarray) -> np.ndarray:
    std = a.std()
    if std == 0:
        return np.zeros_like(a)
    return (a - a.mean()) / std


def sliding_znorm_distance(
    df: DataFrame,
    pattern: list[float],
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """For every key, z-normalized Euclidean distance between ``pattern``
    and each length-``len(pattern)`` sliding window of the key's
    time-ordered values.

    Returns ``(key, win_pos, dist)`` — ``win_pos`` is the 0-based offset
    of the window within the key's series, so output is deterministic
    given deterministic input order (ties on ``ts`` broken by value).
    """
    m = len(pattern)
    q = _znorm(np.asarray(pattern, dtype=np.float64))

    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("win_pos", T.IntegerType()),
            T.StructField("dist", T.DoubleType()),
        ]
    )

    def _profile_one(keys: np.ndarray, x: np.ndarray, lo: int, hi: int):
        """Distance profile for ONE key's sorted slice [lo, hi)."""
        n = hi - lo
        if n < m:
            return None
        # all sliding windows as a strided (n-m+1, m) view — no copy
        wins = np.lib.stride_tricks.sliding_window_view(x[lo:hi], m)
        mu = wins.mean(axis=1, keepdims=True)
        sd = wins.std(axis=1, keepdims=True)
        sd[sd == 0] = 1.0
        z = (wins - mu) / sd
        dists = np.sqrt(((z - q) ** 2).sum(axis=1))
        return pd.DataFrame(
            {
                "key": np.full(len(dists), keys[lo], dtype=np.int64),
                "win_pos": np.arange(len(dists), dtype=np.int32),
                "dist": dists,
            }
        )

    def _profile_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf[key_col].to_numpy(dtype=np.int64)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        parts = [
            p
            for lo, hi in zip(bounds[:-1], bounds[1:])
            if (p := _profile_one(keys, x, int(lo), int(hi))) is not None
        ]
        if not parts:
            return pd.DataFrame(
                {"key": [], "win_pos": [], "dist": []}
            ).astype({"key": "int64", "win_pos": "int32", "dist": "float64"})
        return pd.concat(parts, ignore_index=True)

    def scan(batches):
        # r12-opt (guide §4.1): groupBy().applyInPandas flushes one
        # Arrow batch PER GROUP each way — at thousands of small keys
        # the per-group roundtrip dominated (measured 4.9 s → 1.0 s at
        # sf0.1 for the profile stage). mapInPandas over key-sorted
        # partitions gets full-size batches; a key straddling two
        # batches is carried over (a repartition pins each key to one
        # partition, and the in-partition sort makes its rows adjacent
        # and window-ordered).
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            last_key = pdf[key_col].iloc[-1]
            is_tail = pdf[key_col].to_numpy() == last_key
            n_tail = int(is_tail.sum())
            carry = pdf.iloc[len(pdf) - n_tail :]
            done = pdf.iloc[: len(pdf) - n_tail]
            if len(done):
                yield _profile_frame(done)
        if carry is not None and len(carry):
            yield _profile_frame(carry)

    return (
        df.select(key_col, ts_col, value_col)
        .repartition(key_col)
        .sortWithinPartitions(key_col, ts_col, value_col)
        .mapInPandas(scan, out_schema)
    )


def best_match_per_key(dist_df: DataFrame, k: int = 1) -> DataFrame:
    """Top-``k`` lowest-distance window positions per key, deterministic
    tie-break on ``win_pos``. The row_number≤k idiom benefits from
    Spark's WindowGroupLimit pushdown at scale."""
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy(F.col("dist").asc(), F.col("win_pos").asc())
    return (
        dist_df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
