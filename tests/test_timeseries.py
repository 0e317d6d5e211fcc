"""Tests for the time-series operators (SURVEY.md §2.K9).

``q_ts_features`` goes through the DuckDB oracle like every sql key (a
direct spot-check here too). The rows-only ``q_ts_znorm_match`` gets its
value check HERE: the Spark distance profile must equal a pure-NumPy
single-machine reference bit-for-bit per key.
"""

from __future__ import annotations

import numpy as np
import pytest

from flink_quickstart_spark.operators.timeseries import (
    best_match_per_key,
    sliding_znorm_distance,
)
from flink_quickstart_spark.plans import load_all, registry
from flink_quickstart_spark.plans.timeseries import ZNORM_PATTERN
from flink_quickstart_spark.sources.tables import load_tables
from tests.conftest import SF_DIR

load_all()


def numpy_reference(values: np.ndarray, pattern: list[float]) -> np.ndarray:
    m = len(pattern)
    q = np.asarray(pattern, dtype=np.float64)
    q = (q - q.mean()) / q.std()
    wins = np.lib.stride_tricks.sliding_window_view(values, m)
    mu = wins.mean(axis=1, keepdims=True)
    sd = wins.std(axis=1, keepdims=True)
    sd[sd == 0] = 1.0
    z = (wins - mu) / sd
    return np.sqrt(((z - q) ** 2).sum(axis=1))


def test_znorm_distance_matches_numpy_reference(spark):
    t = load_tables(spark, SF_DIR)
    got = (
        sliding_znorm_distance(t.events, ZNORM_PATTERN)
        .orderBy("key", "win_pos")
        .collect()
    )
    assert got, "no distance rows produced"
    # group Spark output per key
    by_key: dict[int, list] = {}
    for r in got:
        by_key.setdefault(r.key, []).append(r)
    events = t.events.select("user_id", "ts", "value").collect()
    series: dict[int, list] = {}
    for r in events:
        series.setdefault(r.user_id, []).append((r.ts, r.value))
    for key, rows in by_key.items():
        vals = np.array(
            [v for _, v in sorted(series[key])], dtype=np.float64
        )
        ref = numpy_reference(vals, ZNORM_PATTERN)
        assert len(rows) == len(ref) == len(vals) - len(ZNORM_PATTERN) + 1
        np.testing.assert_allclose(
            [r.dist for r in rows], ref, rtol=0, atol=0
        )  # identical float ops → bit-exact


def test_short_series_emit_no_windows(spark):
    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(3)], "user_id long, ts long, value double"
    )
    out = sliding_znorm_distance(
        df, ZNORM_PATTERN, ts_col="ts", value_col="value"
    ).collect()
    assert out == []


def test_best_match_deterministic_topk(spark):
    t = load_tables(spark, SF_DIR)
    dists = sliding_znorm_distance(t.events, ZNORM_PATTERN)
    top = best_match_per_key(dists, k=3).collect()
    per_key: dict[int, list] = {}
    for r in top:
        per_key.setdefault(r.key, []).append(r.dist)
    for key, ds in per_key.items():
        assert len(ds) <= 3
        assert ds == sorted(ds)


def test_ts_features_spotcheck_vs_duckdb(spark, duck):
    """Direct mini-oracle run of the sql key at sf0.001 (the full gate
    runs it at sf0.01)."""
    spec = registry.REGISTRY["q_ts_features"]
    got = {
        tuple(r)
        for r in spec.builder(spark, SF_DIR)
        .orderBy("user_id", "ws_us")
        .collect()
    }
    exp = {tuple(r) for r in duck.execute(spec.oracle).fetchall()}
    assert got == exp
