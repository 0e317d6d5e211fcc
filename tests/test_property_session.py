"""Property test for session-window boundary semantics (SURVEY.md §7
sharp edge 3). Decided by experiment, as the survey demanded: Spark's
``session_window(ts, gap)`` MERGES an event exactly ``gap`` after the
previous one (touching windows coalesce) and splits only on strictly
greater gaps — so the gaps-and-islands oracle must use ``> gap``, not
``>= gap``. This test originally used ``>=`` and FAILED on the exact-
boundary input ``[300]``, catching a latent oracle bug that sf0.01 data
(µs-resolution timestamps, measure-zero chance of an exact 300 s gap)
never triggered. Adversarial inputs — gaps exactly at, one second
inside, and one second outside the boundary — must agree between Spark
and the DuckDB formulation on session starts and per-session counts.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

GAP_S = 300

# Inter-event gaps biased to the boundary: exactly 300 s, 299, 301, tiny,
# and large.
gaps = st.lists(
    st.sampled_from([1, 10, 299, 300, 301, 600]),
    min_size=1,
    max_size=12,
)


@pytest.fixture(scope="module")
def _spark():
    from flink_quickstart_spark import get_spark

    return get_spark(app_name="fqs-prop-session")


@given(gs=gaps)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_session_window_boundary_matches_gaps_and_islands(_spark, gs):
    ts, series = 0, [0]
    for g in gs:
        ts += g
        series.append(ts)
    rows = [(1, t * 1_000_000) for t in series]  # epoch µs on one key

    df = _spark.createDataFrame(rows, "user_id long, ts_us long").select(
        "user_id", F.timestamp_micros("ts_us").alias("ts")
    )
    spark_sessions = sorted(
        (r.start_us, r.n)
        for r in df.groupBy(F.session_window("ts", f"{GAP_S} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros("w.start").alias("start_us"), "n")
        .collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ", ".join(f"({t})" for _, t in rows)
        + ") AS t(ts_us)"
    )
    duck_sessions = sorted(
        tuple(r)
        for r in con.execute(
            f"""
        WITH flagged AS (
          SELECT ts_us,
                 CASE WHEN ts_us - lag(ts_us) OVER (ORDER BY ts_us)
                      > {GAP_S * 1_000_000} THEN 1 ELSE 0 END AS new_s
          FROM e
        ), numbered AS (
          SELECT ts_us, sum(new_s) OVER (ORDER BY ts_us
                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT CAST(min(ts_us) AS BIGINT) AS start_us,
               CAST(count(*) AS BIGINT)   AS n
        FROM numbered GROUP BY sid
        """
        ).fetchall()
    )
    con.close()
    assert spark_sessions == duck_sessions


tumb_offsets = st.lists(
    st.sampled_from([0, 1, 599, 600, 601, 1199, 1200]),
    min_size=1,
    max_size=12,
)


@given(offs=tumb_offsets)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_tumbling_window_boundary_matches_time_bucket(_spark, offs):
    """Window-edge semantics: an event exactly on a 10-min boundary must
    land in the LATER window on both engines ([start, end) intervals —
    Spark ``window`` and DuckDB ``time_bucket`` agree)."""
    rows = [(t * 1_000_000,) for t in sorted(set(offs))]
    df = _spark.createDataFrame(rows, "ts_us long").select(
        F.timestamp_micros("ts_us").alias("ts")
    )
    spark_w = sorted(
        (r.ws, r.n)
        for r in df.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros("w.start").alias("ws"), "n")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ", ".join(f"({t})" for (t,) in rows)
        + ") AS t(ts_us)"
    )
    duck_w = sorted(
        tuple(r)
        for r in con.execute(
            """
        SELECT CAST(epoch_us(time_bucket(INTERVAL '10 minutes',
                    make_timestamp(ts_us))) AS BIGINT) AS ws,
               CAST(count(*) AS BIGINT) AS n
        FROM e GROUP BY 1
        """
        ).fetchall()
    )
    con.close()
    assert spark_w == duck_w


iv_offsets = st.lists(
    st.sampled_from([0, 1, 599, 600, 601, 900]),
    min_size=1,
    max_size=8,
)


@given(c_offs=iv_offsets, p_offs=iv_offsets)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_join_boundary_inclusive_both_ends(_spark, c_offs, p_offs):
    """Interval-join boundary (Flink ``between(0, 10min)`` analog): a
    purchase exactly 0 s or exactly 600 s after the click is INCLUDED on
    both engines (closed interval on both ends)."""
    from flink_quickstart_spark.operators.joins import interval_join

    clicks = _spark.createDataFrame(
        [(i, 1, t * 1_000_000) for i, t in enumerate(sorted(set(c_offs)))],
        "cid long, user_id long, ts_us long",
    ).select("cid", "user_id", F.timestamp_micros("ts_us").alias("ts"))
    purchases = _spark.createDataFrame(
        [(100 + i, 1, t * 1_000_000) for i, t in enumerate(sorted(set(p_offs)))],
        "pid long, user_id long, ts_us long",
    ).select("pid", "user_id", F.timestamp_micros("ts_us").alias("ts"))

    got = {
        (r.cid, r.pid)
        for r in interval_join(
            clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
            lower=F.expr("INTERVAL 0 SECONDS"), upper=F.expr("INTERVAL 10 MINUTES"),
        ).select(F.col("l.cid").alias("cid"), F.col("r.pid").alias("pid")).collect()
    }
    expected = {
        (i, 100 + j)
        for i, ct in enumerate(sorted(set(c_offs)))
        for j, pt in enumerate(sorted(set(p_offs)))
        if 0 <= pt - ct <= 600
    }
    assert got == expected
