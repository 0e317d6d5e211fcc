"""Property-based scalar-function checks vs DuckDB on generated literals
(SURVEY.md §5.4) — validates the portability rules beyond the fixed
testdata: string family, integer math, and date arithmetic must agree on
arbitrary inputs.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# Printable-ASCII strings without quotes/backslashes (SQL-literal safe).
texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, blacklist_characters="'\\%_"),
    max_size=30,
)
ints = st.integers(-(10**12), 10**12)
days = st.integers(0, 3000)


@pytest.fixture(scope="module")
def _spark():
    from flink_quickstart_spark import get_spark

    return get_spark(app_name="fqs-prop-fn")


@pytest.fixture(scope="module")
def _duck():
    return duckdb.connect()


@given(s=texts)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_string_family_matches(_spark, _duck, s):
    df = _spark.createDataFrame([(s,)], "s string").select(
        F.upper("s").alias("up"),
        F.lower("s").alias("lo"),
        F.length("s").cast("long").alias("ln"),
        F.reverse("s").alias("rv"),
        F.substring("s", 2, 5).alias("sub"),
        F.trim(F.col("s")).alias("tr"),
        F.lpad("s", 8, "*").alias("pad"),
    )
    got = tuple(df.first())
    lit = s.replace("'", "''")
    want = _duck.execute(
        f"SELECT upper('{lit}'), lower('{lit}'), CAST(length('{lit}') AS BIGINT), "
        f"reverse('{lit}'), substring('{lit}', 2, 5), trim('{lit}'), lpad('{lit}', 8, '*')"
    ).fetchone()
    assert got == tuple(want)


@given(a=ints, b=st.integers(1, 10**6))
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_integer_math_matches(_spark, _duck, a, b):
    df = _spark.createDataFrame([(a, b)], "a long, b long").select(
        (F.col("a") + F.col("b")).alias("add"),
        (F.col("a") * F.lit(3)).alias("mul"),
        F.abs("a").alias("ab"),
        F.pmod("a", "b").alias("pm"),
        (F.col("a") - F.col("a") % F.col("b")).alias("trunc_mult"),
        F.greatest("a", "b").alias("g"),
        F.least("a", "b").alias("l"),
    )
    got = tuple(df.first())
    # Spark pmod is always non-negative; DuckDB % follows the dividend
    # sign → express pmod portably.
    want = _duck.execute(
        f"WITH t(a, b) AS (VALUES (CAST({a} AS BIGINT), CAST({b} AS BIGINT))) "
        f"SELECT a + b, a * 3, abs(a), (((a % b) + b) % b), "
        f"a - (a % b), greatest(a, b), least(a, b) FROM t"
    ).fetchone()
    assert got == tuple(want)


@given(d=days, delta=st.integers(-500, 500))
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_date_arithmetic_matches(_spark, _duck, d, delta):
    base = dt.date(1995, 1, 1) + dt.timedelta(days=d)
    df = _spark.createDataFrame([(base,)], "d date").select(
        F.date_add("d", delta).cast("string").alias("plus"),
        F.year("d").cast("long").alias("y"),
        F.month("d").cast("long").alias("m"),
        (F.weekday("d") + 1).cast("long").alias("isodow"),
        F.last_day("d").cast("string").alias("eom"),
        F.datediff("d", F.lit("1995-01-01").cast("date")).cast("long").alias("dd"),
    )
    got = tuple(df.first())
    want = _duck.execute(
        f"SELECT CAST(DATE '{base}' + {delta} AS DATE)::VARCHAR, "
        f"CAST(year(DATE '{base}') AS BIGINT), CAST(month(DATE '{base}') AS BIGINT), "
        f"CAST(isodow(DATE '{base}') AS BIGINT), CAST(last_day(DATE '{base}') AS VARCHAR), "
        f"CAST(date_diff('day', DATE '1995-01-01', DATE '{base}') AS BIGINT)"
    ).fetchone()
    assert got == tuple(want)
