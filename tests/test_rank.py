"""Two-phase distributed global rank (operators/rank.py) must agree
exactly with the single-partition global-window reference — on ties,
descending order, skew, and n-not-divisible-by-k ntile edges — while
never planning a partition-less WindowExec.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_quickstart_spark.operators.rank import (
    global_order_stats,
    global_row_number,
)

# Few distinct values → heavy ties; ties must never straddle buckets.
vals = st.lists(
    st.floats(min_value=-50, max_value=50, allow_nan=False, width=16),
    min_size=1,
    max_size=40,
)


@pytest.fixture(scope="module")
def _spark():
    from flink_quickstart_spark import get_spark

    return get_spark(app_name="fqs-rank")


@given(a=vals)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_global_row_number_matches_window(_spark, a):
    df = _spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(a)], "id long, v double"
    ).repartition(4)
    order = [F.col("v").desc(), F.col("id")]
    got = {
        (r["id"], r["pos"])
        for r in global_row_number(
            df, order, bucket_col="v", out_col="pos", buckets=5
        ).collect()
    }
    ref = {
        (r["id"], r["pos"])
        for r in df.withColumn(
            "pos", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == ref


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (8, 4), (10, 3), (12, 4)])
def test_order_stats_match_window_functions(_spark, n, k):
    df = _spark.createDataFrame(
        [(i, float(i % 5)) for i in range(n)], "id long, v double"
    ).repartition(3)
    order = [F.col("v"), F.col("id")]
    got = {
        (r["id"], r["ntile"], round(r["pct_rank"], 9), round(r["cdist"], 9))
        for r in global_order_stats(
            df, order, bucket_col="v", ntile=k, buckets=3
        ).collect()
    }
    w = Window.orderBy(*order)
    ref = {
        (r["id"], r["ntile"], round(r["pct_rank"], 9), round(r["cdist"], 9))
        for r in df.select(
            "id",
            F.ntile(k).over(w).cast("long").alias("ntile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cdist"),
        ).collect()
    }
    assert got == ref


def test_no_partitionless_window_in_plan(_spark):
    df = _spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"
    )
    plan = global_row_number(
        df, [F.col("v"), F.col("id")], bucket_col="v", buckets=4
    )._jdf.queryExecution().executedPlan().toString()
    # Every Window node must carry a partition spec (our bucket column).
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "_rank_bucket" in line, line


@given(a=vals)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_global_running_sum_matches_window(_spark, a):
    from flink_quickstart_spark.operators.rank import global_running_sum

    df = _spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(a)], "id long, n long"
    ).repartition(4)
    order = [F.col("n"), F.col("id")]
    got = {
        (r["id"], r["running"])
        for r in global_running_sum(
            df, "n", order, bucket_col="n", buckets=5
        ).collect()
    }
    w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = {
        (r["id"], r["running"])
        for r in df.withColumn("running", F.sum("n").over(w).cast("long")).collect()
    }
    assert got == ref
