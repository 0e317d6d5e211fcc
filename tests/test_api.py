"""Tests for the Flink-style fluent API façade (api.py).

Each test writes a job the way a reference user would write it in the
quickstart skeleton, and asserts the result equals the equivalent plain
DataFrame program — proving the façade adds semantics-preserving sugar,
not a second engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_quickstart_spark.api import (
    EventTimeSessionWindows,
    SlidingEventTimeWindows,
    StreamExecutionEnvironment,
    TumblingEventTimeWindows,
)
from flink_quickstart_spark.sources.tables import load_tables
from tests.conftest import SF_DIR


def env_of(spark) -> StreamExecutionEnvironment:
    return StreamExecutionEnvironment.get_execution_environment(spark)


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_word_count_canonical_job(spark):
    """THE quickstart program: readTextFile → flatMap(tokenize) →
    keyBy(word) → sum — here over the documents table."""
    env = env_of(spark)
    counts = (
        env.read_table("documents", SF_DIR)
        .flat_map(F.split(F.lower("text"), r"\s+"), "word")
        .filter(F.col("word") != "")
        .key_by("word")
        .count()
        .to_df()
    )
    expected = (
        load_tables(spark, SF_DIR)
        .documents.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .count()
    )
    assert rows_set(counts) == rows_set(expected)


def test_map_filter_keyby_reduce(spark):
    env = env_of(spark)
    got = (
        env.read_table("orders", SF_DIR)
        .filter(F.col("o_orderstatus") == "O")
        .map("o_custkey", price=F.col("o_totalprice"))
        .key_by("o_custkey")
        .reduce(total=F.round(F.sum("price"), 2), n=F.count(F.lit(1)))
        .to_df()
    )
    t = load_tables(spark, SF_DIR)
    expected = (
        t.orders.where(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"), F.count(F.lit(1)).alias("n"))
    )
    assert rows_set(got) == rows_set(expected)


def test_tumbling_window_matches_plain_dataframe(spark):
    env = env_of(spark)
    got = (
        env.read_table("events", SF_DIR)
        .key_by("event_type")
        .window(TumblingEventTimeWindows.of("10 minutes"), time_col="ts")
        .aggregate(n=F.count(F.lit(1)), total=F.round(F.sum("value"), 4))
        .to_df()
        .select("window.start", "window.end", "event_type", "n", "total")
    )
    t = load_tables(spark, SF_DIR)
    expected = (
        t.events.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select("window.start", "window.end", "event_type", "n", "total")
    )
    assert rows_set(got) == rows_set(expected)


def test_sliding_and_session_assigners(spark):
    env = env_of(spark)
    ds = env.read_table("events", SF_DIR).key_by("user_id")
    sliding = (
        ds.window(SlidingEventTimeWindows.of("10 minutes", "5 minutes"), "ts")
        .count()
        .to_df()
    )
    session = ds.window(EventTimeSessionWindows.with_gap("5 minutes"), "ts").count().to_df()
    t = load_tables(spark, SF_DIR)
    assert sliding.count() == (
        t.events.groupBy(F.window("ts", "10 minutes", "5 minutes"), "user_id").count().count()
    )
    assert session.count() == (
        t.events.groupBy(F.session_window("ts", "5 minutes"), "user_id").count().count()
    )


def test_count_window_blocks(spark):
    """countWindow(20): every user's events split into orderly blocks of
    20 (only the last block per key may be smaller)."""
    env = env_of(spark)
    got = (
        env.read_table("events", SF_DIR)
        .key_by("user_id")
        .count_window(20, order_col="ts")
        .aggregate(n=F.count(F.lit(1)))
        .to_df()
    )
    rows = got.collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r._win_id, r.n))
    for user, blocks in by_user.items():
        blocks.sort()
        # all blocks full except possibly the final one
        assert all(n == 20 for _, n in blocks[:-1]), f"user {user}: ragged non-final block"
        assert 1 <= blocks[-1][1] <= 20


def test_union_and_from_collection(spark):
    env = env_of(spark)
    a = env.from_collection([(1, "a"), (2, "b")], "id long, tag string")
    b = env.from_collection([(3, "c")], "id long, tag string")
    assert rows_set(a.union(b).to_df()) == {(1, "a"), (2, "b"), (3, "c")}


def test_streaming_job_through_fluent_api(spark, tmp_path):
    """The fluent API drives a real Structured Streaming job: rate
    source → filter → map, sunk via add_sink(foreachBatch)."""
    env = env_of(spark)
    seen: list = []
    (
        env.rate_stream(rows_per_second=500)
        .filter(F.col("value") % 2 == 0)
        .map(doubled=F.col("value") * 2)
        .add_sink(lambda df, epoch: seen.extend(df.collect()))
    )
    import time

    deadline = time.time() + 30
    while not seen and time.time() < deadline:
        time.sleep(0.5)
    env.stop()
    assert seen, "streaming sink never received a batch"
    assert all(r.doubled % 4 == 0 for r in seen)


def test_count_window_tiebreak_determinism(spark):
    """Tied order_col values must land in deterministic blocks: with the
    event_id default tiebreak, repeated runs agree; explicit missing
    tiebreak columns raise."""
    import pytest

    env = env_of(spark)
    base = env.read_table("events", SF_DIR).key_by("user_id")
    # All events share ONE order value → ordering is pure tiebreak.
    tied = base._df.withColumn("const_ts", F.lit(0))
    from flink_quickstart_spark.api import KeyedStream

    keyed = KeyedStream(tied, [F.col("user_id")], base._env)
    win = keyed.count_window(7, order_col="const_ts")
    assert win._tiebreaks == ["event_id"]
    a = win.aggregate(mn=F.min("event_id"), mx=F.max("event_id")).to_df()
    b = keyed.count_window(7, order_col="const_ts").aggregate(
        mn=F.min("event_id"), mx=F.max("event_id")
    ).to_df()
    ra = {(r.user_id, r._win_id): (r.mn, r.mx) for r in a.collect()}
    rb = {(r.user_id, r._win_id): (r.mn, r.mx) for r in b.collect()}
    assert ra == rb and ra

    with pytest.raises(ValueError, match="tiebreak columns not in frame"):
        keyed.count_window(7, order_col="const_ts", tiebreak_cols=("nope",))


def test_datastream_join_surface(spark):
    """Flink join-surface parity on the fluent API: equi join (+broadcast
    hint), interval join (incl. negative lower bound), as-of join, and
    coGroup all delegate to the engine's operators and agree with direct
    DataFrame formulations."""
    import pandas as pd

    env = env_of(spark)
    ev = env.read_table("events", SF_DIR)
    cust = env.read_table("customer", SF_DIR)
    ords = env.read_table("orders", SF_DIR)

    # equi + broadcast hint
    j = ords.join(cust, on=ords._df.o_custkey == cust._df.c_custkey,
                  broadcast=True)
    assert j.to_df().count() == ords._df.join(
        cust._df, ords._df.o_custkey == cust._df.c_custkey
    ).count()
    assert "BroadcastHashJoin" in (
        j.to_df()._jdf.queryExecution().executedPlan().toString()
    )

    # interval join: purchases followed by clicks within 10 minutes
    purchases = ev.filter(F.col("event_type") == "purchase").map(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").map(
        "user_id", "ts", "event_id"
    )
    got = purchases.interval_join(
        clicks, key="user_id", lower="0 seconds", upper="10 minutes"
    ).to_df()
    l, r = purchases.to_df().alias("l"), clicks.to_df().alias("r")
    ref = l.join(
        r,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 10 minutes")),
    )
    assert got.count() == ref.count() > 0
    # negative lower bound widens backward
    wide = purchases.interval_join(
        clicks, key="user_id", lower="-10 minutes", upper="10 minutes"
    ).to_df()
    assert wide.count() >= got.count()

    # as-of join matches the operator directly
    asof = purchases.as_of_join(
        clicks, key="user_id", left_time="ts", right_time="ts",
        value_cols=["event_id"],
    ).to_df()
    assert asof.count() == purchases.to_df().count()

    # coGroup: per-user counts from both sides
    def counts(key, lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": [key[0]], "n_l": [len(lp)], "n_r": [len(rp)]}
        )

    cg = purchases.co_group(
        clicks, "user_id", counts, "user_id bigint, n_l bigint, n_r bigint"
    ).to_df()
    row = cg.where(F.col("n_l") > 0).first()
    assert row is not None and row.n_l > 0


def test_redistribution_and_split(spark):
    """rebalance shuffles to N even partitions; rescale coalesces without
    a shuffle; split routes every row to exactly one branch (nulls to
    the else-branch)."""
    env = env_of(spark)
    ev = env.read_table("events", SF_DIR)

    reb = ev.rebalance(8).to_df()
    assert reb.rdd.getNumPartitions() == 8
    assert "Exchange RoundRobinPartitioning" in (
        reb._jdf.queryExecution().executedPlan().toString()
    )

    resc = ev.rebalance(8).rescale(2).to_df()
    assert resc.rdd.getNumPartitions() == 2
    plan = resc._jdf.queryExecution().executedPlan().toString()
    assert "Coalesce" in plan, plan

    hot, rest = ev.split(F.col("value") > 100)
    n_hot, n_rest = hot.to_df().count(), rest.to_df().count()
    assert n_hot + n_rest == ev.to_df().count()
    assert n_hot == ev.to_df().where(F.col("value") > 100).count()


def test_with_metrics_observation(spark):
    """Accumulator parity: metrics ride the materializing action with no
    extra pass (Spark Observation <-> Flink accumulators)."""
    from pyspark.sql import functions as F

    from flink_quickstart_spark.api import StreamExecutionEnvironment

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ds = env.from_collection(
        [(1, 2.0), (2, 4.0), (3, 6.0)], "id long, v double"
    ).with_metrics(
        "job_stats",
        n_rows=F.count(F.lit(1)),
        sum_v=F.sum("v"),
    )
    assert ds.to_df().count() == 3
    m = env.metrics("job_stats")
    assert m["n_rows"] == 3 and m["sum_v"] == 12.0


def test_with_metrics_name_errors(spark):
    """Duplicate observation names fail loudly (Observations are
    single-use), and unknown lookups name the registered set."""
    import pytest
    from pyspark.sql import functions as F

    from flink_quickstart_spark.api import StreamExecutionEnvironment

    env = StreamExecutionEnvironment.get_execution_environment(spark)
    ds = env.from_collection([(1,)], "id long").with_metrics(
        "dup_name", n=F.count(F.lit(1))
    )
    with pytest.raises(ValueError, match="already registered"):
        ds.with_metrics("dup_name", n=F.count(F.lit(1)))
    with pytest.raises(KeyError, match="dup_name"):
        env.metrics("no_such_metric")


def test_async_enrich_bulk_lookup(spark):
    """AsyncFunction parity: one bulk lookup per Arrow batch, distinct
    keys only, NULL for misses."""
    from flink_quickstart_spark.operators.enrich import async_enrich

    calls = []

    def fake_lookup(keys):
        calls.append(sorted(keys))
        return {k: f"name-{k}" for k in keys if k % 2 == 0}

    df = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "row_id long, key long"
    ).coalesce(1)
    out = async_enrich(df, "key", fake_lookup, out_col="name").collect()
    assert len(out) == 100
    for r in out:
        if r.key % 2 == 0:
            assert r.name == f"name-{r.key}"
        else:
            assert r.name is None
    # distinct keys per batch, not per row: 100 rows, 4 distinct keys
    assert all(len(c) <= 4 for c in calls)
