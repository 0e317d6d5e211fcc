"""Streaming ↔ batch equivalence (SURVEY.md §5.2) — the Spark-idiomatic
replacement for Flink harness-based operator tests: the same declarative
query must produce identical results on a bounded replay of the stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_quickstart_spark.sources.tables import load_table
from flink_quickstart_spark.streaming.harness import (
    events_stream,
    run_stream_equivalent,
    run_to_memory,
)
from flink_quickstart_spark.streaming.stateful import (
    cep_click_then_purchase,
    count_window,
    streaming_dedup,
)
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumbling_window_equivalence(spark):
    def tumbling(df):
        return (
            df.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
            .select(F.unix_micros("w.start").alias("ws_us"), "event_type", "n", "s")
        )

    batch, stream = run_stream_equivalent(
        spark, SF_DIR, tumbling, output_mode="complete", watermark="10 minutes"
    )
    assert _rows(batch) == _rows(stream)


def test_stream_session_window_equivalence(spark):
    def session(df):
        return (
            df.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id",
                F.unix_micros("w.start").alias("ss_us"),
                F.unix_micros("w.end").alias("se_us"),
                "n",
            )
        )

    batch, stream = run_stream_equivalent(
        spark, SF_DIR, session, output_mode="complete", watermark="10 minutes"
    )
    assert _rows(batch) == _rows(stream)


def test_stream_static_enrichment_join(spark):
    """I8: stream ⋈ static dimension — supported natively by Spark."""
    static_types = spark.createDataFrame(
        [("click", "engage"), ("view", "engage"), ("purchase", "convert"),
         ("signup", "convert"), ("error", "ops")],
        "event_type string, category string",
    )
    stream = events_stream(spark, SF_DIR).join(F.broadcast(static_types), "event_type")
    out = run_to_memory(stream.select("event_id", "category"))
    batch = load_table(spark, SF_DIR, "events").join(static_types, "event_type").select(
        "event_id", "category"
    )
    assert _rows(out) == _rows(batch)


def test_stream_count_window_matches_batch_analog(spark):
    """I10: stateful count-window (applyInPandasWithState) must agree with
    the oracle-checked batch-analog for complete blocks."""
    from flink_quickstart_spark.plans import load_all, registry

    load_all()
    n = 20
    stream_out = run_to_memory(count_window(events_stream(spark, SF_DIR), n=n))
    batch = registry.REGISTRY["q_count_window"].builder(spark, SF_DIR)
    complete_blocks = batch.where(F.col("n_events") == n).select(
        "user_id", "block_id", "n_events", "sum_value"
    )
    assert _rows(stream_out) == _rows(complete_blocks)


def test_stream_cep_matches_batch_analog(spark):
    """I11: stateful CEP (pending-click state machine) must agree with the
    lag/lead batch analog."""
    from flink_quickstart_spark.plans import load_all, registry

    load_all()
    stream_out = run_to_memory(cep_click_then_purchase(events_stream(spark, SF_DIR)))
    batch = registry.REGISTRY["q_pattern_click_then_purchase"].builder(spark, SF_DIR)
    assert _rows(stream_out.select(batch.columns)) == _rows(batch)


def test_streaming_dedup_bounded_state(spark):
    """I6: dropDuplicatesWithinWatermark keeps exactly one row per key
    here (all duplicates of a (user, type) fall inside the horizon)."""
    out = run_to_memory(streaming_dedup(events_stream(spark, SF_DIR), "40 days"))
    batch = load_table(spark, SF_DIR, "events")
    n_keys = batch.select("user_id", "event_type").distinct().count()
    assert out.count() == n_keys


def test_rate_and_socket_sources_exist(spark):
    """A4/A5: rate source builds a valid streaming plan (socket needs a
    live endpoint; schema check only)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", 10).load()
    assert rate.isStreaming and set(rate.columns) == {"timestamp", "value"}


def test_stream_stream_interval_join(spark):
    """I7: stream-stream join with watermarks + time-range condition must
    agree with the batch interval-join key (q_join_interval)."""
    from flink_quickstart_spark.plans import load_all, registry

    load_all()
    clicks = (
        events_stream(spark, SF_DIR)
        .where(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .alias("c")
    )
    purchases = (
        events_stream(spark, SF_DIR)
        .where(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .alias("p")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c.user_id = p.user_id AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTES"
        ),
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.user_id").alias("user_id"),
        F.unix_micros("c.ts").alias("click_ts_us"),
        F.unix_micros("p.ts").alias("purchase_ts_us"),
    )
    stream_out = run_to_memory(joined)
    batch = registry.REGISTRY["q_join_interval"].builder(spark, SF_DIR)
    assert _rows(stream_out.select(batch.columns)) == _rows(batch)


def test_idempotent_sink_replay_does_not_duplicate(spark, tmp_path):
    """I13: re-delivering the same epoch to the idempotent sink must
    leave the output identical — the exactly-once property foreachBatch
    alone does not give."""
    from flink_quickstart_spark.streaming.harness import idempotent_foreach_batch

    out = str(tmp_path / "sink")
    handle = idempotent_foreach_batch(out)
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    handle(batch, 0)
    once = sorted(tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect())
    handle(batch, 0)  # simulated failure replay of the same epoch
    twice = sorted(tuple(r) for r in spark.read.parquet(out).drop("batch_id").collect())
    assert once == twice == [(1, "a"), (2, "b")]
    handle(spark.createDataFrame([(3, "c")], "id long, v string"), 1)
    assert spark.read.parquet(out).count() == 3


def test_schema_evolution_merge(spark, tmp_path):
    """Scans must tolerate schema drift across files (a 100 TB corpus is
    written over months): mergeSchema unions the columns, nulling the
    gaps."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p + "/d1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(p + "/d2")
    merged = spark.read.option("mergeSchema", "true").parquet(p + "/d1", p + "/d2")
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {(r.id, r.v, r.score) for r in merged.collect()}
    assert rows == {(1, "a", None), (2, "b", 9.5)}


def test_stream_sliding_window_equivalence(spark):
    def sliding(df):
        return (
            df.groupBy(
                F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_micros("w.start").alias("ws_us"), "event_type", "n")
        )

    batch, stream = run_stream_equivalent(
        spark, SF_DIR, sliding, output_mode="complete", watermark="10 minutes"
    )
    assert _rows(batch) == _rows(stream)


def test_stream_upsert_latest_equivalence(spark):
    """The q_upsert_latest materialization runs identically as a
    streaming aggregation (Spark update/complete mode = Flink upsert
    stream)."""

    def latest(df):
        key = F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 10, "0"),
        )
        return df.groupBy("user_id").agg(
            F.max_by("event_type", key).alias("last_type"),
            F.unix_micros(F.max("ts")).alias("last_ts_us"),
            F.count(F.lit(1)).alias("n"),
        )

    batch, stream = run_stream_equivalent(
        spark, SF_DIR, latest, output_mode="complete", watermark="10 minutes"
    )
    assert _rows(batch) == _rows(stream)


def test_checkpoint_restart_resumes_without_loss_or_dup(spark, tmp_path):
    """I13 savepoint analog: stop a streaming query, land more input,
    restart from the SAME checkpoint — the offset WAL must resume where
    it left off, producing each input row exactly once across both runs."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def land(name, rows):
        spark.createDataFrame(rows, "id long, v double").write.parquet(
            str(src / name)
        )

    def run_once():
        q = (
            spark.readStream.schema("id long, v double")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
            .withColumn("doubled", F.col("v") * 2)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    land("batch1", [(i, float(i)) for i in range(100)])
    run_once()
    first = spark.read.parquet(out).count()
    assert first == 100

    land("batch2", [(i, float(i)) for i in range(100, 150)])
    run_once()  # restart from the same checkpoint
    final = spark.read.parquet(out)
    assert final.count() == 150  # batch1 NOT reprocessed, batch2 not missed
    assert final.select("id").distinct().count() == 150


def test_continuous_aggregate_tiers_streamed_then_rolled(spark, tmp_path):
    """Capstone for the continuous-aggregate pattern (q_rollup_multires'
    production shape): STREAM the events into a materialized 10-minute
    rollup tier (foreachBatch + epoch-partitioned idempotent sink), then
    compute the 1-hour tier FROM THE STORED TIER, and require exact
    agreement with the 1-hour aggregate computed directly from raw batch
    data. Exercises file-source streaming, watermarking, exactly-once
    materialization, and algebraic re-aggregation in one path."""
    from flink_quickstart_spark.streaming.harness import (
        events_stream,
        idempotent_foreach_batch,
    )

    tier_dir = str(tmp_path / "tier_10min")
    stream = events_stream(spark, SF_DIR)
    ten_min = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
        .select(
            F.unix_micros("w.start").alias("ws_us"), "event_type", "n", "sum_v"
        )
    )
    # update mode, not append: append withholds windows the final
    # watermark has not passed (the stream's last 10 minutes), which
    # would leave the newest tier rows unmaterialized forever on a
    # bounded replay. Update emits every changed window per epoch and
    # the epoch-partitioned idempotent sink makes re-delivery safe.
    q = (
        ten_min.writeStream.outputMode("update")
        .foreachBatch(idempotent_foreach_batch(tier_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    stored = spark.read.parquet(tier_dir)
    hour_from_tier = (
        stored.withColumn(
            "hour_us", (F.col("ws_us") - F.col("ws_us") % (3600 * 1_000_000))
        )
        .groupBy("hour_us", "event_type")
        .agg(F.sum("n").alias("n"), F.round(F.sum("sum_v"), 2).alias("sum_v"))
    )
    from flink_quickstart_spark.sources.tables import load_tables

    direct = (
        load_tables(spark, SF_DIR)
        .events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_v"))
        .select(F.unix_micros("w.start").alias("hour_us"), "event_type", "n", "sum_v")
    )
    got = sorted(tuple(r) for r in hour_from_tier.collect())
    exp = sorted(tuple(r) for r in direct.collect())
    assert got == exp


def test_rollup_restart_mid_stream_exactly_once(spark, tmp_path):
    """I13 hard case: CRASH the continuous-aggregate query mid-stream —
    after the sink wrote an epoch but before Spark committed it — then
    restart from the same checkpoint. The failed epoch is re-delivered
    with the SAME batch_id; the epoch-partitioned idempotent sink must
    overwrite (not append) it, and the resumed state must neither lose
    nor double-count rows: the 1-hour tier computed from the stored
    10-minute tier must equal the 1-hour aggregate straight from batch
    data, and no (epoch, window) may hold more than one row."""
    import os
    import time as _time

    from pyspark.errors import StreamingQueryException

    from flink_quickstart_spark.sources.tables import load_table
    from flink_quickstart_spark.streaming.harness import idempotent_foreach_batch

    events = load_table(spark, SF_DIR, "events")
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 4
    src = tmp_path / "src"
    src.mkdir()
    # four time-sliced files so replay is ordered (a real landing dir):
    # watermarks stay monotone and each file forms one micro-batch
    for i in range(4):
        part = events.where(
            (F.col("ts") >= F.lit(lo + i * span))
            & ((F.col("ts") < F.lit(lo + (i + 1) * span)) | F.lit(i == 3))
        )
        pdir = src / f"part{i}"
        part.coalesce(1).write.parquet(str(pdir))
        for f in pdir.iterdir():  # strictly increasing mtimes => order
            os.utime(f, (_time.time() + i, _time.time() + i))

    tier_dir = str(tmp_path / "tier")
    ckpt = str(tmp_path / "ckpt")
    write_epoch = idempotent_foreach_batch(tier_dir)
    crashed = {"done": False}

    def run(bomb: bool):
        def handle(batch_df, batch_id):
            write_epoch(batch_df, batch_id)  # sink write HAS happened
            if bomb and batch_id == 1 and not crashed["done"]:
                crashed["done"] = True
                raise RuntimeError("injected crash after sink write")

        stream = (
            spark.readStream.schema(events.schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        ten_min = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
            .select(
                F.unix_micros("w.start").alias("ws_us"), "event_type", "n", "sum_v"
            )
        )
        q = (
            ten_min.writeStream.outputMode("update")
            .foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    try:
        run(bomb=True)
        raise AssertionError("crash was not injected")
    except StreamingQueryException:
        pass
    assert crashed["done"]
    run(bomb=False)  # resume: failed epoch re-delivered, rest processed

    stored = spark.read.parquet(tier_dir)
    # idempotency: replayed epoch overwrote, never appended
    assert (
        stored.groupBy("batch_id", "ws_us", "event_type")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
        == 1
    )
    # upsert semantics: latest emission per window wins
    from pyspark.sql import Window

    w = Window.partitionBy("ws_us", "event_type").orderBy(
        F.col("batch_id").desc()
    )
    latest = (
        stored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    hour_from_tier = (
        latest.withColumn(
            "hour_us", F.col("ws_us") - F.col("ws_us") % (3600 * 1_000_000)
        )
        .groupBy("hour_us", "event_type")
        .agg(F.sum("n").alias("n"), F.round(F.sum("sum_v"), 2).alias("sum_v"))
    )
    direct = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_v"))
        .select(F.unix_micros("w.start").alias("hour_us"), "event_type", "n", "sum_v")
    )
    assert _rows(hour_from_tier) == _rows(direct)


def test_streaming_ppm_decode_matches_batch(spark):
    """K8 on a STREAM: the real PPM encode → decode mapInPandas stages
    run unchanged on a streaming documents source and produce exactly
    the batch result — multimodal ingest as an incremental pipeline."""
    from flink_quickstart_spark.operators.multimodal import (
        attach_ppm_media,
        decode_stub,
    )
    from flink_quickstart_spark.sources.tables import load_table
    from flink_quickstart_spark.streaming.harness import (
        run_to_memory,
        table_stream,
    )

    def pipeline(docs):
        media = attach_ppm_media(docs, "doc_id", "text", side=16)
        return decode_stub(media).select("media_id", "n_bytes", "feature")

    batch = pipeline(load_table(spark, SF_DIR, "documents"))
    stream = run_to_memory(pipeline(table_stream(spark, SF_DIR, "documents")))
    b = {r.media_id: (r.n_bytes, tuple(r.feature)) for r in batch.collect()}
    s = {r.media_id: (r.n_bytes, tuple(r.feature)) for r in stream.collect()}
    assert b == s and b


def test_streaming_exact_dedup_matches_batch(spark):
    """LLM-pipeline op on a STREAM: exact dedup (sha-grouped) over a
    documents file stream in complete mode equals the batch operator —
    the incremental-corpus ingest path (new files land, dedup state
    updates, no recompute)."""
    from flink_quickstart_spark.operators.dedup import exact_dedup
    from flink_quickstart_spark.sources.tables import load_table
    from flink_quickstart_spark.streaming.harness import (
        run_to_memory,
        table_stream,
    )

    stream = table_stream(spark, SF_DIR, "documents")
    got = run_to_memory(
        exact_dedup(stream, "text", "doc_id"), output_mode="complete"
    )
    batch = exact_dedup(load_table(spark, SF_DIR, "documents"), "text", "doc_id")
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in batch.collect()
    } and got.count() > 0


def test_stream_ewma_matches_batch_and_pandas_reference(spark):
    """I9 depth: the recursive EWMA's streamed run (state carried across
    micro-batches) must equal (a) its own batch-mode run and (b) an
    independent pandas ewm(adjust=False) reference."""
    from flink_quickstart_spark.streaming.stateful import streaming_ewma

    stream_out = run_to_memory(streaming_ewma(events_stream(spark, SF_DIR)))
    batch_in = load_table(spark, SF_DIR, "events")
    batch_out = streaming_ewma(batch_in)
    assert _rows(stream_out) == _rows(batch_out)

    pdf = batch_in.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    ).toPandas()
    pdf = pdf.sort_values(["user_id", "ts_us", "event_id"])
    pdf["ref"] = (
        pdf.groupby("user_id")["value"]
        .transform(lambda s: s.ewm(alpha=0.3, adjust=False).mean())
        .round(6)
    )
    got = {
        (r.user_id, r.event_id): r.ewma for r in stream_out.collect()
    }
    for row in pdf.itertuples():
        assert abs(got[(row.user_id, row.event_id)] - row.ref) < 1e-5


def test_stream_timeout_pattern_matches_batch_analog(spark):
    """I11b: the stateful timeout/absence processor must agree with the
    lead() batch analog on every click that HAS a successor; the stream
    cannot flush end-of-stream pending clicks (the batch's gap_us = -1
    rows) without event-time timers, so those are excluded."""
    from flink_quickstart_spark.plans import load_all, registry
    from flink_quickstart_spark.streaming.stateful import timeout_absence

    load_all()
    stream_out = run_to_memory(timeout_absence(events_stream(spark, SF_DIR)))
    batch = (
        registry.REGISTRY["q_pattern_timeout"]
        .builder(spark, SF_DIR)
        .where(F.col("gap_us") != -1)
    )
    assert _rows(stream_out.select(batch.columns)) == _rows(batch)


def test_stream_timeout_timers_flush_pending_clicks(spark):
    """I11b event-time-timer variant: timeout_absence_flush must emit the
    batch analog's gap_us = -1 rows too (clicks with no successor),
    fired by the watermark in availableNow's trailing no-data batch —
    full parity with q_pattern_timeout, pending rows included, for
    every click whose deadline the final watermark passes."""
    from flink_quickstart_spark.plans import load_all, registry
    from flink_quickstart_spark.streaming.stateful import timeout_absence_flush

    load_all()
    src = events_stream(spark, SF_DIR).withWatermark("ts", "0 seconds")
    stream_out = run_to_memory(timeout_absence_flush(src))
    batch = registry.REGISTRY["q_pattern_timeout"].builder(spark, SF_DIR)
    # Pending clicks whose deadline the final watermark (max ts, delay 0)
    # never passes cannot fire — exclude them from the parity set. On
    # this dataset the exclusion is empty, but the bound is the contract.
    max_ts_us = (
        load_table(spark, SF_DIR, "events")
        .agg(F.max(F.unix_micros("ts")))
        .collect()[0][0]
    )
    fireable = batch.where(
        (F.col("gap_us") != -1)
        | (F.col("ts_us") + 3_600_000_000 < F.lit(max_ts_us))
    )
    assert _rows(stream_out.select(fireable.columns)) == _rows(fireable)
    # and the flush rows actually exist (the variant's whole point)
    assert stream_out.where(F.col("gap_us") == -1).count() > 0
