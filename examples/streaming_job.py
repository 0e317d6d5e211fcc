"""The canonical STREAMING quickstart job, end to end on this engine.

Flink original shape [PK]::

    env = StreamExecutionEnvironment.getExecutionEnvironment()
    env.readFile(path, PROCESS_CONTINUOUSLY)
       .assignTimestampsAndWatermarks(...)
       .keyBy(e -> e.eventType)
       .window(TumblingEventTimeWindows.of(Time.minutes(10)))
       .aggregate(new CountAndSum())
       .addSink(sink)
    env.execute("windowed counts")

Here: a directory-monitoring parquet stream over the events table, a
10-minute event-time tumbling window with a watermark, counts + sums per
(window, event_type), drained through an availableNow trigger into a
parquet sink with a checkpoint WAL — then the batch twin of the same
query verifies the streamed result exactly (Spark guarantees identical
window semantics across the two modes).

Run: ``python examples/streaming_job.py [sf_dir]``
"""

from __future__ import annotations

import sys
import tempfile
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from flink_quickstart_spark import get_spark
from flink_quickstart_spark.sources.tables import load_table
from flink_quickstart_spark.streaming.harness import (
    events_stream,
    write_stream_parquet,
)


def windowed_counts(events):
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_us"), "event_type", "n", "sum_value"
        )
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="streaming-job")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix=f"stream_out_{uuid.uuid4().hex[:6]}_")

    stream = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    write_stream_parquet(windowed_counts(stream), out)

    streamed = spark.read.parquet(out)
    events = load_table(spark, sf_dir, "events")
    batch = windowed_counts(events)
    # Append-mode windowed aggregation emits a window only once the
    # watermark passes its END — the final window of a bounded replay is
    # correctly withheld (it could still receive late rows in a live
    # stream). Compare against the batch twin restricted to CLOSED
    # windows: end <= max(ts) - 30min.
    wm_us = events.agg(
        (F.unix_micros(F.max("ts")) - 30 * 60 * 1_000_000).alias("wm")
    ).collect()[0].wm
    closed = batch.where(
        (F.col("window_us") + 10 * 60 * 1_000_000) <= wm_us
    )
    s_rows = sorted(map(tuple, streamed.collect()))
    b_rows = sorted(map(tuple, closed.collect()))
    print(
        f"windows streamed: {len(s_rows)}, batch twin (closed windows): "
        f"{len(b_rows)} of {batch.count()} total"
    )
    if s_rows != b_rows:
        print("MISMATCH between streamed and batch results")
        return 1
    print(f"stream == batch on every closed window, wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
