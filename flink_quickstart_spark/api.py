"""Fluent DataStream-style API façade.

The reference archetype's programming model [PK — SURVEY.md §0; checkout
empty] is the Flink quickstart skeleton::

    env = StreamExecutionEnvironment.getExecutionEnvironment()
    env.readTextFile(path)
       .flatMap(tokenizer).keyBy(0).sum(1)
       .print()
    env.execute("job")

This module offers the same shape so a reference user can port a job
line-by-line, while every call compiles to declarative DataFrame
operations — Catalyst sees one logical plan per pipeline and optimizes
it whole (pushdown/pruning/broadcast still apply; nothing here is
row-at-a-time Python). The wrapper adds NO execution machinery: a
``DataStream`` is a thin immutable handle on a ``DataFrame``; batch
pipelines are eager at the sink only (Spark semantics), streaming
pipelines start on ``env.execute()``.

Scale note: because each fluent chain is just a DataFrame plan, the
100 TB design contract of docs/SCALE_DESIGN.md (partial aggregation,
broadcast dims, AQE skew handling) applies unchanged to jobs written in
this style.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ColumnLike = Column | str


def _col(c: ColumnLike) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# Window assigners (Flink: TumblingEventTimeWindows.of(...) etc.)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TumblingEventTimeWindows:
    """``TumblingEventTimeWindows.of(Time.minutes(10))`` analog."""

    duration: str

    @classmethod
    def of(cls, duration: str) -> "TumblingEventTimeWindows":
        return cls(duration)

    def apply(self, time_col: Column) -> Column:
        return F.window(time_col, self.duration)


@dataclass(frozen=True)
class SlidingEventTimeWindows:
    """``SlidingEventTimeWindows.of(size, slide)`` analog."""

    duration: str
    slide: str

    @classmethod
    def of(cls, duration: str, slide: str) -> "SlidingEventTimeWindows":
        return cls(duration, slide)

    def apply(self, time_col: Column) -> Column:
        return F.window(time_col, self.duration, self.slide)


@dataclass(frozen=True)
class EventTimeSessionWindows:
    """``EventTimeSessionWindows.withGap(gap)`` analog."""

    gap: str

    @classmethod
    def with_gap(cls, gap: str) -> "EventTimeSessionWindows":
        return cls(gap)

    def apply(self, time_col: Column) -> Column:
        return F.session_window(time_col, self.gap)


WindowAssigner = (
    TumblingEventTimeWindows | SlidingEventTimeWindows | EventTimeSessionWindows
)


# ---------------------------------------------------------------------------
# DataStream / KeyedStream / WindowedStream
# ---------------------------------------------------------------------------


class DataStream:
    """Immutable fluent handle on a (batch or streaming) DataFrame."""

    def __init__(self, df: DataFrame, env: "StreamExecutionEnvironment") -> None:
        self._df = df
        self._env = env

    # -- transforms (Flink: map / flatMap / filter / project) --------------

    def map(self, *cols: ColumnLike, **named: ColumnLike) -> "DataStream":
        """1→1 transform. Positional args keep columns; keyword args add
        or replace aliased expressions (``.map("user_id", doubled=F.col("value")*2)``).
        Compiles to a single Project — stays in whole-stage codegen."""
        exprs = [_col(c) for c in cols] + [_col(e).alias(n) for n, e in named.items()]
        return DataStream(self._df.select(*exprs), self._env)

    def with_column(self, name: str, expr: ColumnLike) -> "DataStream":
        return DataStream(self._df.withColumn(name, _col(expr)), self._env)

    def flat_map(
        self, expr: ColumnLike, alias: str, keep: Iterable[ColumnLike] = ()
    ) -> "DataStream":
        """1→N transform (Flink ``flatMap``): explode an array expression
        into ``alias``, keeping ``keep`` alongside. The canonical
        word-count tokenizer is
        ``.flat_map(F.split("text", r"\\s+"), "word")``."""
        cols = [_col(c) for c in keep] + [F.explode(_col(expr)).alias(alias)]
        return DataStream(self._df.select(*cols), self._env)

    def filter(self, cond: ColumnLike) -> "DataStream":
        return DataStream(self._df.where(_col(cond)), self._env)

    def union(self, *others: "DataStream") -> "DataStream":
        df = self._df
        for o in others:
            df = df.unionByName(o._df)
        return DataStream(df, self._env)

    def assign_timestamps_and_watermarks(
        self, time_col: str, max_out_of_orderness: str
    ) -> "DataStream":
        """``WatermarkStrategy.forBoundedOutOfOrderness`` analog — a
        no-op marker on batch frames, a real watermark on streams."""
        if self._df.isStreaming:
            return DataStream(
                self._df.withWatermark(time_col, max_out_of_orderness), self._env
            )
        return self

    # -- partitioning (Flink: keyBy) ---------------------------------------

    def key_by(self, *keys: ColumnLike) -> "KeyedStream":
        return KeyedStream(self._df, [_col(k) for k in keys], self._env)

    # -- physical redistribution (Flink: rebalance / rescale / shuffle) ----

    def rebalance(self, num_partitions: int | None = None) -> "DataStream":
        """Flink ``rebalance()``: round-robin redistribution to break
        skew from an uneven source — a full shuffle; use only when a
        downstream stage genuinely needs even partitions."""
        df = (
            self._df.repartition(num_partitions)
            if num_partitions
            else self._df.repartition(self._df.sparkSession.sparkContext.defaultParallelism)
        )
        return DataStream(df, self._env)

    def rescale(self, num_partitions: int) -> "DataStream":
        """Flink ``rescale()`` analog: local merge to fewer partitions
        WITHOUT a shuffle (coalesce) — the cheap way down in parallelism
        (e.g. before writing few large files)."""
        return DataStream(self._df.coalesce(num_partitions), self._env)

    def split(self, cond: ColumnLike) -> tuple["DataStream", "DataStream"]:
        """Side-output analog (Flink split/OutputTag, batch form): rows
        matching ``cond`` and the rest, as two streams off ONE lineage —
        Spark scans the source twice unless cached, but each branch gets
        the full pushdown of its own predicate. For the streaming
        late-data side output use streaming/harness.py's
        foreach_batch_with_late_side_output (single-pass per batch)."""
        c = _col(cond)
        return (
            DataStream(self._df.where(c), self._env),
            DataStream(self._df.where(~c | c.isNull()), self._env),
        )

    # -- joins (Flink: join / intervalJoin / coGroup) ----------------------

    def join(
        self, other: "DataStream", on, how: str = "inner", broadcast: bool = False
    ) -> "DataStream":
        """Equi join (Flink ``DataStream.join ... where().equalTo()``).
        ``broadcast=True`` hints the other side (Flink broadcast-join
        analog) — use for dimension-sized sides."""
        right = F.broadcast(other._df) if broadcast else other._df
        return DataStream(self._df.join(right, on, how), self._env)

    def interval_join(
        self,
        other: "DataStream",
        key: str,
        lower: str,
        upper: str,
        left_time: str = "ts",
        right_time: str = "ts",
    ) -> "DataStream":
        """Flink ``keyedA.intervalJoin(keyedB).between(lower, upper)``:
        pairs where ``l.left_time + lower <= r.right_time <= l.left_time
        + upper`` on equal keys. Bounds are interval strings ("0 seconds",
        "10 minutes"); negative bounds look backward ("-10 minutes").
        Catalyst plans the equi-key part as the join key (hash shuffle)
        with the time bounds as post-join predicates — the same shape the
        streaming stream-stream join uses with watermarks."""
        l, r = self._df.alias("l"), other._df.alias("r")
        lt = F.col(f"l.{left_time}")
        rt = F.col(f"r.{right_time}")
        cond = (
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (rt >= lt + F.expr(f"INTERVAL {lower}"))
            & (rt <= lt + F.expr(f"INTERVAL {upper}"))
        )
        return DataStream(l.join(r, cond), self._env)

    def as_of_join(
        self,
        other: "DataStream",
        key: str,
        left_time: str,
        right_time: str,
        value_cols: list[str],
    ) -> "DataStream":
        """Flink temporal-table join analog: each left row picks the
        latest right row at-or-before its time (operators/joins.py)."""
        from flink_quickstart_spark.operators.joins import asof_join

        return DataStream(
            asof_join(self._df, other._df, key, left_time, right_time, value_cols),
            self._env,
        )

    def co_group(
        self, other: "DataStream", key, fn: Callable, schema
    ) -> "DataStream":
        """Flink ``coGroup``: both inputs grouped on ``key``; ``fn(key,
        left_pdf, right_pdf) -> pdf`` sees each key's full groups side by
        side (Arrow-batched cogroup.applyInPandas)."""
        grouped = self._df.groupBy(key).cogroup(other._df.groupBy(key))
        return DataStream(grouped.applyInPandas(fn, schema), self._env)

    # -- sinks -------------------------------------------------------------

    def to_df(self) -> DataFrame:
        return self._df

    def print(self, n: int = 20) -> None:
        """Flink ``stream.print()`` analog (console sink on streams)."""
        if self._df.isStreaming:
            q = self._df.writeStream.format("console").start()
            self._env._queries.append(q)
        else:
            self._df.show(n, truncate=False)

    def write_parquet(self, path: str, mode: str = "overwrite") -> None:
        self._df.write.mode(mode).parquet(path)

    def add_sink(self, fn: Callable) -> None:
        """Custom sink (Flink ``SinkFunction``): ``foreachBatch`` on
        streams, a direct call with the full frame on batch."""
        if self._df.isStreaming:
            q = self._df.writeStream.foreachBatch(fn).start()
            self._env._queries.append(q)
        else:
            fn(self._df, -1)

    def with_metrics(self, name: str, **metrics: Column) -> "DataStream":
        """Flink accumulators / operator metrics analog: attach named
        aggregate metrics that are computed AS A SIDE EFFECT of the next
        action, with zero extra passes over the data (Spark's
        ``Observation`` API — metrics piggyback on the job that
        materializes the stream, exactly like Flink accumulators ride
        the job execution). Read them back after an action via
        ``env.metrics(name)``.

        Batch only: streaming metrics go through each query's
        ``lastProgress`` (see streaming/harness.py)."""
        from pyspark.sql import Observation

        if name in self._env._observations:
            raise ValueError(
                f"metric observation {name!r} is already registered on this "
                "environment — Spark Observations are single-use, so reusing "
                "a name would silently orphan the earlier metrics; pick a "
                "distinct name per observed dataset"
            )
        obs = Observation(name)
        out = DataStream(self._df.observe(obs, *[
            m.alias(k) for k, m in metrics.items()
        ]), self._env)
        self._env._observations[name] = obs
        return out


class KeyedStream:
    def __init__(
        self, df: DataFrame, keys: list[Column], env: "StreamExecutionEnvironment"
    ) -> None:
        self._df = df
        self._keys = keys
        self._env = env

    def _agg(self, *aggs: Column) -> DataStream:
        return DataStream(self._df.groupBy(*self._keys).agg(*aggs), self._env)

    # -- Flink keyed reductions -------------------------------------------

    def sum(self, col: ColumnLike) -> DataStream:
        name = col if isinstance(col, str) else "sum"
        return self._agg(F.sum(_col(col)).alias(name))

    def min(self, col: ColumnLike) -> DataStream:
        name = col if isinstance(col, str) else "min"
        return self._agg(F.min(_col(col)).alias(name))

    def max(self, col: ColumnLike) -> DataStream:
        name = col if isinstance(col, str) else "max"
        return self._agg(F.max(_col(col)).alias(name))

    def count(self) -> DataStream:
        return self._agg(F.count(F.lit(1)).alias("count"))

    def reduce(self, **aggs: Column) -> DataStream:
        """General keyed aggregate: ``.reduce(total=F.sum("v"), n=F.count("*"))``.
        Catalyst plans every entry partial+final (map-side combine), the
        distributed analog of Flink's incremental ``ReduceFunction``."""
        return self._agg(*[e.alias(n) for n, e in aggs.items()])

    # -- windows -----------------------------------------------------------

    def window(self, assigner: WindowAssigner, time_col: str = "ts") -> "WindowedStream":
        return WindowedStream(self, assigner, time_col)

    def count_window(
        self,
        size: int,
        order_col: str = "ts",
        tiebreak_cols: tuple[str, ...] | None = None,
    ) -> "CountWindowedStream":
        """``tiebreak_cols`` must extend ``order_col`` to a unique total
        order per key — block membership is nondeterministic otherwise.
        Defaults to ``("event_id",)`` when that column exists."""
        return CountWindowedStream(self, size, order_col, tiebreak_cols)

    # -- process functions -------------------------------------------------

    def apply_in_pandas(self, fn: Callable, schema) -> DataStream:
        """Grouped-map escape hatch (Flink ``ProcessWindowFunction``
        analog) — Arrow-batched, one pandas frame per key group."""
        return DataStream(
            self._df.groupBy(*self._keys).applyInPandas(fn, schema), self._env
        )


class WindowedStream:
    def __init__(
        self, keyed: KeyedStream, assigner: WindowAssigner, time_col: str
    ) -> None:
        self._keyed = keyed
        self._assigner = assigner
        self._time_col = time_col

    def aggregate(self, **aggs: Column) -> DataStream:
        window_col = self._assigner.apply(F.col(self._time_col))
        df = self._keyed._df.groupBy(window_col, *self._keyed._keys).agg(
            *[e.alias(n) for n, e in aggs.items()]
        )
        return DataStream(df, self._keyed._env)

    # Flink convenience reductions on windows
    def sum(self, col: ColumnLike) -> DataStream:
        name = col if isinstance(col, str) else "sum"
        return self.aggregate(**{name: F.sum(_col(col))})

    def count(self) -> DataStream:
        return self.aggregate(count=F.count(F.lit(1)))


class CountWindowedStream:
    """Flink ``countWindow(n)`` — no Spark native; the batch-exact
    formulation groups each key's rows (ordered by ``order_col``, with
    ``tiebreak_cols`` extending it to a UNIQUE total order so block
    membership is deterministic) into blocks of ``size`` via
    ``(row_number()-1) div size`` (SURVEY.md §2.I10; the streaming form
    lives in streaming/stateful.py)."""

    def __init__(
        self,
        keyed: KeyedStream,
        size: int,
        order_col: str,
        tiebreak_cols: tuple[str, ...] | None = None,
    ) -> None:
        self._keyed = keyed
        self._size = size
        self._order_col = order_col
        cols = set(keyed._df.columns)
        if tiebreak_cols is None:
            # Documented default: event_id when present (the events-table
            # unique key); order_col-only otherwise (caller's risk).
            self._tiebreaks = ["event_id"] if "event_id" in cols else []
        else:
            missing = [c for c in tiebreak_cols if c not in cols]
            if missing:
                raise ValueError(
                    f"count_window tiebreak columns not in frame: {missing}"
                )
            self._tiebreaks = [c for c in tiebreak_cols if c != order_col]

    def aggregate(self, **aggs: Column) -> DataStream:
        from pyspark.sql import Window

        w = Window.partitionBy(*self._keyed._keys).orderBy(
            F.col(self._order_col), *[F.col(c) for c in self._tiebreaks]
        )
        blocked = self._keyed._df.withColumn(
            "_win_id", ((F.row_number().over(w) - F.lit(1)) / self._size).cast("bigint")
        )
        df = blocked.groupBy(*self._keyed._keys, F.col("_win_id")).agg(
            *[e.alias(n) for n, e in aggs.items()]
        )
        return DataStream(df, self._keyed._env)


# ---------------------------------------------------------------------------
# Environments
# ---------------------------------------------------------------------------


class StreamExecutionEnvironment:
    """``StreamExecutionEnvironment.getExecutionEnvironment()`` analog.

    Sources mirror the quickstart set: collections, text files, CSV,
    parquet, sockets, rate generator (SURVEY.md §2.A). Batch sources
    yield batch DataStreams; ``*_stream`` variants yield streaming ones.
    """

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark
        self._queries: list = []  # StreamingQuery handles started by sinks
        self._observations: dict = {}  # name -> Observation (accumulators)

    def metrics(self, name: str) -> dict:
        """Read back accumulator-style metrics attached with
        ``DataStream.with_metrics`` — available after an action has run
        over the observed frame (Flink ``getAccumulatorResult``)."""
        if name not in self._observations:
            known = ", ".join(sorted(self._observations)) or "<none>"
            raise KeyError(
                f"no metric observation named {name!r} — registered names: "
                f"{known}. Attach one with DataStream.with_metrics(name, ...) "
                "and run an action over the observed frame first."
            )
        return dict(self._observations[name].get)

    @classmethod
    def get_execution_environment(
        cls, spark: SparkSession | None = None
    ) -> "StreamExecutionEnvironment":
        if spark is None:
            from flink_quickstart_spark.session import get_spark

            spark = get_spark()
        return cls(spark)

    # -- sources -----------------------------------------------------------

    def from_collection(self, rows, schema=None) -> DataStream:
        return DataStream(self._spark.createDataFrame(rows, schema), self)

    def from_elements(self, *rows, schema=None) -> DataStream:
        return self.from_collection(list(rows), schema)

    def read_text_file(self, path: str) -> DataStream:
        return DataStream(self._spark.read.text(path), self)

    def read_csv_file(self, path: str, schema, **options) -> DataStream:
        return DataStream(
            self._spark.read.schema(schema).options(**options).csv(path), self
        )

    def read_parquet(self, path: str) -> DataStream:
        return DataStream(self._spark.read.parquet(path), self)

    def read_table(self, name: str, sf_dir: str) -> DataStream:
        """Load one of the engine's registered testdata tables (with the
        events.ts nanosecond normalization applied)."""
        from flink_quickstart_spark.sources.tables import load_tables

        return DataStream(getattr(load_tables(self._spark, sf_dir), name), self)

    def socket_text_stream(self, host: str, port: int) -> DataStream:
        df = (
            self._spark.readStream.format("socket")
            .option("host", host)
            .option("port", port)
            .load()
        )
        return DataStream(df, self)

    def rate_stream(self, rows_per_second: int = 100) -> DataStream:
        df = (
            self._spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .load()
        )
        return DataStream(df, self)

    def parquet_stream(self, path: str, schema) -> DataStream:
        """Directory-monitoring file stream (Flink
        ``readFile(PROCESS_CONTINUOUSLY)`` analog)."""
        return DataStream(self._spark.readStream.schema(schema).parquet(path), self)

    # -- lifecycle ---------------------------------------------------------

    def execute(self, job_name: str = "job", await_termination: bool = False) -> None:
        """Flink ``env.execute()`` analog. Batch pipelines have already
        run eagerly at their sinks (Spark semantics); for streaming
        pipelines this optionally blocks on every started query."""
        if await_termination:
            for q in self._queries:
                q.awaitTermination()

    def stop(self) -> None:
        for q in self._queries:
            q.stop()
        self._queries.clear()


class ExecutionEnvironment(StreamExecutionEnvironment):
    """Batch twin (Flink ``ExecutionEnvironment`` / ``BatchJob``) — the
    same surface; Spark unifies batch and streaming over one API."""
