"""Custom keyed stateful operators (SURVEY.md §2.I9-I11).

Reference surface [PK]: Flink ``KeyedProcessFunction`` with
``ValueState``/``ListState`` and timers — the extension point every
quickstart demonstrates (checkout empty — see SURVEY.md §0).

Spark twin: ``transformWithStateInPandas`` (Spark 4.x StatefulProcessor —
value/list/map state + timers) for the full surface, and
``applyInPandasWithState`` (GroupState) as the simpler stable API. Both
shuffle once on the key and keep state in the state store (RocksDB
provider configured in ``session.py`` — at 100 TB-scale keyed state the
default HDFS-backed heap store would OOM).

Batch analogs of both operators are registered as oracle-checked keys
(``q_count_window``, ``q_pattern_click_then_purchase``); the streaming
forms here are asserted equivalent in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNT_WINDOW_SCHEMA = "user_id bigint, block_id bigint, n_events bigint, sum_value double"
_COUNT_STATE_SCHEMA = "blocks_done bigint, cur_n bigint, cur_sum double"

CEP_SCHEMA = (
    "user_id bigint, click_id bigint, click_ts_us bigint, "
    "purchase_id bigint, purchase_ts_us bigint"
)
_CEP_STATE_SCHEMA = "click_id bigint, click_ts_us bigint"


def count_window(events: DataFrame, n: int = 20) -> DataFrame:
    """I10: Flink ``countWindow(n)`` — emit an aggregate per key every n
    events (event arrival order within the stream). Only *complete*
    blocks are emitted, matching Flink's tumbling count-window.

    State per key: finished-block count + running (count, sum) of the
    open block — O(1) per key.
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        blocks_done, cur_n, cur_sum = (
            state.get if state.exists else (0, 0, 0.0)
        )
        out: list[tuple[int, int, int, float]] = []
        # concat-then-sort: a key's micro-batch may span several Arrow
        # chunks in shuffle-read order; per-chunk sorting would break
        # the arrival sequence when chunks interleave in time.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values(["ts", "event_id"])
            for v in whole["value"].to_numpy():
                cur_n += 1
                cur_sum += float(v)
                if cur_n == n:
                    out.append((key[0], blocks_done, cur_n, round(cur_sum, 2)))
                    blocks_done += 1
                    cur_n, cur_sum = 0, 0.0
        state.update((blocks_done, cur_n, cur_sum))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "block_id", "n_events", "sum_value"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        COUNT_WINDOW_SCHEMA,
        _COUNT_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def cep_click_then_purchase(events: DataFrame, within_us: int = 600_000_000) -> DataFrame:
    """I11: CEP-lite state machine per user — emit (click, purchase) when
    a purchase directly follows a click within ``within_us`` microseconds
    (Flink CEP ``begin('click').next('purchase').within(10 min)``).

    State per key: the pending click (id, ts) or empty — O(1).
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pending_id, pending_ts = state.get if state.exists else (None, None)
        out: list[tuple[int, int, int, int, int]] = []
        # concat-then-sort across chunks — same rationale as count_window
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            ).sort_values(["ts_us", "event_id"])
            for et, eid, ts_us in zip(
                whole["event_type"], whole["event_id"], whole["ts_us"]
            ):
                if et == "click":
                    pending_id, pending_ts = int(eid), int(ts_us)
                    continue
                if (
                    et == "purchase"
                    and pending_id is not None
                    and ts_us - pending_ts <= within_us
                ):
                    out.append((key[0], pending_id, pending_ts, int(eid), int(ts_us)))
                pending_id, pending_ts = None, None
        if pending_id is None:
            state.remove()
        else:
            state.update((pending_id, pending_ts))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "click_id",
                    "click_ts_us",
                    "purchase_id",
                    "purchase_ts_us",
                ],
            )

    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        CEP_SCHEMA,
        _CEP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """I6 streaming form: first event per (user, type) with state bounded
    by the watermark horizon (``dropDuplicatesWithinWatermark`` — the
    100 TB answer to unbounded dedup state)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


EWMA_SCHEMA = "user_id bigint, event_id bigint, ts_us bigint, value double, ewma double"
_EWMA_STATE_SCHEMA = "ewma double"


def streaming_ewma(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """I9 depth: TRUE recursive EWMA as a keyed stateful operator —
    ``y_i = α·x_i + (1-α)·y_{i-1}`` carried across micro-batches in
    per-key ValueState (one double). This is the semantics the batch
    ``q_ts_ewma`` key truncates to an 8-tap FIR; streaming has no
    truncation pressure because the recursion IS the O(1) state.

    Dual-mode: on a stream this is ``applyInPandasWithState`` (Spark
    rejects it on batch inputs); on a batch DataFrame it dispatches to
    a stateless ``applyInPandas`` running the SAME recursion over each
    key's full, sorted history. The equivalence test asserts streamed
    output == batch output == pandas ``ewm(adjust=False)``.

    State: one double per key, updated per event in arrival (ts,
    event_id) order within each micro-batch — rows must arrive
    time-ordered across batches for exact recursion (the test harness
    replays in order; out-of-order production input needs the watermark
    + sort per batch the harness applies)."""

    def _recurse(pdf: pd.DataFrame, prev: float | None):
        pdf = pdf.sort_values(["ts_us", "event_id"])
        vals = pdf["value"].to_numpy(dtype="float64")
        ew = vals.copy()
        for i, x in enumerate(vals):
            prev = x if prev is None else alpha * x + (1.0 - alpha) * prev
            ew[i] = prev
        out = pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "ts_us": pdf["ts_us"].to_numpy(),
                "value": vals,
                "ewma": ew.round(6),
            }
        )
        return out, prev

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (prev,) = state.get if state.exists else (None,)
        # concat-then-sort across Arrow chunks (same rationale as
        # count_window): the recursion must see the whole micro-batch
        # in time order, not per-chunk order.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            out, prev = _recurse(whole, prev)
            yield out
        state.update((prev,))

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _ = _recurse(pdf, None)
        return out

    from pyspark.sql import functions as F

    events = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value", "ts"
    )
    if not events.isStreaming:
        return events.groupBy("user_id").applyInPandas(batch_fn, EWMA_SCHEMA)
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        EWMA_SCHEMA,
        _EWMA_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


TIMEOUT_SCHEMA = "user_id bigint, event_id bigint, ts_us bigint, gap_us bigint"
_TIMEOUT_STATE_SCHEMA = "prev_id bigint, prev_ts_us bigint, prev_is_click boolean"


def timeout_absence(events: DataFrame, within_us: int = 3_600_000_000) -> DataFrame:
    """I11b streaming twin of ``q_pattern_timeout``: emit each click whose
    NEXT event from the same user arrives more than ``within_us`` late
    (abandonment detection — the timer branch of a Flink
    KeyedProcessFunction). State per key is O(1): the previous event's
    (id, ts, was-it-a-click). A click that never sees a successor stays
    pending (the batch analog marks those ``gap_us = -1``); emitting them
    eagerly needs an event-time timer — use :func:`timeout_absence_flush`
    (GroupState EventTimeTimeout, runs on this box) or the
    transformWithStateInPandas variant in streaming/timers.py.

    Within one micro-batch a key's rows may arrive as SEVERAL Arrow
    chunks in shuffle-read order, so the chunks are concatenated and
    sorted ONCE before sequencing (per-chunk sorting would mis-pair
    events when a later chunk holds earlier timestamps). Memory is
    bounded by one key's rows per micro-batch — the same envelope every
    applyInPandasWithState operator has. ACROSS micro-batches the
    watermark must hold back late data (the harness replays in order).
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prev_id, prev_ts, prev_click = (
            state.get if state.exists else (None, None, False)
        )
        out: list[tuple[int, int, int, int]] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            whole = whole.sort_values(["ts_us", "event_id"])
            for et, eid, ts_us in zip(
                whole["event_type"], whole["event_id"], whole["ts_us"]
            ):
                if prev_click and ts_us - prev_ts > within_us:
                    out.append(
                        (key[0], int(prev_id), int(prev_ts), int(ts_us - prev_ts))
                    )
                prev_id, prev_ts, prev_click = int(eid), int(ts_us), et == "click"
        if prev_id is not None:
            state.update((prev_id, prev_ts, prev_click))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "ts_us", "gap_us"]
            )

    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        TIMEOUT_SCHEMA,
        _TIMEOUT_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def timeout_absence_flush(
    events: DataFrame, within_us: int = 3_600_000_000
) -> DataFrame:
    """I11b with REAL event-time timers: same abandonment pattern as
    :func:`timeout_absence`, but a click whose successor never arrives is
    EMITTED (``gap_us = -1``, the batch analog's end-of-stream marker)
    when the watermark passes ``click_ts + within`` — the timer branch of
    a Flink KeyedProcessFunction, here via GroupState
    ``EventTimeTimeout``. Firing also REMOVES the key's state, so idle
    keys are cleaned instead of accumulating forever (the state-TTL gap
    the NoTimeout variant documents).

    Input must carry ``withWatermark("ts", ...)`` — EventTimeTimeout is
    rejected without one. Timer semantics: the timeout timestamp must
    exceed the current watermark, so a pending click older than the
    watermark is scheduled at ``watermark + 1 ms`` (fires in the next
    micro-batch — Spark fires timers in the batch AFTER the watermark
    passes them, including availableNow's trailing no-data batch).

    Emission-time caveat vs the batch analog: once a timer fires, the
    click is reported with ``gap_us = -1`` even if a successor later
    than ``within`` eventually arrives (the batch form reports the true
    gap). That is the Flink-canonical timeout semantic — the alarm
    cannot wait for an unbounded future — and with in-order replay the
    two only differ on clicks still pending at end-of-stream.

    State per key stays O(1); one shuffle on user_id; timer registry is
    one entry per key — the 100 TB envelope is keys, not rows.
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            prev_id, prev_ts, prev_click = state.get
            state.remove()
            if prev_click:
                yield pd.DataFrame(
                    [(key[0], int(prev_id), int(prev_ts), -1)],
                    columns=["user_id", "event_id", "ts_us", "gap_us"],
                )
            return
        prev_id, prev_ts, prev_click = (
            state.get if state.exists else (None, None, False)
        )
        out: list[tuple[int, int, int, int]] = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            whole = whole.sort_values(["ts_us", "event_id"])
            for et, eid, ts_us in zip(
                whole["event_type"], whole["event_id"], whole["ts_us"]
            ):
                if prev_click and ts_us - prev_ts > within_us:
                    out.append(
                        (key[0], int(prev_id), int(prev_ts), int(ts_us - prev_ts))
                    )
                prev_id, prev_ts, prev_click = int(eid), int(ts_us), et == "click"
        if prev_id is not None:
            state.update((prev_id, prev_ts, prev_click))
            if prev_click:
                # Fire when event time passes the click's deadline; a
                # deadline already behind the watermark fires next batch.
                deadline_ms = (prev_ts + within_us) // 1000
                state.setTimeoutTimestamp(
                    max(deadline_ms, state.getCurrentWatermarkMs() + 1)
                )
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "ts_us", "gap_us"]
            )

    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        TIMEOUT_SCHEMA,
        _TIMEOUT_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
