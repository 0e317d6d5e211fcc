"""Timer-based keyed processor via ``transformWithStateInPandas``
(SURVEY.md §2.I9 — the full Spark 4.x analog of Flink's
``KeyedProcessFunction`` + ``ValueState`` + event-time timers).

Operator: per-user inactivity sessionizer. Every event (re)arms an
event-time timer ``gap`` past the event; when the watermark passes the
timer, the session closes and one summary row is emitted — exactly the
Flink quickstart "session via process function" exercise. State per key
is O(1): (session_start_us, last_ts_us, n_events, sum_value).

Differences from ``session_window`` (I3): this emits on TIMER EXPIRY
(watermark-driven, incremental) rather than on query-managed window
merge, and the state/timers surface is user-visible — the point of the
demonstration.

ENVIRONMENT DEPENDENCY: transformWithStateInPandas speaks protobuf to its
state server; the ``protobuf`` package is a deploy-time requirement (not
present in this container — the test suite skips accordingly; offline
availability re-checked r10 (2026-08-15) and r11 (2026-08-16: the only
protobuf on disk is pyspark's vendored module stubs, no wheel, PyPI
DNS unresolvable, and the environment contract forbids installs). The
equivalent operators on ``applyInPandasWithState`` (streaming/stateful.py)
have no such dependency and are fully tested here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

SESSION_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, sum_value double"
)


def tws_available() -> bool:
    """True when the transformWithStateInPandas runtime deps exist."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class InactivitySessionizer(StatefulProcessor):
    """Close a per-key session when no event arrives for ``gap_ms``."""

    def __init__(self, gap_ms: int = 300_000):
        self.gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.sess = handle.getValueState(
            "sess", "start_us bigint, last_us bigint, n bigint, s double"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        start_us, last_us, n, s = (
            self.sess.get() if self.sess.exists() else (None, None, 0, 0.0)
        )
        for pdf in rows:
            for ts_us, v in zip(pdf["ts_us"], pdf["value"]):
                ts_us = int(ts_us)
                if start_us is None:
                    start_us = ts_us
                last_us = ts_us if last_us is None else max(last_us, ts_us)
                n += 1
                s += float(v)
        self.sess.update((start_us, last_us, n, s))
        # (Re)arm: expire when event time passes last event + gap.
        for t in list(self.handle.listTimers()):
            self.handle.deleteTimer(t)
        self.handle.registerTimer(last_us // 1000 + self.gap_ms)
        return iter(())

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self.sess.exists():
            return iter(())
        start_us, last_us, n, s = self.sess.get()
        self.sess.clear()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start_us": [start_us],
                "session_end_us": [last_us + self.gap_ms * 1000],
                "n_events": [n],
                "sum_value": [round(s, 2)],
            }
        )

    def close(self) -> None:
        pass


def inactivity_sessions(
    events: DataFrame, gap: str = "5 minutes", gap_ms: int = 300_000
) -> DataFrame:
    """Wire the sessionizer: watermarked event-time input, timers in
    event-time mode. Emits closed sessions as the watermark advances.

    The processor CLASS must pickle by value: the streaming Python driver
    worker is a fresh process whose sys.path does not include this
    package, so a by-reference pickle dies with ModuleNotFoundError.
    """
    import sys

    from pyspark import cloudpickle

    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(install protobuf at deploy time); the otherwise-equivalent "
            "applyInPandasWithState operators in streaming/stateful.py "
            "have no such dependency"
        )
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    prepared = events.withWatermark("ts", gap).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value", "ts"
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=InactivitySessionizer(gap_ms=gap_ms),
        outputStructType=SESSION_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
