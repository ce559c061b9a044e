"""Custom stateful streaming operator: gap-based sessionization.

The one operator class Structured Streaming's built-in windows can't
express: sessions end after ``gap`` of inactivity, so window bounds
depend on the data. Implemented with ``applyInPandasWithState`` — the
engine's only stateful Python crossing, Arrow-batched per key group.

State per user: (session_start, last_ts, n_events, value_sum). On each
micro-batch the incoming rows for a key are folded in event-time order;
a gap closes the open session (emitted) and starts a new one; timeout
flushes idle sessions. Batch callers get the same semantics through
``sessionize_batch`` (native expressions — window lag + cumulative
session ids), which doubles as the oracle for the streaming path.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "start long, last long, n long, vsum double"


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts",
    user_col: str = "user_id", value_col: str = "value",
) -> DataFrame:
    """Streaming gap sessionization via applyInPandasWithState.

    Emits CLOSED sessions only (a session closes when a later event
    arrives past the gap, or the state times out). Requires a watermark
    on ``ts_col`` upstream for event-time timeout.

    Late-data semantics (standard stateful-streaming contract): events
    below the current watermark are dropped — Spark does not pre-filter
    late rows for this operator, and folding them in would rewind open
    sessions (end < start) or resurrect closed ones. Above-watermark
    stragglers that land inside an open session's span fold into its
    stats without rewinding the session clock. The batch twin sees all
    rows, so stream == batch holds exactly for data delivered in
    watermark order (the equivalence test's shape).

    Value semantics (matched by the batch twin): NULL and NaN values
    contribute 0 to ``value_sum`` (Arrow hands both to pandas as NaN,
    so they are indistinguishable here); NULL-timestamp rows are
    invalid events and are ignored (NaT orders below any watermark).

    The in-state event times are pandas wall-clock micros while the
    watermark is epoch-UTC; they only share a basis because the engine
    pins ``spark.sql.session.timeZone=UTC`` (session.py) — asserted
    here so running the operator under a drifted session config fails
    loudly instead of silently mis-classifying events near the
    watermark by the tz offset."""
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00"):
        raise ValueError(
            f"sessionize_stream requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): the watermark comparison mixes epoch-UTC and "
            f"session-local bases otherwise"
        )
    gap_us = gap_seconds * 1_000_000

    def fold(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            start, last, n, vsum = state.get
        else:
            start = last = None
            n, vsum = 0, 0.0
        closed = []
        if state.hasTimedOut:
            if n:
                closed.append((user, start, last, n, vsum))
            state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values(ts_col)
            # Watermark contract: events below the watermark are DROPPED
            # (standard stateful-streaming semantics — Spark does NOT
            # pre-filter late rows for applyInPandasWithState, so an
            # unfiltered late event would merge backward into a LATER
            # session, rewinding `last` and emitting end < start).
            wm_us = state.getCurrentWatermarkMs() * 1000
            for ts, val in zip(rows[ts_col], rows[value_col]):
                t = int(ts.value // 1000)  # pandas ns -> us
                if t < wm_us:
                    continue  # late beyond watermark: dropped
                if last is not None and t <= last:
                    # above-watermark straggler inside the open session's
                    # span: fold it in without rewinding the session clock
                    start = t if t < start else start
                    n += 1
                    vsum += float(val) if val == val else 0.0
                    continue
                if last is not None and t - last > gap_us:
                    closed.append((user, start, last, n, vsum))
                    start, n, vsum = t, 0, 0.0
                if start is None:
                    start = t
                last = t
                n += 1
                vsum += float(val) if val == val else 0.0
            if last is None:
                # no prior state and every row late-dropped: nothing to
                # track (and nothing can have closed)
                return
            state.update((start, last, n, vsum))
            # Late (below-watermark) events can make last+gap land BEHIND
            # the current watermark — setTimeoutTimestamp then throws
            # INVALID_TIMEOUT_TIMESTAMP and kills the query (hit on
            # multi-batch file replay, where later files carry earlier
            # events). Clamp to just past the watermark: the watermark
            # asserts no earlier data is coming, so the stale session
            # times out on the next batch — the correct semantics.
            timeout_ms = last // 1000 + gap_seconds * 1000
            wm = state.getCurrentWatermarkMs()
            if timeout_ms <= wm:
                timeout_ms = wm + 1
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                    "value_sum": [c[4] for c in closed],
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts",
    user_col: str = "user_id", value_col: str = "value",
) -> DataFrame:
    """Batch twin (and oracle) of the streaming sessionizer: session id
    = cumulative count of gap-exceeding steps per user (lag + running
    sum), then one aggregate per session. All native expressions.

    Gaps compare at MICROSECOND resolution (unix_micros), matching the
    streaming path exactly — a cast('long') comparison truncates to
    whole seconds and can split/merge sessions differently from the
    stream for events with fractional-second spacing near the gap.

    Malformed-row semantics match the stream (see sessionize_stream):
    NULL-timestamp rows are dropped (the stream sees them as NaT below
    any watermark; an unfiltered batch lag() would fold them into the
    user's first session), and NULL/NaN values contribute 0 to
    ``value_sum`` (Arrow collapses both to NaN stream-side)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col(ts_col))
    marked = events.filter(F.col(ts_col).isNotNull()).withColumn(
        "__new",
        F.when(us - F.lag(us).over(w) > gap_seconds * 1_000_000, 1).otherwise(0),
    ).withColumn("__sid", F.sum("__new").over(wrun))
    return marked.groupBy(user_col, "__sid").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(
            F.coalesce(F.nanvl(F.col(value_col), F.lit(0.0)), F.lit(0.0))
        ).alias("value_sum"),
    ).drop("__sid")
