"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState``.

Demonstrates the engine's stateful lane (the reference is batch-only;
this is the Spark-native surface a continuous ingestion deployment needs):
events stream in per user, state carries the open session (start, last
event time, count), a processing-time timeout flushes idle sessions.

The same session semantics exist as a batch window query
(``__spark_entry__.q_user_sessions``: lag + gap > 30 min) so the stateful
path is cross-checkable against the relational one.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("closed", T.BooleanType(), False),
    ]
)

# state: (start_epoch, last_epoch, n_events)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_epoch", T.DoubleType(), False),
        T.StructField("last_epoch", T.DoubleType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)


def _rows_to_frame(rows) -> pd.DataFrame:
    out = pd.DataFrame(
        rows,
        columns=["user_id", "session_start", "session_end", "n_events", "closed"],
    )
    # epoch floats → µs-resolution timestamps (Arrow's timestamp[us] —
    # ns residue from float math would fail the safe cast)
    for col in ("session_start", "session_end"):
        out[col] = pd.to_datetime(
            (out[col] * 1e6).round().astype("int64"), unit="us"
        )
    return out


def _sessionize(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = []
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            rows.append((user_id, start, last, n, True))
            state.remove()
        yield _rows_to_frame(rows)
        return

    ts = pd.concat([b["ts"] for b in batches]).sort_values()
    epochs = ts.astype("int64") / 1e9
    if state.exists:
        start, last, n = state.get
    else:
        start = last = float(epochs.iloc[0])
        n = 0

    for e in epochs:
        e = float(e)
        if e - last > SESSION_GAP_SECONDS:
            rows.append((user_id, start, last, n, True))
            start = e
            n = 0
        last = max(last, e)
        n += 1

    state.update((start, last, n))
    state.setTimeoutDuration(60 * 1000)
    yield _rows_to_frame(rows + [(user_id, start, last, n, False)])


def compact_sessions(session_rows: DataFrame) -> DataFrame:
    """Compact append-mode session emissions: each microbatch re-emits the
    open-session snapshot, so the read-side keeps, per (user_id,
    session_start), the latest snapshot — a closed row wins over any open
    snapshot, otherwise the largest n_events (most recent)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id", "session_start")
        .orderBy(F.desc("closed"), F.desc("n_events"), F.desc("session_end"))
    )
    return (
        session_rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events (streaming, with ts + user_id) → session rows.  Closed
    sessions are final; the trailing open session per user updates as new
    events arrive."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
