"""Event-time streaming operators: watermarked windows, stateful sessions.

The reference predates stream processing (its only stream is
replication — see ``streaming.py``), but a training-data pipeline
ingesting events at 100 TB scale needs the two canonical Structured
Streaming shapes:

- **watermarked windowed aggregation** — tumbling event-time windows
  with a lateness bound; late rows inside the watermark still update
  their window, older ones are dropped and the window state is
  evicted.  All JVM-side (`F.window` + `withWatermark`): state size is
  bounded by (windows in flight x group cardinality).

- **custom stateful operator** (``applyInPandasWithState``) — gap-based
  sessionization with explicit per-key state and a processing-time
  timeout, the streaming analog of ``inventory_events.events_sessionize``.
  State per key is O(1) (current session bounds + running totals), so
  a 1000-executor job holds exactly one small struct per active user.

Batch equivalents of both live in ``inventory`` / ``inventory_events``
(events_window_agg, events_sessionize) where they are oracle-checked;
the tests in tests/test_streaming_events.py assert the streaming path
converges to the batch answer on replayed micro-batches.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def events_stream(spark: SparkSession, log_dir: str, schema: StructType) -> DataFrame:
    """File-based event stream: each new parquet file in ``log_dir`` is
    a micro-batch (same pattern as the replica stream)."""
    return spark.readStream.schema(schema).parquet(log_dir)


def windowed_counts(events: DataFrame, lateness: str = "30 minutes") -> DataFrame:
    """Tumbling 1-hour event-time windows with a lateness watermark.

    The watermark bounds state: a window closes (and its state is
    evicted) once the event-time high-water mark passes window_end +
    lateness; rows arriving later than that are dropped — the
    documented trade every streaming pipeline makes.  Counts and sums
    are partial-aggregated map-side within each micro-batch.
    """
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", lateness)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# 30-minute session gap (same constant as inventory_events)
_GAP_US = 1_800_000_000

_SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# persistent per-user state: the open session (bounds in epoch-us to
# keep the state schema primitive) + running aggregates
_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
    ]
)


def _sessionize_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable["pandas.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pandas.DataFrame"]:  # noqa: F821
    """Per-user session tracker.

    Emits every CLOSED session; the open one stays in state until a
    later batch (or the processing-time timeout) closes it.  Value
    totals accumulate as integer cents — deterministic under any batch
    split, matching the batch path's decimal(18,2) summation.

    Late-data contract: an event whose time falls within the open
    session's reach (>= start - gap) is folded in with min/max bounds;
    one older than that is dropped (its session may already have been
    emitted — O(1) state cannot reopen it).  Events for an
    already-CLOSED-and-emitted session are likewise lost to the stream;
    the batch operator remains the exact formulation.
    """
    import pandas as pd

    (user_id,) = key

    if state.hasTimedOut:
        if state.exists:
            s, e, n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(s, unit="us")],
                    "session_end": [pd.Timestamp(e, unit="us")],
                    "n_events": [n],
                    "total_value": [cents / 100.0],
                }
            )
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    # rows within a batch can arrive unordered: order by event time
    rows = rows.sort_values(["ts", "event_id"])
    ts_us = rows["ts"].astype("int64") // 1000
    # null values contribute 0, matching the batch path's sum() which
    # skips nulls (a NaN would otherwise fail the int64 conversion and
    # kill the whole streaming query)
    cents = (rows["value"].fillna(0.0) * 100).round().astype("int64")

    if state.exists:
        s, e, n, c = state.get
    else:
        s = e = n = c = None

    out_s, out_e, out_n, out_v = [], [], [], []
    for t_us, cent in zip(ts_us.tolist(), cents.tolist()):
        if s is None:
            s, e, n, c = t_us, t_us, 1, cent
        elif t_us - e > _GAP_US:
            out_s.append(s)
            out_e.append(e)
            out_n.append(n)
            out_v.append(c / 100.0)
            s, e, n, c = t_us, t_us, 1, cent
        elif t_us < s - _GAP_US:
            # cross-batch late data older than the open session's
            # reach: with O(1) state the earlier session it belonged
            # to is unrecoverable, so it is DROPPED — the same trade a
            # watermark makes.  (Batches are sorted, so only the case
            # where a whole later batch predates the open session
            # lands here.)
            continue
        else:
            # extend: min/max, not assignment — a late event inside
            # the session's reach must never move session_end
            # backwards (that would corrupt later gap checks)
            s, e, n, c = min(s, t_us), max(e, t_us), n + 1, c + cent
    state.update((s, e, n, c))
    # close the open session if no event arrives for 2x the gap
    state.setTimeoutDuration(2 * _GAP_US // 1000)

    if out_s:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_s),
                "session_start": [pd.Timestamp(v, unit="us") for v in out_s],
                "session_end": [pd.Timestamp(v, unit="us") for v in out_e],
                "n_events": out_n,
                "total_value": out_v,
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator.

    ``applyInPandasWithState`` keys the stream by user; Spark feeds each
    key's new rows (Arrow batches) plus its persisted state to
    ``_sessionize_fn`` every micro-batch.  Closed sessions are emitted
    downstream; the single open session per user rides in the state
    store, evicted by a processing-time timeout at 2x the session gap.
    """
    prepared = events.select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "value",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=_SESSION_OUTPUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
