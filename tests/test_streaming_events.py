"""Event-time streaming operators vs their batch equivalents.

Replays the sf0.001 events table into a stream directory in several
micro-batches (files), runs the watermarked window aggregation and the
stateful sessionizer, and checks the results against the batch
formulations that are oracle-verified elsewhere (events_window_agg,
events_sessionize).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from graphd_spark import streaming_events
from graphd_spark.session import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def event_batches(spark, tmp_path):
    """The events table split into 3 parquet files by event_id range —
    in-order replay (late data within a batch is still unordered by
    user, which the operators must tolerate)."""
    events = load_tables(spark, SF)["events"].select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    rows = events.count()
    stream_dir = str(tmp_path / "stream")
    cut1, cut2 = rows // 3, 2 * rows // 3
    for i, (lo, hi) in enumerate(
        [(0, cut1), (cut1, cut2), (cut2, rows + 1)]
    ):
        (
            events.filter(
                (F.col("event_id") >= lo) & (F.col("event_id") < hi)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(stream_dir)
        )
    return events, stream_dir


def _run_stream(spark, df, name, tmp_path, timeout=120):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            str(tmp_path / f"ckpt_{name}_{time.time_ns()}"),
        )
        .start()
    )
    q.awaitTermination(timeout)
    return spark.table(name)


def test_windowed_counts_match_batch(spark, event_batches, tmp_path):
    events, stream_dir = event_batches
    stream = streaming_events.events_stream(
        spark, stream_dir, streaming_events.EVENTS_SCHEMA
    )
    got = _run_stream(
        spark, streaming_events.windowed_counts(stream), "win_counts", tmp_path
    ).collect()

    want = (
        events.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
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
        .collect()
    )

    # availableNow drains every batch, then the final watermark flush
    # emits all closed windows; the last (still-open) window per group
    # may be withheld — so streaming results must be a prefix-subset
    # of batch with identical values where emitted
    want_map = {
        (r.window_start, r.event_type): (r.n, r.total_value) for r in want
    }
    got_map = {
        (r.window_start, r.event_type): (r.n, r.total_value) for r in got
    }
    assert set(got_map) <= set(want_map)
    for k, v in got_map.items():
        assert v == want_map[k], k
    # every window strictly older than the watermark must have been
    # emitted: check we saw at least all but the final hour per type
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    for k, v in want_map.items():
        start, _ = k
        if (max_ts - start).total_seconds() > 2 * 3600:
            assert k in got_map, f"closed window missing: {k}"


def test_sessionize_stream_matches_batch_closed_sessions(
    spark, event_batches, tmp_path
):
    events, stream_dir = event_batches
    stream = streaming_events.events_stream(
        spark, stream_dir, streaming_events.EVENTS_SCHEMA
    )
    got = _run_stream(
        spark, streaming_events.sessionize_stream(stream), "sessions", tmp_path
    ).collect()

    # batch truth (same semantics as inventory_events.events_sessionize)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    sess = (
        events.withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn(
            "seq",
            F.sum("new_sess").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    )
    want_closed = {
        (r.user_id, r.session_start): (
            r.session_end,
            r.n_events,
            r.total_value,
        )
        for r in sess
    }
    got_map = {
        (r.user_id, r.session_start): (
            r.session_end,
            r.n_events,
            r.total_value,
        )
        for r in got
    }
    # the stream emits only CLOSED sessions (each user's last session
    # stays in state); everything emitted must match batch exactly
    assert got_map, "stream emitted no sessions"
    for k, v in got_map.items():
        assert k in want_closed, f"spurious session {k}"
        assert v == want_closed[k], (k, v, want_closed[k])
    # at most one session per user may be withheld
    import collections

    want_per_user = collections.Counter(u for u, _ in want_closed)
    got_per_user = collections.Counter(u for u, _ in got_map)
    for u, n in want_per_user.items():
        assert got_per_user.get(u, 0) >= n - 1, (
            f"user {u}: {got_per_user.get(u, 0)} of {n} sessions emitted"
        )


# ---------------------------------------------------------------------------
# _sessionize_fn unit tests: cross-batch late data and null values.
# These drive the state function directly (no streaming query) so each
# micro-batch boundary is exactly where the test puts it.
# ---------------------------------------------------------------------------


class _FakeState:
    """Minimal GroupState stand-in for driving _sessionize_fn."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def _batch(events):
    """events: list of (ts_minutes, event_id, value)."""
    import pandas as pd

    return pd.DataFrame(
        {
            "event_id": [e for _, e, _ in events],
            "ts": [pd.Timestamp(m * 60_000_000_000) for m, _, _ in events],
            "user_id": [7] * len(events),
            "value": [v for _, _, v in events],
        }
    )


def _feed_batches(state, *batches):
    import pandas as pd

    out = []
    for b in batches:
        for pdf in streaming_events._sessionize_fn((7,), [b], state):
            out.extend(pdf.to_dict("records"))
    return out


def test_sessionize_late_event_does_not_move_session_end_backwards():
    """A late event inside the open session's reach must fold in with
    min/max bounds; the old code set session_end backwards, which then
    spuriously split the session on the next gap check."""
    state = _FakeState()
    out = _feed_batches(
        state,
        _batch([(0, 1, 1.0), (10, 2, 1.0)]),   # open session [0, 10min]
        _batch([(5, 3, 1.0)]),                  # LATE: within reach
        _batch([(35, 4, 1.0)]),                 # 25min after e=10 — same session
    )
    assert out == []  # nothing closed yet: 35 - 10 = 25min < 30min gap
    s, e, n, c = state.get
    assert (s, e, n) == (0, 35 * 60_000_000, 4)

    # now a gap closes it: the emitted session spans [0, 35min], 4 events
    out = _feed_batches(state, _batch([(90, 5, 2.5)]))
    assert len(out) == 1
    sess = out[0]
    assert sess["n_events"] == 4
    assert sess["total_value"] == 4.0
    assert sess["session_start"].value == 0
    assert sess["session_end"].value == 35 * 60_000_000_000


def test_sessionize_too_late_event_is_dropped():
    """An event older than start - gap cannot belong to the open
    session (its own session may already be emitted): dropped."""
    state = _FakeState()
    _feed_batches(state, _batch([(100, 1, 1.0)]))
    _feed_batches(state, _batch([(10, 2, 9.0)]))  # 90min before start
    s, e, n, c = state.get
    assert n == 1 and c == 100  # untouched by the dropped event
    assert s == e == 100 * 60_000_000


def test_sessionize_null_value_contributes_zero():
    """A NULL value must not kill the query (old code raised on the
    NaN->int64 cast); it contributes 0, matching batch sum() semantics."""
    state = _FakeState()
    out = _feed_batches(
        state,
        _batch([(0, 1, 1.5), (1, 2, None)]),
        _batch([(90, 3, 1.0)]),  # closes [0, 1min]
    )
    assert len(out) == 1
    assert out[0]["n_events"] == 2
    assert out[0]["total_value"] == 1.5
