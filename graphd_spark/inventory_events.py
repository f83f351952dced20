"""Event-stream analytics operators: as-of join, sessionization.

These extend the pipeline inventory (see ``inventory_pipeline``) with
the two event-table shapes every large-scale telemetry / training-data
pipeline needs and that Spark has no single built-in operator for:

- **as-of join** — each left event matched to the most recent earlier
  right event with the same key.  The naive formulation is an
  inequality (range) join, which Spark executes as a broadcast
  nested-loop or sort-merge over an exploded range — O(n*m) per key.
  The scale-safe formulation used here is the union-window trick:
  tag the two streams, union them, and carry the right stream's
  attributes forward with ``last(..., ignorenulls=True)`` over one
  per-key window.  One shuffle on the key, zero joins, linear work.

- **sessionization** — gap-based session ids as a running sum of
  boundary flags over one per-key window, then a per-session rollup.
  This is the batch formulation of Structured Streaming's session
  windows (``F.session_window`` on a stream); on static data the
  window+rollup form is one shuffle and keeps event order available.

Both have exact DuckDB oracles (DuckDB ships a native ASOF JOIN, which
cross-checks our union-window reformulation against an independent
implementation of the semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from graphd_spark.inventory import q, _t
from graphd_spark.jexpr import _c, _l

# session gap: events further apart than this start a new session
_GAP_US = 1_800_000_000  # 30 min in microseconds


def _us(col):
    """Microseconds-since-epoch of a timestamp column.  The driver's
    events.parquet carries TIMESTAMP(NANOS), which Spark reads as
    TIMESTAMP_NTZ; the session timezone is pinned to UTC (session.py)
    so the cast to TIMESTAMP is an identity on the instant."""
    return F.unix_micros(col.cast("timestamp"))


@q(
    "events_asof_join",
    """
    WITH views AS (
      SELECT user_id, ts, event_id
      FROM events WHERE event_type = 'view'
      QUALIFY row_number()
        OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id AS click_id,
           c.user_id,
           c.ts AS click_ts,
           v.event_id AS view_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM clicks c
    ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click paired with the user's latest view at or
    before the click's timestamp.

    Implemented as the union-window trick (see module docstring): both
    streams shuffle ONCE on ``user_id``; the window's running
    ``last(..., ignorenulls=True)`` carries the most recent view's id
    and timestamp forward onto every later click row.  No range join,
    no per-key blowup — a key with v views and c clicks costs
    O(v + c), not O(v * c).  Ties are deterministic: at equal
    timestamps views sort before clicks (``src`` tag) so an
    equal-``ts`` view matches, and among equal-``ts`` views the
    highest ``event_id`` wins (mirrored in the oracle's QUALIFY).
    """
    (events,) = _t(spark, sf_dir, "events")
    ev = events.filter(_c("event_type").isin("view", "click")).select(
        "event_id",
        "user_id",
        "ts",
        # views sort before clicks at the same timestamp: ASOF is >=
        F.when(_c("event_type") == "view", _l(0))
        .otherwise(_l(1))
        .alias("src"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_view = _c("src") == 0
    carried = ev.select(
        "event_id",
        "user_id",
        "ts",
        "src",
        F.last(F.when(is_view, _c("event_id")), ignorenulls=True)
        .over(w)
        .alias("view_id"),
        F.last(F.when(is_view, _c("ts")), ignorenulls=True)
        .over(w)
        .alias("view_ts"),
    )
    return carried.filter(_c("src") == 1).select(
        _c("event_id").alias("click_id"),
        "user_id",
        _c("ts").alias("click_ts"),
        "view_id",
        (_us(_c("ts")) - _us(_c("view_ts"))).alias(
            "gap_us"
        ),
    )


@q(
    "events_sessionize",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tagged AS (
      SELECT *, CAST(sum(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM flagged)
    SELECT user_id,
           session_seq,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM tagged
    GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >30-min quiet gap starts a new
    session; one row per (user, session) with bounds and totals.

    One shuffle on ``user_id`` serves both the boundary-flag window and
    the running session counter; the rollup then groups on
    (user_id, session_seq), a strict refinement of the window's
    partitioning, so AQE coalesces rather than reshuffles.  The value
    total goes through decimal(18,2) so partial-aggregation order on a
    cluster can't wiggle the last ulp (same convention as
    ``inventory._money_sum``).  Streaming analog:
    ``F.session_window(events.ts, "30 minutes")`` with a watermark —
    semantics identical, state bounded by the gap.
    """
    (events,) = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _us(_c("ts")) - _us(F.lag("ts").over(w))
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            gap_us.isNull() | (gap_us > _GAP_US), _l(1)
        )
        .otherwise(_l(0))
        .alias("new_sess"),
    )
    tagged = flagged.withColumn(
        "session_seq",
        F.sum("new_sess").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return tagged.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(_c("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )
