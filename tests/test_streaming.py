"""Replication as Structured Streaming: the replica drains the
primary's append-only Parquet log, preserving ids, txstart markers and
datelines (SURVEY.md §2.11; ref doc/gr-replication.txt)."""

from __future__ import annotations

import os

import pytest

from graphd_spark.api import GraphSession
from graphd_spark.model import PREDICTABLE_DB_ID, guid_compose
from graphd_spark.streaming import (
    dateline_of,
    run_replica,
    with_transaction_marker,
)


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "log"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "sink"),
    )


def test_replica_stream_end_to_end(spark, dirs):
    log, ckpt, sink = dirs
    gs = GraphSession(spark)
    gs.request('write (name="a" value="1")')
    gs.request('write (name="b" value="2" (<-left name="c"))')
    horizon = gs.store.append_parquet(spark, log)
    assert horizon == 3

    q = run_replica(spark, log, ckpt, sink)
    q.awaitTermination(120)
    replicated = spark.read.parquet(sink)
    assert replicated.count() == 3
    ids = sorted(r["id"] for r in replicated.select("id").collect())
    assert ids == [0, 1, 2]
    # txstart marks each write transaction's first primitive
    starts = sorted(
        r["id"] for r in replicated.filter("txstart").collect()
    )
    assert starts == [0, 1]
    # the dateline after the batch is the next unwritten id's GUID
    assert dateline_of(replicated, PREDICTABLE_DB_ID) == guid_compose(
        PREDICTABLE_DB_ID, 3
    )

    # the primary commits more; the replica resumes from its
    # checkpoint and drains only the new file
    gs.request('write (name="d")')
    gs.store.append_parquet(spark, log, since_id=horizon)
    q2 = run_replica(spark, log, ckpt, sink)
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 4


def test_transaction_marker(spark, dirs):
    log, _ckpt, _sink = dirs
    gs = GraphSession(spark)
    gs.request('write (name="a" (<-left name="b") (<-left name="c"))')
    gs.request('write (name="d")')
    gs.store.append_parquet(spark, log)
    batch = spark.read.parquet(log)
    tagged = with_transaction_marker(batch)
    rows = {r["id"]: r["tx_seq"] for r in tagged.collect()}
    assert rows == {0: 1, 1: 1, 2: 1, 3: 2}
