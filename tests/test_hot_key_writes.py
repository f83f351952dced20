"""Hot-key write lookups are bounded (VERDICT r3 item 5).

A unique=/key= write whose value is shared by 10^5 primitives must not
collect the whole hot bin to the driver: the store's point lookups
collect at most POINT_LOOKUP_BOUND rows per Spark collect (streaming
beyond that), and the write matcher short-circuits at its first match.
"""

from __future__ import annotations

import pytest

from graphd_spark.api import GraphSession
from graphd_spark.store import ParquetLogStore, PrimitiveStore

N_HOT = 100_000


def _concrete_df_cls(spark):
    return type(spark.range(1))


@pytest.fixture(scope="module")
def hot_log(spark, tmp_path_factory):
    """A parquet log with 10^5 primitives sharing one value, built
    driver-side once and written as a single parquet file."""
    log = str(tmp_path_factory.mktemp("hotlog"))
    mem = PrimitiveStore()
    for i in range(N_HOT):
        mem.append(value="hot", name=f"n{i}")
    mem.append(value="cold", name="solo")
    mem.commit()
    mem.save_parquet(spark, log, partitions=8)
    return log


def _spy(spark, monkeypatch, sizes):
    cls = _concrete_df_cls(spark)
    orig = cls.collect

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(cls, "collect", spy)


def test_unique_write_hot_value_bounded(spark, hot_log, monkeypatch):
    gs = GraphSession.attach(spark, hot_log)
    assert gs.store.count() == N_HOT + 1
    sizes = []
    _spy(spark, monkeypatch, sizes)
    reply = gs.request('write (value="hot" unique=value)')
    assert "EXISTS" in reply or "unique" in reply
    assert sizes, "write did not consult Spark"
    assert max(sizes) <= ParquetLogStore.POINT_LOOKUP_BOUND + 1, sizes


def test_key_write_hot_value_bounded(spark, hot_log, monkeypatch):
    gs = GraphSession.attach(spark, hot_log)
    sizes = []
    _spy(spark, monkeypatch, sizes)
    # key=value: collides with the first hot primitive -> reuse, no
    # new id burned beyond the reuse semantics; the lookup must stay
    # bounded either way
    reply = gs.request('write (value="hot" key=value)')
    assert reply.startswith("ok (")
    assert max(sizes) <= ParquetLogStore.POINT_LOOKUP_BOUND + 1, sizes


def test_store_find_hot_value_streams(spark, hot_log, monkeypatch):
    """Exhausting the full hot bin goes through streaming, never one
    big collect."""
    gs = GraphSession.attach(spark, hot_log)
    sizes = []
    _spy(spark, monkeypatch, sizes)
    n = sum(1 for _ in gs.store.find_by_value("hot"))
    assert n == N_HOT
    assert max(sizes) <= ParquetLogStore.POINT_LOOKUP_BOUND + 1, sizes
