"""Distributed restore: executor-side tuple parsing + join-resolved
version chains must reproduce the driver-side store byte-for-byte."""

from __future__ import annotations

from graphd_spark.api import GraphSession
from graphd_spark.dump import _tuple_value, bulk_restore
from graphd_spark.values import render


def _dump_lines(session) -> list[str]:
    return [
        render(_tuple_value(session, p))
        for p in session.store.iter_all()
    ]


def test_bulk_restore_round_trip(spark):
    gs = GraphSession(spark)
    # a store with types (bootstrap), links, versions, and a tombstone
    gs.request('write ("color" value="red" name="apple")')
    gs.request('write ("color" value="blue" (<-left value="navy"))')
    first = gs.request('write (value="v one")').split("(")[1].rstrip(")")
    second = gs.request(f'write (guid~={first} value="v two")')
    second = second.split("(")[1].rstrip(")")
    gs.request(f'write (guid~={second} value="v three")')
    gs.request('write (value="doomed" live=false)')
    gs.request('write (value="back\\\\slash \\"quoted\\"")')

    lines = _dump_lines(gs)
    assert len(lines) == gs.store.count()
    ldf = spark.createDataFrame([(ln,) for ln in lines], "value string")
    restored = bulk_restore(spark, ldf, gs.store.db_id)

    want = [tuple(r) for r in gs.store.to_df(spark).orderBy("id").collect()]
    got = [tuple(r) for r in restored.orderBy("id").collect()]
    assert got == want


def test_bulk_restore_deep_chain(spark):
    gs = GraphSession(spark)
    g = gs.request('write (value="gen0")').split("(")[1].rstrip(")")
    for i in range(1, 7):
        g = gs.request(f'write (guid~={g} value="gen{i}")').split(
            "("
        )[1].rstrip(")")
    ldf = spark.createDataFrame(
        [(ln,) for ln in _dump_lines(gs)], "value string"
    )
    restored = bulk_restore(spark, ldf, gs.store.db_id)
    rows = {r["guid"]: r for r in restored.collect()}
    assert len(rows) == 7
    gens = sorted(r["generation"] for r in rows.values())
    assert gens == list(range(7))
    lineages = {r["lineage"] for r in rows.values()}
    assert len(lineages) == 1  # one chain, one lineage head
