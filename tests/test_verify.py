"""The verify command: store/index consistency as a Spark assertion
job (ref graphd/graphd-verify.c, libpdb/pdb-verify.c)."""

from __future__ import annotations

from graphd_spark.api import GraphSession


def test_verify_clean_store(spark):
    gs = GraphSession(spark)
    gs.request('write (value="a" (<-left value="b"))')
    g = gs.request('write (value="v1")').split("(")[1].rstrip(")")
    gs.request(f'write (guid~={g} value="v2")')
    assert gs.request("verify ()") == "ok (0)"


def test_verify_reports_corruption(spark):
    gs = GraphSession(spark)
    gs.request('write (value="ok")')
    # corrupt the driver mirror: a primitive whose guid serial doesn't
    # match its id and whose lineage head doesn't exist
    from graphd_spark.model import guid_compose

    p = gs.store.append(value="broken", guid=guid_compose(0x123456, 999))
    p.lineage = guid_compose(0x123456, 500)
    gs.store.commit()
    reply = gs.request("verify ()")
    assert reply.startswith("ok (2 ") or reply.startswith("ok (3 ")
    assert "guid/id mismatch" in reply
    assert "missing lineage head" in reply


def test_sync_echoes_advancing_horizon(spark):
    """sync-response = "ok" horizon (doc/gr-protocol.txt:1440-1456,
    graphd-sync.c:65-68); the horizon advances across writes."""
    gs = GraphSession(spark)
    assert gs.request("sync ()") == "ok 0"
    gs.request('write (value="a")')
    h1 = int(gs.request("sync ()").split()[1])
    assert h1 >= 1
    gs.request('write (value="b" (<-left value="c"))')
    h2 = int(gs.request("sync ()").split()[1])
    assert h2 >= h1 + 2
    # id= modifier keeps its place in the reply
    assert gs.request('sync id="s1" ()') == f'ok id="s1" {h2}'
