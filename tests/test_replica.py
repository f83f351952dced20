"""Replica protocol: replica / replica-write requests end-to-end.

A master session takes writes; a replica announces itself with
``replica (version=1 start-id=N)`` (reply "rok", ref
graphd-request-output.c:1502), pulls the catch-up feed, and applies it
with ``replica-write`` — after which both stores answer reads
identically.  Overlapping batches (the master restarts 256 primitives
early, graphd-replica.c:1137) verify-and-skip instead of duplicating.
"""

from __future__ import annotations

from graphd_spark.api import GraphSession


def test_replica_announce_and_catch_up(spark):
    master = GraphSession(spark)
    for v in ("one", "two", "three"):
        master.request(f'write (value="{v}" name="n-{v}")')

    reply = master.request("replica (version=1 start-id=0)")
    assert reply == 'rok ("1" "")'

    replica = GraphSession(spark)
    for line in master.replica_feed(0):
        r = replica.request(line)
        assert r == "ok", r

    want = master.request("read (any result=((guid name value)))")
    assert replica.request("read (any result=((guid name value)))") == want

    # an overlapping re-send (master backs up) must not duplicate
    for line in master.replica_feed(0):
        assert replica.request(line) == "ok"
    assert replica.request("read (any result=((guid name value)))") == want


def test_replica_validation(spark):
    master = GraphSession(spark)
    master.request('write (value="x")')
    assert "missing version" in master.request("replica (start-id=0)")
    assert "version not supported" in master.request(
        "replica (version=2 start-id=0)"
    )
    assert "cannot start replication" in master.request(
        "replica (version=1 start-id=99)"
    )
    # check-master parses and is accepted
    assert master.request(
        "replica (version=1 start-id=1 check-master)"
    ).startswith("rok")


def test_replica_write_continues_sequence(spark):
    master = GraphSession(spark)
    master.request('write (value="a")')
    master.request('write (value="b")')
    replica = GraphSession(spark)
    for line in master.replica_feed(0):
        assert replica.request(line) == "ok"
    # the replica continues the id sequence after catch-up
    r = replica.request('write (value="local")')
    assert r.startswith("ok (")
    g = r.split("(")[1].rstrip(")")
    assert g.endswith("2")  # serial 2 after two replicated primitives
