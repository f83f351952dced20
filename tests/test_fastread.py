"""Serving fast path (fastread.py): parity with the Spark compiler.

Two GraphSessions share one store; every query in the matrix runs
through BOTH paths and the protocol replies must be byte-identical.
The matrix covers the supported subset (equalities, globs, linkage
subs, counts, versioning, pagination) AND bail-out shapes (ranges,
sorts, cursors) — the latter prove the fallback is seamless.

The golden suite and the differential fuzz campaigns also pin the two
paths: they drive GraphSession.request with the fast path enabled.
"""

from __future__ import annotations

import pytest

from graphd_spark.api import GraphSession


def _seed(gs: GraphSession) -> None:
    for i in range(6):
        gs.request(
            f'write (name="nation" value="N{i}" '
            f'(<-left name="in-region" '
            f'right->(name="region" value="R{i % 2}")))'
        )
    gs.request('write (value="Loose Ends" name="song")')
    gs.request('write (value="12")')
    gs.request('write (value=" 12")')
    gs.request('write (live=false value="dead")')
    # a version chain + tombstone
    g = gs.request('write (value="v0")').split("(")[1].rstrip(")")
    gs.request(f'write (guid~={g} value="v1")')
    gs.request(f'write (guid~={g} value="v2" live=false)')
    gs.request('write (name="empty-node")')
    gs.request('write (value="" name="empty-str")')
    gs.request('write (valuetype=2 name="null-str")')


QUERIES = [
    # point lookups
    'read (name="nation" value="N3" result=((value)))',
    'read (value="12" result=((guid value)))',
    'read (value=" 12" result=((guid value)))',  # fuzzy-eq, norm differs
    'read (value="n3" result=((value)))',        # case-insensitive
    'read (any pagesize=5 result=((guid name value)))',
    'read (any start=3 pagesize=4 result=((guid)))',
    # linkage
    'read (name="nation" value="N1" result=((value)) '
    '(<-left name="in-region" right->(name="region" result=((value)))))',
    'read (name="region" value="R0" result=((value contents)) '
    '(<-right name="in-region"))',
    'read (name="nation" (<-left count=0) result=((value)))',
    'read (name="region" (<-right atleast=2) result=((value)))',
    'read (name="region" result=((value (<-right result=count))))',
    # counts / bounds
    'read (name="nation" result=(count))',
    'read (name="nation" count=6 result=(count))',
    'read (name="nation" count=5 result=(count))',      # EMPTY
    'read (name="nobody" result=((value)))',            # EMPTY
    'read (name="nation" countlimit=3 result=(count))',
    'read (name="nation" pagesize=2 result=((value) count))',
    # globs + null probes
    'read (value~="N*" pagesize=20 result=((value)))',
    'read (value~="*nds" result=((value)))',
    'read (name="empty-node" value=null result=((guid)))',
    'read (name!=null pagesize=30 result=((name)))',
    'read (value!="N1" name="nation" result=((value)))',
    # versioning
    'read (live=dontcare newest=0 value="v2" result=((guid value live)))',
    'read (live=dontcare oldest=0 value="v0" result=((guid generation)))',
    'read (live=false pagesize=10 result=((value)))',
    'read (any live=dontcare newest>=0 pagesize=40 result=((guid value)))',
    # type system
    'read (name="song" result=((value type datatype timestamp)))',
    # ranges (value-bin scan order emulation) + sorts
    'read (value>"A" pagesize=8 result=((value)))',
    'read (value<="n4" pagesize=30 result=((value)))',
    'read (value>="a" value<"z" pagesize=30 result=((value)))',
    'read (name="nation" value<="N3" result=((value)))',
    'read (value>="1" comparator="number" pagesize=20 result=((value)))',
    'read (sort=(value) pagesize=6 result=((value)))',
    'read (sort=(-value) pagesize=6 result=((value)))',
    'read (sort=(name -timestamp) pagesize=8 result=((name value)))',
    'read (sort=(value) sort-comparator="case" pagesize=6 result=((value)))',
    # number-comparator value sorts: NUMBERS-binset drop + escapes
    'read (sort=(value) sort-comparator="number" pagesize=20 '
    "result=((value)))",
    'read (name="song" sort=(value) sort-comparator="number" '
    "result=((value)))",           # 1-element name bin short-circuits
    'read (name="nation" sort=(value) sort-comparator="number" '
    "result=((value)))",           # multi-element bin: drop applies
    'read (sort=(value) sort-comparator="number" result=(count))',
    'read (value>="1" comparator="number" sort=(value) '
    'sort-comparator="number" pagesize=20 result=((value)))',
    'read (value>"A" sort=(value) sort-comparator="number" '
    "pagesize=20 result=((value)))",  # string vrange stays producer
    'read (name="song" timestamp>1970-01-01T00:00:00.0000Z '
    'sort=(value) sort-comparator="number" result=((value)))',
    'read (name="region" sort=(-value) result=((value contents)) '
    '(<-right sort=(-timestamp) pagesize=2))',
    'read (sort=(guid) start=2 pagesize=3 result=((guid)))',
    # value="": stored-empty AND null-value datatype-2 both match
    'read (value="" pagesize=10 result=((guid name value datatype)))',
    # asof time travel + datelines (id-horizon mirrors)
    'read asof=1970-01-01T00:00:00.0005 (value!=null pagesize=40 '
    "result=((guid value)))",
    'read asof=1970-01-01T00:00:00.0030 (live=dontcare value="v0" '
    "result=((guid value live)))",
    'read (dateline>"123456.5" pagesize=30 result=((guid)))',
    'read (dateline<"123456.8" pagesize=30 result=((guid)))',
    # fallback shapes (Unsupported -> Spark path; replies must still
    # be identical — the fast session falls back seamlessly)
    'read (sort=$v $v=value pagesize=4 result=((value)))',
    'read (name="nation" pagesize=2 result=(cursor (value)))',
]


@pytest.fixture(scope="module")
def sessions(spark):
    fast = GraphSession(spark)
    _seed(fast)
    slow = GraphSession(spark)
    slow.fast_read_enabled = False
    _seed(slow)
    return fast, slow


@pytest.mark.parametrize("q", QUERIES)
def test_fast_path_matches_spark_path(sessions, q):
    fast, slow = sessions
    assert fast.request(q) == slow.request(q)


def test_fast_path_needs_no_spark():
    """The serving path must work with NO SparkSession at all."""
    gs = GraphSession()  # no spark
    for i in range(4):
        gs.request(f'write (name="n" value="x{i}")')
    assert gs.request('read (name="n" value="x2" result=((value)))') == (
        'ok (("x2"))'
    )


def test_eval_cache_key_respects_string_boundaries():
    """A value literal containing 'cursor=' must not collapse onto
    another query's cache key (round-5 advice: the old raw-text regex
    matched `cursor="` INSIDE a string literal, so the poisoned query
    below cached under the victim's key and served its rows)."""
    gs = GraphSession()  # no spark: pure fast path
    gs.request('write (value="acursor=" name="n1")')
    assert gs.request(
        'read (value="acursor=" name="n1" result=((value)))'
    ) == 'ok (("acursor="))'
    # under the regex key this stripped to value="an1" ... == the line
    # below, so the next request hit the poisoned entry and answered ok
    r = gs.request('read (value="an1" result=((value)))')
    assert r.startswith("error EMPTY")


def test_eval_cache_hit_does_not_alias_plan():
    """Cache hits must not serve a plan object mutated by an earlier
    request (cursor/countlimit are per-request state)."""
    gs = GraphSession()
    for i in range(8):
        gs.request(f'write (name="p" value="c{i}")')
    q = 'read (name="p" pagesize=3 result=(cursor (value)))'
    first = gs.request(q)
    # replay the identical first-page request: same reply, byte-exact
    # (a stale plan.cursor from the first run would leak otherwise)
    assert gs.request(q) == first


def test_fast_path_engages(spark, monkeypatch):
    """A supported read on a covered store must NOT touch Spark."""
    from graphd_spark import fastread

    gs = GraphSession(spark)
    gs.request('write (name="a" value="b")')
    called = {}
    orig = fastread.FastReader.run

    def spy(self, con):
        called["fast"] = True
        return orig(self, con)

    monkeypatch.setattr(fastread.FastReader, "run", spy)
    assert gs.request('read (name="a" result=((value)))') == 'ok (("b"))'
    assert called.get("fast")


def test_hydrated_parquet_store_serves_fast(spark, tmp_path):
    """attach + hydrate flips an on-disk log into the serving path."""
    from graphd_spark.store import ParquetLogStore

    log = str(tmp_path / "log")
    writer = GraphSession(spark, log_path=log)
    for i in range(10):
        writer.request(f'write (name="w" value="v{i}")')

    reader = GraphSession.attach(spark, log)
    assert not getattr(reader.store, "_covers_all")
    assert reader.store.hydrate()
    assert reader.store._covers_all
    # served driver-side now; replies still byte-identical
    want = writer.request('read (name="w" value="v7" result=((guid value)))')
    assert reader.request(
        'read (name="w" value="v7" result=((guid value)))'
    ) == want
    # writes after hydration keep flushing to the shared log
    r = reader.request('write (name="w" value="after")')
    assert r.startswith("ok (")
    assert writer.request(
        'read (value="after" result=((value)))'
    ) == 'ok (("after"))'


def test_dir_sig_cache_never_hides_foreign_appends(spark, tmp_path):
    """mirror_current's stat-signature cache (store.py): steady-state
    serving skips the per-request listdir, but a foreign append —
    even one landing immediately after a cached probe — is absorbed
    on the very next request, because a changed directory signature
    always forces the listdir and a hot directory (mtime younger
    than the 1 s guard) is never cached at all."""
    import os

    log = str(tmp_path / "log")
    writer = GraphSession(spark, log_path=log)
    writer.request('write (name="w" value="v0")')

    reader = GraphSession.attach(spark, log)
    assert reader.store.hydrate()
    # age the directory mtime past the cache guard so the signature
    # is cacheable without sleeping
    st = os.stat(log)
    os.utime(log, ns=(st.st_atime_ns - 5_000_000_000,
                      st.st_mtime_ns - 5_000_000_000))
    assert reader.request(
        'read (value="v0" result=((value)))'
    ) == 'ok (("v0"))'
    assert reader.store._dir_sig_cache is not None  # cache engaged
    sig0 = reader.store._dir_sig_cache[0]
    # repeated serving hits the cache (signature unchanged)
    assert reader.request(
        'read (value="v0" result=((value)))'
    ) == 'ok (("v0"))'
    assert reader.store._dir_sig_cache[0] == sig0
    # foreign append: the new commit file changes the signature, so
    # the reader's next request re-listdirs and absorbs the delta
    writer.request('write (name="w" value="v1")')
    assert reader.request(
        'read (value="v1" result=((value)))'
    ) == 'ok (("v1"))'
    # the fresh append keeps the directory "hot": no stale signature
    # may be cached until the mtime ages past the guard again
    c = reader.store._dir_sig_cache
    assert c is None or c[0] != sig0


def test_versioned_link_target_dangles(spark):
    """Traversal joins on RAW guids (probed against the reference
    binary, roundtrip seeds 47/93/95/103): versioning a link TARGET
    makes right->(...) dangle until a constraint lifts the newest
    filter; right=<old> matches, right=<new> doesn't, right~=<new>
    lineage-expands.  Checked through BOTH read paths."""
    for enabled in (True, False):
        gs = GraphSession(spark)
        gs.fast_read_enabled = enabled
        t = gs.request('write (value="target")').split("(")[1].rstrip(")")
        t2 = gs.request(f'write (guid~={t} value="target2")')
        t2 = t2.split("(")[1].rstrip(")")
        gs.request(f'write (value="c" right={t})')
        # stored pointer reads back raw
        assert gs.request('read (value="c" result=((right)))') == (
            f"ok (({t}))"
        )
        # traversal to the newest generation: dangles
        assert "EMPTY" in gs.request(
            'read (right->(value="target2") result=((value)))'
        )
        # lifting the newest filter reaches the pointed generation
        assert gs.request(
            'read (right->(value="target" newest>=0 live=dontcare) '
            "result=((value)))"
        ) == 'ok (("c"))'
        # reverse orientation dangles the same way
        assert "EMPTY" in gs.request(
            'read (value="target2" (<-right) result=((value)))'
        )
        # explicit guid constraints: raw for =, lineage-expanded for ~=
        assert gs.request(
            f"read (right={t} result=((value)))"
        ) == 'ok (("c"))'
        assert "EMPTY" in gs.request(f"read (right={t2} result=((value)))")
        assert gs.request(
            f"read (right~={t2} result=((value)))"
        ) == 'ok (("c"))'


OR_QUERIES = [
    'read (any value=("N1" "N3") result=((value)))',
    'read ({value="N1"} | {value="N2"} result=((value)))',
    'read ({value="N1" live=true} | {name="song"} result=((value name)))',
    'read ({value~="N*"} | {value="12"} pagesize=20 result=((value)))',
    'read (name="nation" {value="N1"} || {value="N2"} result=((value)))',
    # or-branches WITH subconstraints and bindings
    'read (name="nation" {(<-left name="in-region")} | {value="N9"} '
    "result=((value)))",
    'read (name="nation" {(<-left $t=name)} | {value="N9" $t=value} '
    "result=((value $t)))",
    'read ({(<-left count=2)} | {name="region"} pagesize=20 '
    "result=((value name)))",
    'read (name="region" sort=$v {(<-right $v=value)} | {$v=name} '
    "result=((value $v)))",
    # contents slots from or-branch subs (parse order, first-match
    # fills, null elsewhere; probed against the reference binary)
    'read ({name="nation" (<-left result=((value)))} | {name="region"} '
    "result=((value contents)))",
    'read ({name="region" (<-right result=(count))} | '
    '{name="nation" (<-left result=((name)))} pagesize=4 '
    "result=((value contents)))",
    'read ((<-left result=((name))) {value="R0" (<-right)} | '
    '{name="nation"} pagesize=4 result=((value contents)))',
    'read ({name="nation" (<-left count=0)} | {name="region"} '
    "pagesize=4 result=((value contents)))",
    # mixed-kind merged variables ($t=guid | $t=value)
    'read ({name="nation" (<-left $t=guid)} | {name="region" $t=value} '
    "pagesize=6 result=((value $t)))",
    # root assignment wins over branch bindings
    'read ($t=name {name="nation" $t=value} | {name="region"} '
    "pagesize=4 result=((value $t)))",
    # nested-twice assignment errors (identical on both paths)
    'read ((<-left $t=value) $t=name result=((value $t)))',
    'read ({name="nation" (<-left $t=value) $t=name} | {name="region"} '
    "result=((value $t)))",
]


@pytest.mark.parametrize("q", OR_QUERIES)
def test_or_chain_parity(sessions, q):
    fast, slow = sessions
    assert fast.request(q) == slow.request(q)


VAR_QUERIES = [
    'read (name="nation" $v=value result=(($v)))',
    'read (name="nation" value="N2" result=(($v value)) '
    '(<-left $v=value))',
    'read (name="region" sort=$v result=((value $v)) (<-right $v=value))',
    'read (name="region" result=(($c value)) (<-right $c=((value))))',
    'read (name="region" sort=-$n result=((value $n)) '
    '(<-right $n=count))',
    'read (any $g=guid $t=timestamp pagesize=4 result=(($g $t)))',
]


@pytest.mark.parametrize("q", VAR_QUERIES)
def test_variable_parity(sessions, q):
    fast, slow = sessions
    assert fast.request(q) == slow.request(q)


@pytest.mark.parametrize("seed", [2000, 2001, 2002, 2003])
def test_two_path_generator_sweep(spark, seed):
    """The differential script generator replayed through BOTH read
    paths on one shared write sequence — fast-path shapes and
    fallback shapes must answer identically."""
    from tests.test_differential import gen_script

    lines = gen_script(seed)
    fast = GraphSession(spark)
    slow = GraphSession(spark)
    slow.fast_read_enabled = False
    for ln in lines:
        a, b = fast.request(ln), slow.request(ln)
        assert a == b, f"{ln}\n fast: {a}\n slow: {b}"


def test_vrange_value_beyond_rules():
    """Unit pins for the comparator value_in_range port that drives
    the sorter's window exit (graphd-comparator-default.c:2031-2196,
    graphd-comparator-number.c:424-485; round-7 catch at sortcursor
    fuzz seed 111).  True = the producer's scan position is past
    every value that could still sort <= the cutoff."""
    from graphd_spark.binset import STRING_BINS
    from graphd_spark.comparators import (
        string_bin_order,
        number_scan_order,
        vrange_value_beyond,
    )

    b = string_bin_order
    # numeric cutoff: done only when the previous bin's start string
    # is alphabetic ('bfirst >= A') — "1e2"'s previous bin starts
    # with a digit, "yes no"'s with a letter (the seed-111 pair)
    assert not vrange_value_beyond("12.0", b("1e2"), "default")
    assert vrange_value_beyond("12.0", b("yes no"), "default")
    # alpha cutoff: the alpha-prefix test string (non-alpha boundary
    # increments the last char) against the previous bin's start
    assert vrange_value_beyond("apple", b("zebra"), "default")
    assert not vrange_value_beyond("zebra", b("apple"), "default")
    # bin 0 / past-the-end: never done
    assert not vrange_value_beyond("a", 0, "default")
    assert not vrange_value_beyond("a", len(STRING_BINS), "default")
    # null cutoff never reaches the verdict
    assert not vrange_value_beyond(None, b("x"), "default")
    # number comparator: numeric compare against the previous
    # NUMBER_BINS boundary
    assert vrange_value_beyond("5", number_scan_order("1e6"), "number")
    assert not vrange_value_beyond(
        "1e6", number_scan_order("5"), "number"
    )
    # backward default walk: done when the truncated alpha prefix
    # still sorts >= the NEXT bin's start
    assert vrange_value_beyond("zebra", b("apple"), "default", True)
    assert not vrange_value_beyond("apple", b("zebra"), "default", True)
