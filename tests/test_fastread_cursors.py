"""Serving fast path: frozen cursors for sub-level / and / isa /
linksto root shapes, mirrored from the compiler (round-5 additions).

Two layers of pinning:

- NO-SPARK chains: a GraphSession constructed without a SparkSession
  pages multi-predicate / expansion reads to exhaustion — proof the
  new cursor forms never touch Spark (the fast path's whole point).
- Two-path parity: the same chains replayed against a compiler-only
  session must produce byte-identical pages, including the frozen
  cursor strings (and-iterator freezes, fixed materializations, isa
  masquerades, prefix bins, resource stamps).

The differential cursor fuzz (tools/diff_campaign.py --cursors) pins
the same chains against the reference binary.
"""

from __future__ import annotations

import re

import pytest

from graphd_spark.api import GraphSession


def _paginate(gs: GraphSession, read: str, max_hops: int = 30) -> list[str]:
    """Page a cursored read to exhaustion; returns all replies."""
    out = [gs.request(read)]
    hops = 0
    while hops < max_hops:
        m = re.search(r'"((?:cursor|sort|position):[^"]*)"', out[-1])
        if not m or m.group(1) == "null:":
            break
        esc = m.group(1).replace("\\", "\\\\").replace('"', '\\"')
        out.append(
            gs.request(
                read.replace(
                    "result=(cursor", f'cursor="{esc}" result=(cursor', 1
                )
            )
        )
        hops += 1
    return out


def _paginate_sub(gs: GraphSession, read: str, opener: str,
                  max_hops: int = 30) -> list[str]:
    """Page a SUB-level cursor chain to exhaustion (cursor= goes on
    the subconstraint, not the root)."""
    out = [gs.request(read)]
    hops = 0
    while hops < max_hops:
        m = re.search(r'"(cursor:[^"]*|null:)"', out[-1])
        if not m or m.group(1) == "null:":
            break
        out.append(
            gs.request(
                read.replace(
                    opener, f'{opener}cursor="{m.group(1)}" ', 1
                )
            )
        )
        hops += 1
    return out


def _seed(gs: GraphSession) -> None:
    # two typed clusters sharing endpoints: multi-index (and-iterator)
    # shapes, single- and plural-source linkage expansions, a word
    # corpus for prefix bins, and an isa-masquerade fan-out
    gs.request('write (name="hub" value="h0")')
    gs.request('write (name="hub" value="h1")')
    for i in range(12):
        gs.request(
            f'write (value="spoke{i}" left->(name="hub" value="h0") '
            f'right->(name="hub" value="h1"))'
        )
    for i in range(8):
        gs.request(f'write (value="alpha w{i}" type="word")')
        gs.request(f'write (value="beta w{i}" type="word")')
    # plural-source linksto: links point at BOTH "target" nodes
    gs.request('write (name="tgt" value="t")')
    gs.request('write (name="tgt" value="t")')
    for i in range(6):
        gs.request(
            f'write (value="ln{i}" '
            f'right->(name="tgt" start=0 pagesize=1))'
        )
    # sub-cursor shapes: a typed fan-out (vip freezes) and a
    # versioned-away spoke (raw producer positions)
    gs.request(
        'write (value="vp" (<-left value="w1" type="tt") '
        '(<-left value="w2" type="uu") (<-left value="w3" type="tt") '
        '(<-left value="w4" type="tt"))'
    )
    r = gs.request('read (value="spoke3" result=((guid)))')
    g = re.search(r"\(\(([0-9a-f]{32})\)\)", r).group(1)
    gs.request(f'write (guid~={g} value="spoke3v2" left=null right=null)')


CHAINS = [
    # and-iterator root: type gmap + left gmap intersect
    'read (pagesize=2 result=(cursor (guid value)) '
    '(<-left name="hub" value="h0") (<-right name="hub" value="h1"))',
    # sub-gmap collapse: single predicate, one pointed-at source
    'read (pagesize=3 result=(cursor (guid value)) '
    '(<-left name="hub" value="h0"))',
    # prefix-bin root: value~="P*" materializes the word-index bins
    'read (pagesize=3 result=(cursor (guid value)) value~="alpha*")',
    # prefix + linkage: and-iterator with a prefix member
    'read (pagesize=2 result=(cursor (guid value)) value~="spoke*" '
    '(<-left name="hub"))',
    # isa expansion (my-side sub): left->(...) root
    'read (pagesize=2 result=(cursor (guid value)) '
    'left->(name="hub" value="h0"))',
    # plural-source linksto
    'read (pagesize=2 result=(cursor (guid value)) '
    '(<-right name="tgt"))',
    # type= root with pagination (gmap member via types)
    'read (pagesize=3 result=(cursor (guid value)) type="word")',
]


#: sub-level cursor chains: (read, sub opener the resume lands on)
SUB_CHAINS = [
    # bare gmap over a raw index with a versioned-away spoke
    ('read (value="h0" result=((value contents)) '
     "(<-left pagesize=3 result=(cursor (guid value))))", "(<-left "),
    # vip: typed sub freezes the (endpoint, typeguid) combined index
    ('read (value="vp" result=((value contents)) '
     '(<-left type="tt" pagesize=1 result=(cursor (guid value))))',
     "(<-left "),
    # fixed: hmap-prefix member pre-evaluated per parent
    ('read (value="vp" result=((value contents)) '
     '(<-left value~="w*" pagesize=2 result=(cursor (guid value))))',
     "(<-left "),
    # fixed over the other endpoint, raw positions past the version
    ('read (value="h1" result=((value contents)) '
     '(<-right value~="spoke*" pagesize=2 '
     "result=(cursor (guid value))))", "(<-right "),
    # multiple parents, pinned resume
    ('read (pagesize=2 result=((value contents)) name="hub" '
     "(<-left pagesize=2 result=(cursor (guid value))))", "(<-left "),
    # or-branch sub cursor: the winning branch freezes its iterator
    ('read (value="h0" result=((value contents)) '
     "{ (<-left pagesize=2 result=(cursor (guid value))) | "
     "(<-right pagesize=2 result=(cursor (guid value))) })",
     "(<-left "),
]


def test_cursor_chains_need_no_spark(monkeypatch):
    """Every chain pages to exhaustion with NO SparkSession at all."""
    gs = GraphSession()
    # GraphSession lazily builds a SparkSession on fallback — forbid
    # it so any fast-path miss fails loudly instead of silently
    # compiling through Spark

    def _no_spark(self):
        raise AssertionError("fast path fell back to Spark")

    monkeypatch.setattr(GraphSession, "_require_spark", _no_spark)
    _seed(gs)
    for read in CHAINS:
        pages = _paginate(gs, read)
        assert pages, read
        assert not any("error SYSTEM" in p for p in pages), (read, pages)
        # the chain must terminate (exhausted cursor or no cursor)
        last = pages[-1]
        m = re.search(r'"((?:cursor|sort|position):[^"]*)"', last)
        assert m is None or m.group(1) == "null:", (read, last)
    for read, opener in SUB_CHAINS:
        pages = _paginate_sub(gs, read, opener)
        assert pages, read
        assert not any("error SYSTEM" in p for p in pages), (read, pages)
        last = pages[-1]
        m = re.search(r'"((?:cursor|sort|position):[^"]*)"', last)
        assert m is None or m.group(1) == "null:", (read, last)


@pytest.fixture(scope="module")
def sessions(spark):
    fast = GraphSession(spark)
    _seed(fast)
    slow = GraphSession(spark)
    slow.fast_read_enabled = False
    _seed(slow)
    return fast, slow


@pytest.mark.parametrize("q", CHAINS)
def test_cursor_chain_parity(sessions, q):
    """Pages AND frozen cursor strings byte-identical on both paths."""
    fast, slow = sessions
    assert _paginate(fast, q) == _paginate(slow, q)


@pytest.mark.parametrize("qi", range(len(SUB_CHAINS)))
def test_sub_cursor_chain_parity(sessions, qi):
    """Sub-level cursor chains: the compiler builds its per-parent
    producer sets through the same FastReader index helper, so both
    paths freeze byte-identical gmap/vip/fixed sub cursors."""
    fast, slow = sessions
    q, opener = SUB_CHAINS[qi]
    assert _paginate_sub(fast, q, opener) == _paginate_sub(slow, q, opener)


def test_corrupt_unmodeled_cursor_rejected():
    """The signed envelope validates BEFORE the body form is
    considered: a corrupted body with a recognized prefix must fail
    BADCURSOR (ref graphd_constraint_cursor_thaw; cursor fuzz seed
    1210), while the untouched cursor still resumes."""
    gs = GraphSession()
    gs.request('write (value="p" (<-left value="c1") (<-left value="c2"))')
    q = ('read (value="p" result=((value contents)) '
         "(<-left pagesize=1 result=(cursor (value))))")
    r = gs.request(q)
    cur = re.search(r'"(cursor:[^"]*)"', r).group(1)
    ok = gs.request(q.replace("(<-left ", f'(<-left cursor="{cur}" ', 1))
    assert ok.startswith("ok ")
    bad = gs.request(
        q.replace("(<-left ", f'(<-left cursor="{cur}x" ', 1)
    )
    assert bad.startswith("error BADCURSOR"), bad
