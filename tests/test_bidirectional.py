"""'<->' bidirectional linkage (engine extension; the reference
documents the syntax in doc/gr-model.txt:176-181 but never shipped
it).  A '<->' sub matches a link touching its parent from EITHER
endpoint; the compile is an exploded two-key equi-join."""

from __future__ import annotations

import pytest

from graphd_spark.api import GraphSession


@pytest.fixture()
def friends(spark):
    gs = GraphSession(spark)
    guids = {}
    for v in ("a", "b", "c"):
        guids[v] = gs.request(f'write (value="{v}")').split("(")[
            1
        ].rstrip(")")
    gs.request(
        f'write (value="ab" left={guids["a"]} right={guids["b"]})'
    )
    return gs


def test_matches_from_either_end(friends):
    assert friends.request(
        'read (value="a" result=((value)) (<-> value="ab"))'
    ) == 'ok (("a"))'
    assert friends.request(
        'read (value="b" result=((value)) (<-> value="ab"))'
    ) == 'ok (("b"))'
    assert friends.request(
        'read (value="c" result=((value)) (<-> value="ab"))'
    ).startswith("error EMPTY")


def test_undirected_scan(friends):
    assert friends.request(
        'read (pagesize=8 result=((value)) (<->))'
    ) == 'ok (("a") ("b"))'


def test_contents_show_the_link(friends):
    reply = friends.request(
        'read (value="a" result=((value contents)) (<-> result=((value))))'
    )
    assert reply == 'ok (("a" (("ab"))))'


def test_anti_join(friends):
    # count=0: nodes with NO link touching them
    assert friends.request(
        'read (pagesize=8 result=((value)) (<-> count=0))'
    ) == 'ok (("c") ("ab"))'


def test_write_rejected(friends):
    assert friends.request(
        'write (value="x" (<-> value="y"))'
    ).startswith("error SEMANTICS")


def test_bi_sub_cursor_pages_to_exhaustion(spark):
    """A cursor inside a <-> sub pages each endpoint link once and
    terminates (the bidirectional explode once duplicated ids in the
    frozen fixed set, pinning the position forever).  Engine
    extension: the reference binary rejects `<->` outright
    (gr-model.txt:180 mentions the syntax, the parser never
    implemented it), so this is engine-only behavior."""
    import re

    from graphd_spark.api import GraphSession

    gs = GraphSession(spark)
    gs.request('write (value="a")')
    gs.request('write (value="b")')
    gs.request(
        'write (value="ab1" left=00000012400034568000000000000000 '
        "right=00000012400034568000000000000001)"
    )
    gs.request(
        'write (value="ab2" left=00000012400034568000000000000001 '
        "right=00000012400034568000000000000000)"
    )
    gs.request(
        'write (value="ab3" left=00000012400034568000000000000000)'
    )
    q = ('read (value="a" result=((value contents)) '
         "(<-> pagesize=1 result=(cursor (value))))")
    seen = []
    r = gs.request(q)
    for _ in range(6):
        seen.append(re.search(r'\("(\w+)"\)', r).group(1))
        m = re.search(r'"(cursor:[^"]*|null:)"', r)
        if not m or m.group(1) == "null:":
            break
        r = gs.request(
            q.replace("(<-> ", '(<-> cursor="%s" ' % m.group(1), 1)
        )
    assert seen == ["ab1", "ab2", "ab3"]
