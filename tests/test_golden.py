"""Reference golden tests replayed through GraphSession.

Each listed name replays /root/reference/test/unit/NAME.sh through the
engine and diffs every reply line against NAME.out.exp — write-path
GUID/timestamp assignment, the read compiler, sorting, result shaping
and error replies all have to line up byte-for-byte.
"""

from __future__ import annotations

import pytest

from graphd_spark.api import GraphSession

from golden import run_golden

GOLDENS = [
    "100x100",
    "anchor",
    "anchor2",
    "anchor3",
    "anchor4",
    "asof",
    "atleast",
    "bigkey",
    "bootstrap",
    "compare2",
    "countabunch",
    "count2",
    "datatype",
    "dump",
    "false",
    "guid",
    "keyburn",
    "keyburn3",
    "keyburn4",
    "keyburn5",
    "keyburn6",
    "numbermatch",
    "octet",
    "optional",
    "or",
    "or4",
    "pagesize",
    "previous",
    "sort1",
    "sort2",
    "sort4",
    "sort5",
    "sort6",
    "sort7",
    "sort8",
    "sort9",
    "sort10",
    "spacematch",
    "start",
    "substring2",
    "substring3",
    "timestamp",
    "twovars",
    "unique1",
    "unique2",
    "unique3",
    "unique4",
    "unique6",
    "uniquecluster",
    "valuetype",
    "varor",
    "vars",
    "varsort",
    "version1",
    "version2",
    "version3",
    "version4",
    "version5",
    "version7",
]


@pytest.mark.parametrize("name", GOLDENS)
def test_golden(spark, name):
    result = run_golden(lambda: GraphSession(spark), name)
    if result is None:
        pytest.skip(f"{name}.sh shape unsupported by harness")
    got, expected = result
    assert got == expected, "\n".join(
        f"line {i}:\n  got:      {g}\n  expected: {e}"
        for i, (g, e) in enumerate(zip(got, expected))
        if g != e
    ) + f"\n(lines: got {len(got)}, expected {len(expected)})"
