"""Dev tool: sweep many reference goldens, report pass/fail summary.

Usage: python tests/golden_sweep.py [name ...]   (default: a wide list)
Prints one line per golden: PASS / DIFF n / SKIP / ERROR, then details
for the first few diffs with GRAPHD_SWEEP_DETAIL=name.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from golden import run_golden  # noqa: E402

WIDE = [
    "sort4", "or", "countabunch", "atleast", "vars", "twovars", "varsort",
    "sort1", "sort2", "sort3", "sort5", "sort6", "sort7", "sort8", "sort9",
    "sort10", "or2", "or4", "varor", "version1", "version2", "version3",
    "previous", "pagesize", "start", "isa1", "meta", "linkage", "optional",
    "count", "count2", "countlimit", "guid", "null", "archival", "live",
    "false", "valuetype", "datatype", "timestamp", "asof", "newest",
    "oldest", "contents", "result", "resultpagesize", "substring1",
    "substring2", "substring3", "spacematch", "compare1", "compare2",
    "numberequal", "numbermatch", "datetime", "octet", "anchor", "unique1",
    "keyburn1", "100x100", "bootstrap",
]


def main(names):
    from graphd_spark.session import get_spark
    from graphd_spark.api import GraphSession

    spark = get_spark("golden_sweep", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "8")))
    detail = os.environ.get("GRAPHD_SWEEP_DETAIL")
    passed = failed = skipped = errored = 0
    for name in names:
        if not os.path.exists(
            f"/root/reference/test/unit/{name}.sh"
        ):
            print(f"{name:20s} MISSING")
            continue
        try:
            result = run_golden(lambda: GraphSession(spark), name)
        except Exception as e:  # noqa: BLE001
            print(f"{name:20s} ERROR {type(e).__name__}: {e}")
            errored += 1
            continue
        if result is None:
            print(f"{name:20s} SKIP (script shape)")
            skipped += 1
            continue
        got, exp = result
        diffs = [
            (i, g, e)
            for i, (g, e) in enumerate(zip(got, exp))
            if g != e
        ]
        if len(got) != len(exp):
            diffs.append((-1, f"{len(got)} lines", f"{len(exp)} lines"))
        if not diffs:
            print(f"{name:20s} PASS ({len(got)} lines)")
            passed += 1
        else:
            print(f"{name:20s} DIFF {len(diffs)}/{len(exp)}")
            failed += 1
            if detail in (name, "all"):
                for i, g, e in diffs[:10]:
                    print(f"  [{i}] got: {g}")
                    print(f"      exp: {e}")
    print(
        f"\n{passed} pass, {failed} diff, {skipped} skip, {errored} error"
    )


if __name__ == "__main__":
    main(sys.argv[1:] or WIDE)
