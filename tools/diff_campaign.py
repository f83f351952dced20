"""Extended differential campaign: replay many seeded random scripts
through both the reference binary and this engine, report divergences.

Usage: python tools/diff_campaign.py [start] [end] [--cursors]

Reuses the generators and runners from tests/test_differential.py; this
is the wide-net version of the 24-seed pytest campaign — run it when
touching comparator/cursor/write semantics.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_differential import (  # noqa: E402
    _ensure_binary,
    gen_script,
    run_engine,
    run_reference,
)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    start = int(args[0]) if args else 24
    end = int(args[1]) if len(args) > 1 else start + 100

    if _ensure_binary() is None:
        print("reference binary unavailable")
        return 1

    from graphd_spark.session import get_spark

    spark = get_spark("diff_campaign")
    bad = []
    for seed in range(start, end):
        lines = gen_script(seed)
        want = run_reference(lines)
        got = run_engine(spark, lines)
        if got != want:
            bad.append(seed)
            print(f"== seed {seed} DIVERGES ==")
            for ln in lines:
                print("  " + ln)
            for g, w in zip(got, want):
                if g != w:
                    print(f"  got: {g}\n  exp: {w}")
            if len(got) != len(want):
                print(f"  (lines: got {len(got)}, exp {len(want)})")
        elif seed % 10 == 0:
            print(f"seed {seed} ok")
    print(f"done: {end - start} seeds, {len(bad)} divergent: {bad}")
    return 0 if not bad else 2


if __name__ == "__main__":
    raise SystemExit(main())
