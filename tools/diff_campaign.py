"""Extended differential campaign: replay many seeded random scripts
through both the reference binary and this engine, report divergences.

Usage: python tools/diff_campaign.py [start] [end]
           [--cursors | --sortcursors | --versions | --roundtrip
            | --replica | --orchains | --writes | --writepaged
            | --writeinto]

--roundtrip: writes -> dump -> restore into a fresh store -> reads,
  compared against the reference binary (payload byte-equality,
  post-restore reads, and cross-restore of the reference's dump).
--replica: engine-only master/replica catch-up parity (the reference's
  replica protocol needs TCP daemons).

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
    REF_BIN,
    _ensure_binary,
    _gen_cursor_constraint,
    _gen_write,
    gen_cursor_reads,
    gen_cursor_writes,
    check_replica_seed,
    check_roundtrip_seed,
    check_writeasof_seed,
    check_writeinto_seed,
    check_writepaged_seed,
    gen_or_script,
    gen_roundtrip,
    gen_script,
    gen_sortcursor_reads,
    gen_write_script,
    gen_version_script,
    run_engine,
    run_reference,
)


def _run_cursor_seed(
    spark, seed: int, sorted_pages: bool = False
) -> tuple[list[str], list[str], list[str]]:
    """One cursored-pagination seed through both engines (the logic of
    tests/test_differential.py::test_differential_cursors); with
    ``sorted_pages`` the reads come from gen_sortcursor_reads (sort
    keys x comparators x page sizes, paged to exhaustion)."""
    import re as _re
    import select
    import subprocess
    import tempfile

    rng = random.Random((20_000 if sorted_pages else 10_000) + seed)
    lines, burst = gen_cursor_writes(rng)
    if sorted_pages:
        reads = gen_sortcursor_reads(rng, burst)
    else:
        reads = gen_cursor_reads(rng, burst)

    def paginate(ask):
        out = []
        for read in reads:
            reply = ask(read)
            out.append(reply)
            hops = 0
            while hops < 5:
                m = _re.search(r'"((?:cursor|sort|position):[^"]*)"', reply)
                if not m or m.group(1) == "null:":
                    break
                esc = m.group(1).replace("\\", "\\\\").replace('"', '\\"')
                reply = ask(
                    read.replace(
                        "result=(cursor", f'cursor="{esc}" result=(cursor', 1
                    )
                )
                out.append(reply)
                hops += 1
        return out

    with tempfile.TemporaryDirectory(prefix="gdref_") as db:
        proc = subprocess.Popen(
            [REF_BIN, "-d", os.path.join(db, "db"), "-bty"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, bufsize=1, cwd=db,
        )

        def ask_ref(req):
            proc.stdin.write(req + "\n")
            proc.stdin.flush()
            ready, _, _ = select.select([proc.stdout], [], [], 30)
            if not ready:
                raise TimeoutError(req)
            return proc.stdout.readline().rstrip("\n")

        try:
            [ask_ref(ln) for ln in lines]
            ref_pages = paginate(ask_ref)
        finally:
            proc.stdin.close()
            proc.wait(timeout=30)

    from graphd_spark.api import GraphSession

    gs = GraphSession(spark)
    for ln in lines:
        gs.request(ln)
    got_pages = paginate(gs.request)
    return lines + reads, got_pages, ref_pages


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cursors = "--cursors" in sys.argv
    versions = "--versions" in sys.argv
    roundtrip = "--roundtrip" in sys.argv
    replica = "--replica" in sys.argv
    writepaged = "--writepaged" in sys.argv
    writeinto = "--writeinto" in sys.argv
    writeasof = "--writeasof" in sys.argv
    orchains = "--orchains" in sys.argv
    writes = "--writes" in sys.argv
    sortcursors = "--sortcursors" in sys.argv
    start = int(args[0]) if args else 24
    end = int(args[1]) if len(args) > 1 else start + 100

    if not replica and _ensure_binary() is None:
        print("reference binary unavailable")
        return 1

    from graphd_spark.session import get_spark

    spark = get_spark("diff_campaign")
    bad = []
    for seed in range(start, end):
        if roundtrip or replica or writepaged or writeinto or writeasof:
            problems = (
                check_roundtrip_seed(spark, seed)
                if roundtrip
                else check_writepaged_seed(spark, seed)
                if writepaged
                else check_writeinto_seed(spark, seed)
                if writeinto
                else check_writeasof_seed(spark, seed)
                if writeasof
                else check_replica_seed(spark, seed)
            )
            if problems:
                bad.append(seed)
                print(f"== seed {seed} DIVERGES ==")
                for pr in problems:
                    print("  " + pr.replace("\n", "\n  "))
            elif seed % 10 == 0:
                print(f"seed {seed} ok")
            continue
        if cursors or sortcursors:
            lines, got, want = _run_cursor_seed(
                spark, seed, sorted_pages=sortcursors
            )
        else:
            if versions:
                lines = gen_version_script(seed)
            elif orchains:
                lines = gen_or_script(seed)
            elif writes:
                lines = gen_write_script(seed)
            else:
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
