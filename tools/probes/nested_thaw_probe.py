"""Probe: depth-2 nested sorted-cursor freezes in the reference binary.

Builds cluster stores of varying shapes, issues a depth-2 read
(root -> mid -> sorted leaf with cursor), prints the raw replies so
the leaf iterator freeze (vrange bounds / producer choice) can be
mapped against store layout.  Usage: python nested_thaw_probe.py
"""
import os
import subprocess
import sys
import tempfile

REF_BIN = os.environ.get("GRAPHD_REF_BIN", "/tmp/graphd_ref_build/graphd")


def run_reference(lines):
    with tempfile.TemporaryDirectory(prefix="gdref_") as db:
        proc = subprocess.run(
            [REF_BIN, "-d", os.path.join(db, "db"), "-bty"],
            input="\n".join(lines) + "\n",
            capture_output=True, text=True, timeout=120,
        )
    return [ln for ln in proc.stdout.splitlines() if ln]


def scenario(n_parents, n_mids, n_leaves, extra_rows=0, leaf_sort="value"):
    """parents p<i>; mids m<i>_<j> left-> p<i>; leaves l... left-> mid."""
    writes = []
    for i in range(n_parents):
        parts = [f'(<-left value="m{i}_{j}"' +
                 " ".join("") +
                 "".join(
                     f' (<-left value="v{k:02d}_{i}_{j}")'
                     for k in range(n_leaves)
                 ) + ")"
                 for j in range(n_mids)]
        writes.append(f'write (value="p{i}" ' + " ".join(parts) + ")")
    for e in range(extra_rows):
        writes.append(f'write (value="x{e}")')
    read = (
        f'read (value="p0" result=((value contents)) '
        f'(<-left value~="m*" result=((value contents)) '
        f'(<-left sort={leaf_sort} pagesize=1 result=(cursor (value)))))'
    )
    return writes, read


def main():
    shapes = [
        ("tiny 1p 2m 3l", *scenario(1, 2, 3)),
        ("tiny+pad 1p 2m 3l +20", *scenario(1, 2, 3, extra_rows=20)),
        ("wide 1p 4m 4l", *scenario(1, 4, 4)),
        ("multi 3p 2m 3l", *scenario(3, 2, 3)),
        ("big 1p 2m 12l", *scenario(1, 2, 12)),
        ("name sort", *scenario(1, 2, 3, leaf_sort="name")),
    ]
    for label, writes, read in shapes:
        out = run_reference(writes + [read])
        print("=" * 70)
        print(label)
        print("READ:", read)
        print("REPLY:", out[-1] if out else "(none)")


if __name__ == "__main__":
    main()
