"""Hunt the vrange-bounded freeze forms in nested sorted subs."""
import os, re, subprocess, tempfile

REF_BIN = os.environ.get("GRAPHD_REF_BIN", "/tmp/graphd_ref_build/graphd")

def run(lines):
    with tempfile.TemporaryDirectory(prefix="gdref_") as db:
        proc = subprocess.run(
            [REF_BIN, "-d", os.path.join(db, "db"), "-bty"],
            input="\n".join(lines) + "\n",
            capture_output=True, text=True, timeout=120)
    return [ln for ln in proc.stdout.splitlines() if ln]

def cluster(n_parents=1, n_mids=2, n_leaves=3, pad=0):
    w = []
    for i in range(n_parents):
        parts = ["(<-left value=\"m%d_%d\"" % (i, j) +
                 "".join(' (<-left value="v%02d_%d_%d")' % (k, i, j)
                         for k in range(n_leaves)) + ")"
                 for j in range(n_mids)]
        w.append(f'write (value="p{i}" ' + " ".join(parts) + ")")
    w += [f'write (value="x{e}")' for e in range(pad)]
    return w

READS = [
    # sorted pagesize-0 probe at depth 2
    ('d2 sorted ps0',
     'read (value="p0" result=((value contents)) '
     '(<-left value~="m*" result=((value contents)) '
     '(<-left sort=value pagesize=0 result=(cursor))))'),
    # depth-1 sorted ps0 for comparison
    ('d1 sorted ps0',
     'read (value="m0_0" result=((value contents)) '
     '(<-left sort=value pagesize=0 result=(cursor)))'),
    # d2 sorted with value range predicate
    ('d2 sorted + range',
     'read (value="p0" result=((value contents)) '
     '(<-left value~="m*" result=((value contents)) '
     '(<-left sort=value value>"v00" pagesize=1 result=(cursor (value)))))'),
    # d2 sorted, rendered count (forces full scan)
    ('d2 sorted + count',
     'read (value="p0" result=((value contents)) '
     '(<-left value~="m*" result=((value contents)) '
     '(<-left sort=value pagesize=1 result=(count cursor (value)))))'),
    # d2 unsorted ps0 probe
    ('d2 unsorted ps0',
     'read (value="p0" result=((value contents)) '
     '(<-left value~="m*" result=((value contents)) '
     '(<-left pagesize=0 result=(cursor))))'),
]

for label, read in READS:
    for shape, w in [("tiny", cluster()), ("pad20", cluster(pad=20)),
                     ("big", cluster(1, 2, 8))]:
        out = run(w + [read])
        r = out[-1] if out else "(none)"
        mark = " <== VRANGE" if "vrange" in r else ""
        print(f"{label:22s} {shape:6s} {r[:240]}{mark}")
