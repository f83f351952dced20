"""Page a depth-2 nested sorted-cursor chain; bigger clusters."""
import os, re, subprocess, sys, tempfile

REF_BIN = os.environ.get("GRAPHD_REF_BIN", "/tmp/graphd_ref_build/graphd")

def start_server(db):
    return subprocess.Popen(
        [REF_BIN, "-d", db, "-bty"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, bufsize=1)

def ask(p, line):
    p.stdin.write(line + "\n"); p.stdin.flush()
    return p.stdout.readline().rstrip("\n")

def drive(n_parents, n_mids, n_leaves, pad=0, label=""):
    print("=" * 70); print(label or f"{n_parents}p {n_mids}m {n_leaves}l pad{pad}")
    with tempfile.TemporaryDirectory(prefix="gdref_") as tmp:
        p = start_server(os.path.join(tmp, "db"))
        for i in range(n_parents):
            parts = ["(<-left value=\"m%d_%d\"" % (i, j) +
                     "".join(' (<-left value="v%02d_%d_%d")' % (k, i, j)
                             for k in range(n_leaves)) + ")"
                     for j in range(n_mids)]
            ask(p, f'write (value="p{i}" ' + " ".join(parts) + ")")
        for e in range(pad):
            ask(p, f'write (value="x{e}")')
        read = ('read (value="p0" result=((value contents)) '
                '(<-left value~="m*" result=((value contents)) '
                '(<-left sort=value pagesize=1 result=(cursor (value)))))')
        r = ask(p, read)
        print("P1:", r)
        for step in range(n_leaves + 3):
            m = re.search(r'"((?:sort|fixed|gmap|vip|and|vrange|null)[^"]*)"', r)
            if not m or m.group(1).startswith("null"):
                print("ENDED"); break
            cur = m.group(1)
            resume = ('read (value="p0" result=((value contents)) '
                      '(<-left value~="m*" result=((value contents)) '
                      f'(<-left sort=value pagesize=1 cursor="{cur}" '
                      'result=(cursor (value)))))')
            r = ask(p, resume)
            print(f"P{step+2}:", r)
        p.stdin.close(); p.wait(timeout=10)

drive(1, 2, 8)
drive(1, 2, 8, pad=30)
drive(1, 3, 5)
