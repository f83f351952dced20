"""Page a depth-2 nested sorted-cursor chain through the binary."""
import os, re, subprocess, sys, tempfile

REF_BIN = os.environ.get("GRAPHD_REF_BIN", "/tmp/graphd_ref_build/graphd")

def start_server(db):
    # persistent process: interactive paging needs one store
    p = subprocess.Popen(
        [REF_BIN, "-d", db, "-bty"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        bufsize=1,
    )
    return p

def ask(p, line):
    p.stdin.write(line + "\n")
    p.stdin.flush()
    return p.stdout.readline().rstrip("\n")

def main():
    n_parents, n_mids, n_leaves = 1, 2, 3
    with tempfile.TemporaryDirectory(prefix="gdref_") as tmp:
        p = start_server(os.path.join(tmp, "db"))
        for i in range(n_parents):
            parts = ["(<-left value=\"m%d_%d\"" % (i, j) +
                     "".join(' (<-left value="v%02d_%d_%d")' % (k, i, j)
                             for k in range(n_leaves)) + ")"
                     for j in range(n_mids)]
            print("W:", ask(p, f'write (value="p{i}" ' + " ".join(parts) + ")"))
        read = ('read (value="p0" result=((value contents)) '
                '(<-left value~="m*" result=((value contents)) '
                '(<-left sort=value pagesize=1 result=(cursor (value)))))')
        r = ask(p, read)
        print("P1:", r)
        # extract first sub cursor and resume it
        for step in range(8):
            m = re.search(r'"((?:sort|fixed|gmap|vip|and|null)[^"]*)"', r)
            if not m:
                break
            cur = m.group(1)
            if cur.startswith("null"):
                print("ENDED")
                break
            resume = ('read (value="p0" result=((value contents)) '
                      '(<-left value~="m*" result=((value contents)) '
                      f'(<-left sort=value pagesize=1 cursor="{cur}" '
                      'result=(cursor (value)))))')
            r = ask(p, resume)
            print(f"P{step+2}:", r)
        p.stdin.close(); p.wait(timeout=10)

if __name__ == "__main__":
    main()
