"""Same cluster store: depth-1 multi-parent sorted-sub chain vs depth-2."""
import os, re, subprocess, tempfile

REF_BIN = os.environ.get("GRAPHD_REF_BIN", "/tmp/graphd_ref_build/graphd")

def start(db):
    return subprocess.Popen([REF_BIN, "-d", db, "-bty"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, bufsize=1)

def ask(p, line):
    p.stdin.write(line + "\n"); p.stdin.flush()
    return p.stdout.readline().rstrip("\n")

def chain(read_tpl, label):
    with tempfile.TemporaryDirectory(prefix="gdref_") as tmp:
        p = start(os.path.join(tmp, "db"))
        parts = ["(<-left value=\"m0_%d\"" % j +
                 "".join(' (<-left value="v%02d_0_%d")' % (k, j)
                         for k in range(5)) + ")"
                 for j in range(3)]
        ask(p, 'write (value="p0" ' + " ".join(parts) + ")")
        print("=" * 70); print(label)
        r = ask(p, read_tpl.format(cur=""))
        print("P1:", r)
        for step in range(8):
            m = re.search(r'"((?:sort|null)[^"]*)"', r)
            if not m or m.group(1).startswith("null"):
                print("ENDED"); break
            cur = f'cursor="{m.group(1)}" '
            r = ask(p, read_tpl.format(cur=cur))
            print(f"P{step+2}:", r)
        p.stdin.close(); p.wait(timeout=10)

# depth-1: mids as root set (3 parents on the root page)
chain('read (pagesize=3 value~="m*" result=((value contents)) '
      '(<-left sort=value pagesize=1 {cur}result=(cursor (value))))',
      "depth-1, 3 parents on root page")
# depth-2
chain('read (value="p0" result=((value contents)) '
      '(<-left value~="m*" result=((value contents)) '
      '(<-left sort=value pagesize=1 {cur}result=(cursor (value)))))',
      "depth-2, 3 mids under one root")
