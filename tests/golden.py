"""Golden-test harness: replay reference test/unit scripts.

The reference's corpus (ref /root/reference/test/unit/, 264 scripts)
pipes a heredoc of protocol requests into a predictable-mode graphd
and diffs stdout against NAME.out.exp (harness test/unit/rungraphd).
The format is engine-independent — it exercises only the protocol
surface — so the same scripts drive GraphSession directly.
"""

from __future__ import annotations

import os
import re

GOLDEN_DIR = "/root/reference/test/unit"

#: (regex, replacement) output filters from the current script's
#: `rungraphd | sed 's/.../.../g'` pipes, applied to every reply
_OUTPUT_FILTERS: list[tuple[str, str]] = []


def extract_script(name: str) -> str | None:
    """Pull the rungraphd input out of NAME.sh.

    Handles heredocs and ``rungraphd < file`` input redirection;
    consecutive server runs concatenate (the database persists between
    them) unless an ``rm -rf`` intervenes, which the harness doesn't
    model (state reset mid-test).
    """
    path = os.path.join(GOLDEN_DIR, f"{name}.sh")
    with open(path, errors="surrogateescape") as f:
        lines = f.read().splitlines()
    scripts: list[str] = []
    _OUTPUT_FILTERS.clear()
    i = 0
    saw_rm_after_block = False
    while i < len(lines):
        line = lines[i]
        if re.search(r"\brm -rf\b", line) and scripts:
            saw_rm_after_block = True
        m = re.search(r"rungraphd [^\n<]*<<-?\s*('?)EOF'?", line)
        if m:
            if saw_rm_after_block:
                return None
            # some scripts post-filter the server output, e.g.
            # param-order.sh pipes through sed to mask cost strings
            sm = re.search(r"\|\s*sed\s+'s(.)(.*)\1(.*)\1g?'", line)
            if sm:
                pat = sm.group(2).replace('\\"', '"')
                _OUTPUT_FILTERS.append((pat, sm.group(3)))
            unquoted = m.group(1) == ""
            i += 1
            block = []
            while i < len(lines) and lines[i].strip() != "EOF":
                text = lines[i].lstrip("\t ")
                if unquoted:
                    # an unquoted heredoc undergoes shell expansion:
                    # backslash is special before \ $ ` only
                    # (substring.sh: "\\(" reaches graphd as "\(")
                    text = re.sub(r"\\([\\$`])", r"\1", text)
                block.append(text)
                i += 1
            scripts.append("\n".join(block))
            i += 1
            continue
        m = re.search(r"rungraphd [^\n]*< *(\S+)\s*$", line)
        if m and not line.rstrip().endswith("EOF"):
            if saw_rm_after_block:
                return None
            fname = os.path.join(GOLDEN_DIR, m.group(1))
            if not os.path.exists(fname):
                return None
            with open(fname, errors="surrogateescape") as f:
                scripts.append(f.read())
            i += 1
            continue
        i += 1
    if not scripts:
        return None
    return "\n".join(scripts)


def expected_output(name: str) -> list[str]:
    path = os.path.join(GOLDEN_DIR, f"{name}.out.exp")
    with open(path, errors="surrogateescape") as f:
        return [ln.rstrip("\n") for ln in f.read().splitlines()]


def split_requests(text: str) -> list[str]:
    """Group heredoc lines into requests (templates span lines until
    their parentheses balance outside strings and '(: :)' comments)."""
    reqs: list[str] = []
    buf: list[str] = []
    depth = 0
    in_str = False
    in_comment = False
    esc = False
    for line in text.splitlines():
        if not line.strip() and not buf:
            continue
        i = 0
        while i < len(line):
            ch = line[i]
            if esc:
                esc = False
                i += 1
                continue
            if in_comment:
                if line.startswith(":)", i):
                    in_comment = False
                    i += 2
                    continue
                i += 1
                continue
            if in_str:
                if ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                i += 1
                continue
            if line.startswith("(:", i):
                in_comment = True
                i += 2
                continue
            if ch == '"':
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        buf.append(line)
        if depth == 0 and not in_str and not in_comment:
            req = "\n".join(buf).strip()
            if req:
                # pipelined input: several requests may share one line
                # (ref test/unit/micro.sh); split where parens rebalance
                reqs.extend(_split_inline(req))
            buf = []
    if buf:
        req = "\n".join(buf).strip()
        if req:
            reqs.append(req)
    return reqs


#: protocol request keywords — inline splitting only breaks where a
#: new request starts (test/unit/random1.sh: `read loglevel=(x) (...)`
#: is ONE request despite the early balanced parens)
_REQ_KEYWORDS = (
    "read", "write", "dump", "restore", "set", "status", "sync",
    "iterate", "verify", "replica", "smash", "crash",
)


def _starts_request(text: str) -> bool:
    head = text.lstrip().lower()
    return any(
        head == k or head.startswith(k + " ") or head.startswith(k + "(")
        or head.startswith(k + "\t")
        for k in _REQ_KEYWORDS
    )


def _split_inline(req: str) -> list[str]:
    out = []
    depth = 0
    in_str = False
    in_comment = False
    esc = False
    start = 0
    seen_paren = False
    i = 0
    while i < len(req):
        ch = req[i]
        if esc:
            esc = False
            i += 1
            continue
        if in_comment:
            if req.startswith(":)", i):
                in_comment = False
                i += 2
                continue
            i += 1
            continue
        if in_str:
            if ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            i += 1
            continue
        if req.startswith("(:", i):
            in_comment = True
            i += 2
            continue
        if ch == '"':
            in_str = True
        elif ch == "(":
            depth += 1
            seen_paren = True
        elif ch == ")":
            depth -= 1
            if (
                depth == 0
                and seen_paren
                and _starts_request(req[i + 1:])
            ):
                out.append(req[start : i + 1].strip())
                start = i + 1
                seen_paren = False
        i += 1
    tail = req[start:].strip()
    if tail:
        out.append(tail)
    return out


def _gen_david_1() -> list[str]:
    # ref test/unit/david_1.sh:29-39 — shell loop writes 500 requests
    # into david_1.in, then two reads in a heredoc
    reqs = [
        'write (value="%d" (<-left) (<-left) (<-left) (<-left) (<-left)'
        " (<-left) (<-left) (<-left) (<-left))" % t
        for t in range(500, 0, -1)
    ]
    reqs.append('read ( left->(value="499"))')
    reqs.append('read ( left->(value="9"))')
    return reqs


def _gen_david_2() -> list[str]:
    # ref test/unit/david_2.sh:30-43 — 1 head + 20,000 left= writes,
    # then one pagesize=64000 read
    reqs = ['write (name="head")']
    reqs += [
        'write (value="%d" left=00000012400034568000000000000000)' % t
        for t in range(20000, 0, -1)
    ]
    reqs.append(
        "read (pagesize=64000 left=00000012400034568000000000000000"
        " result=((value)))"
    )
    return reqs


# Scripts whose rungraphd input is generated by a shell loop rather
# than a literal heredoc; reproduced here from the .sh source.
GENERATED_INPUTS = {
    "david_1": _gen_david_1,
    "david_2": _gen_david_2,
}


def run_golden(session_factory, name: str):
    """Run one golden; returns (got_lines, expected_lines) or None if
    the script shape is unsupported."""
    if name in GENERATED_INPUTS:
        reqs = GENERATED_INPUTS[name]()
    else:
        script = extract_script(name)
        if script is None:
            return None
        reqs = split_requests(script)
    session = session_factory()
    got = [
        reply for r in reqs if (reply := session.request(r)) != ""
    ]
    for pat, repl in _OUTPUT_FILTERS:
        got = [re.sub(pat, repl, g) for g in got]
    return got, expected_output(name)
