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


def extract_script(name: str) -> str | None:
    """Pull the single rungraphd heredoc out of NAME.sh.

    Returns None for shapes the harness doesn't model (multiple server
    runs with persistent state, extra graphd options, input files).
    """
    path = os.path.join(GOLDEN_DIR, f"{name}.sh")
    with open(path) as f:
        text = f.read()
    blocks = re.findall(
        r"rungraphd [^\n]*<<-?\s*'?EOF'?\n(.*?)\n\s*EOF", text, re.S
    )
    if len(blocks) != 1:
        return None
    return "\n".join(line.lstrip("\t ") for line in blocks[0].splitlines())


def expected_output(name: str) -> list[str]:
    path = os.path.join(GOLDEN_DIR, f"{name}.out.exp")
    with open(path) as f:
        return [ln.rstrip("\n") for ln in f.read().splitlines()]


def split_requests(text: str) -> list[str]:
    """Group heredoc lines into requests (templates span lines until
    their parentheses balance outside string literals)."""
    reqs: list[str] = []
    buf: list[str] = []
    depth = 0
    in_str = False
    esc = False
    for line in text.splitlines():
        if not line.strip() and not buf:
            continue
        for ch in line:
            if esc:
                esc = False
                continue
            if in_str:
                if ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        buf.append(line)
        if depth == 0 and not in_str:
            req = " ".join(buf).strip()
            if req:
                reqs.append(req)
            buf = []
    if buf:
        req = " ".join(buf).strip()
        if req:
            reqs.append(req)
    return reqs


def run_golden(session_factory, name: str):
    """Run one golden; returns (got_lines, expected_lines) or None if
    the script shape is unsupported."""
    script = extract_script(name)
    if script is None:
        return None
    session = session_factory()
    got = [session.request(r) for r in split_requests(script)]
    return got, expected_output(name)
