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

#: (block index, text) shell `echo` lines whose stdout interleaves
#: with the server replies in the golden (test/unit/dateline-2.sh)
_ECHOES: list[tuple[int, str]] = []


def _run_controls(line: str) -> dict:
    """Per-run server settings from a rungraphd invocation: ``-I name``
    sets the instance id (overriding the config file's), ``-f file``
    names a config whose ``instance-id`` / ``database { id "..." }``
    entries apply (tests instance-id, dbname)."""
    ctl: dict = {}
    m = re.search(r"-f\s+(\S+)", line)
    if m:
        path = os.path.join(GOLDEN_DIR, m.group(1))
        if os.path.exists(path):
            with open(path, errors="surrogateescape") as f:
                conf = f.read()
            cm = re.search(r"^\s*instance-id\s+(\S+)", conf, re.M)
            if cm:
                ctl["instance_id"] = cm.group(1)
            cm = re.search(r'\bid\s+"([^"]+)"', conf)
            if cm:
                ctl["db_name"] = cm.group(1)
    m = re.search(r"-I\s+(\S+)", line)
    if m:
        ctl["instance_id"] = m.group(1)
    return ctl


def extract_script(name: str):
    """Pull the rungraphd input out of NAME.sh as a list of segments:
    ``("ctl", dict)`` applies per-run server settings, ``("script",
    text)`` is one server run's request stream.

    Handles heredocs and ``rungraphd < file`` input redirection;
    consecutive server runs concatenate (the database persists between
    them) unless an ``rm -rf`` intervenes, which the harness doesn't
    model (state reset mid-test).
    """
    path = os.path.join(GOLDEN_DIR, f"{name}.sh")
    with open(path, errors="surrogateescape") as f:
        lines = f.read().splitlines()
    segments: list = []
    n_scripts = 0
    _OUTPUT_FILTERS.clear()
    _ECHOES.clear()
    i = 0
    while i < len(lines):
        line = lines[i]
        m = re.match(r"\s*echo\s+(.*?)\s*$", line)
        if m and ">" not in line:
            # shell echoes interleave with server output in the
            # golden (test/unit/dateline-2.sh "removing"/"running");
            # record position as "after N script blocks"
            text = m.group(1)
            if len(text) >= 2 and text[0] == text[-1] and text[0] in "'\"":
                text = text[1:-1]
            _ECHOES.append((n_scripts, text))
            i += 1
            continue
        if (
            re.search(r"\brm -rf\b", line)
            and "$D" in line
            and n_scripts
        ):
            # mid-test database wipe: the next run starts fresh
            # (test/unit/or2.sh)
            segments.append(("ctl", {"reset": True}))
        quiet = re.search(r">\s*/dev/null", line) is not None
        m = re.search(r"rungraphd [^\n<]*<<-?\s*('?)(\w+)'?", line)
        if m:
            # some scripts post-filter the server output, e.g.
            # param-order.sh pipes through sed to mask cost strings
            sm = re.search(r"\|\s*sed\s+'s(.)(.*)\1(.*)\1g?'", line)
            if sm:
                pat = sm.group(2).replace('\\"', '"')
                _OUTPUT_FILTERS.append((pat, sm.group(3)))
            # every run gets a ctl segment: a server restart resets
            # runtime settings even with no flags (test/unit/cost2.sh)
            segments.append(("ctl", _run_controls(line)))
            unquoted = m.group(1) == ""
            term = m.group(2)
            i += 1
            block = []
            while i < len(lines) and lines[i].strip() != term:
                text = lines[i].lstrip("\t ")
                if unquoted:
                    # an unquoted heredoc undergoes shell expansion:
                    # backslash is special before \ $ ` only
                    # (substring.sh: "\\(" reaches graphd as "\(")
                    text = re.sub(r"\\([\\$`])", r"\1", text)
                block.append(text)
                i += 1
            segments.append((
                "script_quiet" if quiet else "script",
                "\n".join(block),
            ))
            n_scripts += 1
            i += 1
            continue
        m = re.search(r"rungraphd [^\n]*< *(\S+)", line)
        if m and "<<" not in line:
            fname = m.group(1).replace("${B}", name).replace("$B", name)
            fname = os.path.join(GOLDEN_DIR, fname)
            if not os.path.exists(fname):
                return None
            segments.append(("ctl", _run_controls(line)))
            with open(fname, errors="surrogateescape") as f:
                segments.append((
                    "script_quiet" if quiet else "script", f.read()
                ))
            n_scripts += 1
            i += 1
            continue
        i += 1
    if not n_scripts:
        return None
    return segments


def expected_output(name: str) -> list[str]:
    path = os.path.join(GOLDEN_DIR, f"{name}.out.exp")
    with open(path, errors="surrogateescape") as f:
        return [ln.rstrip("\n") for ln in f.read().splitlines()]


#: request-keyword automaton vocabulary (ref libgdp/gdp-micro.c:34-91:
#: read, replica, restore, set, status, verify, write)
_MICRO_KEYWORDS = (
    "read", "replica", "restore", "set", "status", "verify", "write",
)
#: proper prefixes of the keywords (the automaton's states); a failed
#: extension restarts with the CURRENT char only (gdp_micro.c:134:
#: next = automaton[0][i]), so "wread" does not detect "read" but
#: "typeread" does
_MICRO_PREFIXES = {
    k[:i] for k in _MICRO_KEYWORDS for i in range(1, len(k))
}


def _micro_step(state: str, c: str):
    """(new state, detected?) for one lowercase alpha char."""
    cand = state + c
    if cand in _MICRO_KEYWORDS:
        return "", True
    if cand in _MICRO_PREFIXES:
        return cand, False
    return (c if c in _MICRO_PREFIXES else ""), False


def _micro_chunks(text: str):
    """Frame requests the way the reference server does (ref
    libgdp/gdp-micro.c gdp_micro_parse): character-level scan tracking
    paren depth and string state; a request ends at a newline outside
    parens, and turns *malformed* — skipping to the next newline —
    when a newline appears inside a string or a request keyword is
    spelled out while inside parens (the automaton matches even inside
    a longer word: "typeread", "xset"; test/unit/micro.sh).

    Yields (chunk, malformed) pairs; chunks keep their newlines.
    """
    level = 0
    string = False
    escape = False
    malformed = False
    lastch_seen = False
    # rolling alpha-run suffix for keyword detection
    run = ""
    start = 0
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        i += 1
        if malformed:
            if c == "\n":
                yield text[start:i], True
                start = i
                level = 0
                string = False
                escape = False
                malformed = False
                lastch_seen = False
                run = ""
            continue
        if string:
            if escape:
                escape = False
            elif c == '"':
                string = False
            elif c == "\\":
                escape = True
            elif c == "\n":
                yield text[start:i], True
                start = i
                level = 0
                escape = False
                string = False
                lastch_seen = False
                run = ""
            continue
        if c.isalpha():
            run, hit = _micro_step(run, c.lower())
            if level > 0 and hit:
                malformed = True
                continue
        else:
            run = ""
        if c == "(":
            level += 1
        elif c == ")":
            level -= 1
        elif c == '"':
            string = True
        elif c == "\n":
            if level <= 0 and lastch_seen:
                yield text[start:i], False
                start = i
                level = 0
                lastch_seen = False
                run = ""
                continue
        if not c.isspace():
            lastch_seen = True
    if start < n and text[start:].strip():
        yield text[start:], False


def split_requests(text: str) -> list[str]:
    """Frame heredoc input into requests via the micro parser."""
    if not text.endswith("\n"):
        text += "\n"
    reqs: list[str] = []
    for chunk, malformed in _micro_chunks(text):
        if not chunk.strip():
            continue
        # strip trailing whitespace but keep LEADING newlines: blank
        # lines join the next request's buffer, and error positions
        # count them ("on line 2, column 1", test/unit/nonsense.in)
        req = chunk.rstrip()
        if malformed:
            # keep the final newline: the engine's lexer reports the
            # invalid token through the line end
            reqs.append(req + "\n")
            continue
        # pipelined input: several requests may share one line;
        # split where parens rebalance before a keyword
        reqs.extend(_split_inline(req))
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
                piece = req[start : i + 1]
                # preserve leading newlines of the first piece (error
                # positions count blank lines, nonsense.in); later
                # pieces start mid-line and strip clean
                out.append(piece.rstrip() if start == 0 else piece.strip())
                start = i + 1
                seen_paren = False
        i += 1
    tail = req[start:]
    if tail.strip():
        out.append(tail.rstrip() if start == 0 else tail.strip())
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
        segments = [("script_reqs", GENERATED_INPUTS[name]())]
        _ECHOES.clear()
        _OUTPUT_FILTERS.clear()
    else:
        segments = extract_script(name)
        if segments is None:
            return None
    session = session_factory()
    got: list[str] = []
    n_script = 0
    for kind, payload in segments:
        if kind == "ctl":
            session.apply_run_controls(payload)
            continue
        # shell echoes print before the block they precede
        # (test/unit/keyburn2.sh "Round 2" between runs)
        got += [t for i, t in _ECHOES if i == n_script]
        n_script += 1
        reqs = (
            payload if kind == "script_reqs"
            else split_requests(payload)
        )
        for r in reqs:
            reply = session.request(r)
            if kind != "script_quiet" and reply != "":
                got.append(reply)
    got += [t for i, t in _ECHOES if i >= n_script]
    for pat, repl in _OUTPUT_FILTERS:
        got = [re.sub(pat, repl, g) for g in got]
    return got, expected_output(name)
