"""The ``~=`` glob of the default comparator.

Rules ported from graphd-comparator-default.c:57-98:

- case-insensitive, except characters escaped with ``\\``;
- ``^``/``$`` anchor; unanchored by default;
- whitespace in the pattern matches a run of whitespace+punctuation;
- punctuation in the pattern is optional whitespace;
- pattern edges without ``*`` bind to word boundaries ("foo" does not
  match "foot");
- ``*`` matches a run of word characters only, and releases the word
  -boundary requirement at a pattern edge ("foo*" matches "foot", not
  "pfoo");
- ``\\x`` matches the literal character case-sensitively.

Compiled to one Python regex evaluated by an Arrow-vectorized pandas
UDF.  When the pattern begins with a literal word, the compiler can
push a native ``startswith``/``contains`` prefilter ahead of the UDF
(prefix pushdown — the reference's dedicated prefix iterator,
libpdb/pdb-prefix.c); the UDF then only sees surviving rows.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd

# ISWORD (ref libgraph/graph-fuzzy-compare.c:27): alnum or any char
# outside ASCII
_WORD = "0-9A-Za-z-\U0010ffff"
# ASCII non-alphanumeric: whitespace + punctuation + control
_BREAK = "\\x00-\\x2f\\x3a-\\x40\\x5b-\\x60\\x7b-\\x7f"


def _is_word_char(c: str) -> bool:
    return c.isalnum() or ord(c) >= 0x80


@lru_cache(maxsize=1024)
def compile_glob(pattern: str, case_sensitive: bool = False):
    """graphd glob -> (compiled regex, [canonical numbers per group]).

    Returns None when the pattern can never match.  Unescaped number
    runs in the pattern become capture groups matched numerically
    afterwards ("01" matches "1", ref the numbers rule in
    graphd-comparator-default.c:86-88 and test/unit/numbermatch.sh).
    """
    anchored_front = pattern.startswith("^")
    if anchored_front:
        pattern = pattern[1:]
    anchored_back = pattern.endswith("$") and not pattern.endswith("\\$")
    if anchored_back:
        pattern = pattern[:-1]

    if (
        pattern
        and not anchored_front
        and not anchored_back
        and all(c.isspace() for c in pattern)
    ):
        # a whitespace-only glob has no words and matches anything,
        # like the empty pattern (ref graphd-comparator-default.c
        # word segmentation; test/unit/newline.sh: value~="\n"
        # returns every primitive)
        pattern = ""

    parts: list[str] = []
    numbers: list[str] = []
    i, n = 0, len(pattern)
    first_tok: str | None = None
    last_tok: str | None = None
    while i < n:
        c = pattern[i]
        tok = None
        if c == "\\" and i + 1 < n:
            lit = pattern[i + 1]
            if case_sensitive:
                parts.append(re.escape(lit))
            else:
                parts.append(f"(?-i:{re.escape(lit)})")
            tok = "lit"
            i += 2
        elif c == "*":
            parts.append(f"[{_WORD}]*")
            tok = "star"
            i += 1
        elif c.isspace():
            j = i
            while j < n and pattern[j].isspace():
                j += 1
            # lazy: don't swallow a sign that belongs to a following
            # number fragment ("foo +0" must capture "+0", not "0")
            parts.append(f"[{_BREAK}]+?")
            tok = "space"
            i = j
        elif (
            c == "."
            and i + 1 < n
            and pattern[i + 1].isdigit()
        ) or (
            c in "+-"
            and i + 1 < n
            and (
                pattern[i + 1].isdigit()
                or (
                    pattern[i + 1] == "."
                    and i + 2 < n
                    and pattern[i + 2].isdigit()
                )
            )
            and (
                i == 0
                or pattern[i - 1].isspace()
                or (
                    not pattern[i - 1].isalnum()
                    and pattern[i - 1] not in "+-"
                )
            )
        ) or c.isdigit():
            # unescaped number: match any number run, compare
            # numerically post-hoc
            from graphd_spark.comparators import decode_number, render_sci

            j = i
            if pattern[j] in "+-":
                j += 1
            while j < n and (
                pattern[j].isdigit()
                or (
                    pattern[j] == "."
                    and j + 1 < n
                    and pattern[j + 1].isdigit()
                )
                or (
                    pattern[j] == "."
                    and j == i
                )
            ):
                j += 1
            frag = pattern[i:j]
            dec = decode_number(frag)
            prefix_mode = False
            if j < n and pattern[j] == "*":
                # digits before a star are a number PREFIX: the text's
                # number-run matches if it starts with the fragment as
                # written or after normalization — "1*" matches "01"
                # (normalized 1) and "2020" via "202*" raw
                # (graphd-comparator-default.c number+star rules,
                # verified differentially; tests brendan3, numbermatch)
                prefix_mode = dec is not None
            elif i > 0 and pattern[i - 1] == "*":
                # digits after a star are a partial word — raw match
                # only ("*2" is a raw suffix)
                dec = None
            if dec is not None:
                nxt = pattern[j] if j < n else ""
                punct_next = bool(nxt) and not (
                    nxt == "*" or nxt.isalnum() or nxt.isspace()
                    or nxt == "\\"
                )
                numbers.append(
                    (
                        "prefix"
                        if prefix_mode
                        else ("full_punct" if punct_next else "full"),
                        frag,
                    )
                )
                if punct_next:
                    # the pattern itself continues with punctuation:
                    # the fragment binds a maximal plain digit run and
                    # the pattern's punctuation consumes the dot —
                    # "1.*" matches "1.5" as [1][.][5], never swallows
                    # "1.5" whole (differential probes; "15" stays
                    # unmatched because the run is maximal)
                    parts.append(r"([+-]?[0-9]+(?![0-9]))")
                else:
                    # candidate number runs segment like
                    # word_fragment_next: a dotted number binds only
                    # when not part of a longer dotted chain ("0.1.0"
                    # fragments as 0 / 1 / 0 — the IP-address rule;
                    # test compare1)
                    parts.append(
                        r"([+-]?(?:(?<!\.)[0-9]+\.[0-9]+(?!\.[0-9])"
                        r"|(?<![0-9])\.[0-9]+(?!\.[0-9])"
                        r"|[0-9]+))"
                    )
            else:
                parts.append(re.escape(frag))
            tok = "word"
            i = j
        elif _is_word_char(c):
            parts.append(re.escape(c))
            tok = "word"
            i += 1
        else:
            # punctuation: optional whitespace/punctuation run
            parts.append(f"[{_BREAK}]*")
            tok = "punct"
            i += 1
        if first_tok is None:
            first_tok = tok
        last_tok = tok

    body = "".join(parts)
    # word-boundary binding at pattern edges (unless released by *)
    if anchored_front:
        prefix = "^"
    elif first_tok == "star":
        prefix = ""
    else:
        prefix = f"(?:^|(?<=[{_BREAK}]))"
    if anchored_back:
        suffix = "$"
    elif last_tok == "star":
        suffix = ""
    else:
        suffix = f"(?=$|[{_BREAK}])"
    flags = re.DOTALL if case_sensitive else (re.IGNORECASE | re.DOTALL)
    try:
        return re.compile(prefix + body + suffix, flags), numbers
    except re.error:
        return None


def glob_match(pattern: str, value: str | None,
               case_sensitive: bool = False) -> bool:
    if value is None:
        return False
    compiled = compile_glob(pattern, case_sensitive)
    if compiled is None:
        return False
    rx, numbers = compiled
    if not numbers:
        return rx.search(value) is not None
    # scan every start offset: finditer skips overlapping candidates,
    # but a failed numeric post-check must retry later starts that
    # fall inside an earlier match ("1.*" vs "0.1.0" matches at the
    # middle segment)
    for pos in range(len(value) + 1):
        m = rx.match(value, pos)
        if m is None:
            continue
        ok = True
        for g, (mode, want) in enumerate(numbers, start=1):
            got = m.group(g)
            if got is None:
                ok = False
                break
            if not _legal_number_span(
                value, m.start(g), m.end(g), mode == "full_punct"
            ):
                ok = False
                break
            if mode == "prefix":
                if not _number_prefix_match(want, got):
                    ok = False
                    break
            elif not _number_frag_match(want, got):
                ok = False
                break
        if ok:
            return True
    return False


def _legal_number_span(value: str, s: int, e: int,
                       punct_adjacent: bool) -> bool:
    """Is value[s:e] a legal number fragment?  A two-segment dotted
    run ("2.2") is one atomic number — its halves only bind separately
    when the pattern spells out the dot; chains of three or more
    segments fragment per-segment (the IP-address rule, "0.1.0" ->
    0/1/0; libpdb/pdb-word.c word_fragment_next, tests compare1,
    numberequal)."""
    cs = s
    while cs > 0 and (
        value[cs - 1].isdigit()
        or (
            value[cs - 1] == "."
            and cs >= 2
            and value[cs - 2].isdigit()
            and cs < len(value)
            and value[cs].isdigit()
        )
    ):
        cs -= 1
    ce = e
    while ce < len(value) and (
        value[ce].isdigit()
        or (
            value[ce] == "."
            and ce + 1 < len(value)
            and value[ce + 1].isdigit()
            and ce >= 1
            and value[ce - 1].isdigit()
        )
    ):
        ce += 1
    if punct_adjacent:
        return True
    chain = value[cs:ce]
    if chain.count(".") == 1 and (s, e) != (cs, ce):
        return False
    return True


def _number_prefix_match(pat: str, got: str) -> bool:
    """Starred number fragment: the text run (raw or normalized)
    starts with the pattern digits as written — no leading-zero
    discard ("01*" matches "013" but not "1")."""
    from graphd_spark.comparators import word_number_normalize

    if got.startswith(pat):
        return True
    norm = word_number_normalize(got)
    return norm != got and norm.startswith(pat)


def _number_frag_match(pat: str, got: str) -> bool:
    """Pattern-number vs text-number (ref number_match,
    graphd-comparator-default.c:185-320): the pattern compares
    literally — first against the text as written, then against its
    string-normalized form — with pattern leading zeros discarded, an
    explicit '+' requiring a non-negative text, and a trailing
    '.0...' matching end-of-text when the text has no decimal point.
    '+0', '-0' and '.0' are numerically equal but do NOT ~=-match
    each other (test/unit/value.sh id="m")."""
    from graphd_spark.comparators import word_number_normalize

    if _number_lit_match(pat, got):
        return True
    norm = word_number_normalize(got)
    return norm != got and _number_lit_match(pat, norm)


def _number_lit_match(pat: str, s: str) -> bool:
    i = j = 0
    if pat[:1] == "+":
        if s[:1] == "-":
            return False
        i = 1
        if s[:1] == "+":
            j = 1
    # discard leading zeros in the pattern ("01" matches "1")
    while len(pat) - i >= 2 and pat[i] == "0" and pat[i + 1].isdigit():
        i += 1
    while i < len(pat):
        if j >= len(s):
            # decimal point followed by only zeros matches the end of
            # a text that never had a point
            if (
                pat[i] == "."
                and all(c == "0" for c in pat[i + 1:])
                and "." not in s
            ):
                return True
            return False
        if pat[i] != s[j]:
            return False
        i += 1
        j += 1
    return j >= len(s)


def literal_prefix(pattern: str) -> str | None:
    """Leading literal word of an anchored pattern, for pushdown."""
    if not pattern.startswith("^"):
        return None
    out = []
    for c in pattern[1:]:
        if _is_word_char(c) and c not in "*\\":
            out.append(c)
        else:
            break
    return "".join(out) or None


def glob_column(col, pattern: str, case_sensitive: bool = False):
    """Boolean Column: does ``col`` match the glob?

    The matcher runs in an Arrow-vectorized pandas UDF; when the
    pattern is front-anchored with a literal prefix, a native
    ``startswith`` prefilter is AND-ed in front so the scan can skip
    non-candidates without entering Python.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    @F.pandas_udf(BooleanType())
    def _match(vs: pd.Series) -> pd.Series:
        return vs.map(
            lambda v: glob_match(pattern, v, case_sensitive)
        ).astype(bool)

    cond = _match(col)
    prefix = literal_prefix(pattern)
    if prefix and not any(c.isdigit() for c in prefix):
        if case_sensitive:
            cond = col.startswith(prefix) & cond
        else:
            cond = F.lower(col).startswith(prefix.lower()) & cond
    return cond
