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
            if (j < n and pattern[j] == "*") or (
                i > 0 and pattern[i - 1] == "*"
            ):
                # digits adjacent to a star are a partial word, not a
                # standalone number — no numeric normalization
                # ("202*_3" matches "2020_3"; test/unit/brendan3.sh)
                dec = None
            if dec is not None:
                numbers.append(frag)
                # candidate number runs segment like word_fragment_next:
                # a dotted number binds only when not part of a longer
                # dotted chain ("0.1.0" fragments as 0 / 1 / 0 — the
                # IP-address rule; test compare1)
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
    for m in rx.finditer(value):
        ok = True
        for want, got in zip(numbers, m.groups()):
            if got is None or not _number_frag_match(want, got):
                ok = False
                break
        if ok:
            return True
    return False


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
