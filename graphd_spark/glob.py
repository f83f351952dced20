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
def compile_glob(pattern: str):
    """graphd glob -> compiled regex (None = matches nothing)."""
    anchored_front = pattern.startswith("^")
    if anchored_front:
        pattern = pattern[1:]
    anchored_back = pattern.endswith("$") and not pattern.endswith("\\$")
    if anchored_back:
        pattern = pattern[:-1]

    parts: list[str] = []
    i, n = 0, len(pattern)
    first_tok: str | None = None
    last_tok: str | None = None
    while i < n:
        c = pattern[i]
        tok = None
        if c == "\\" and i + 1 < n:
            lit = pattern[i + 1]
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
            parts.append(f"[{_BREAK}]+")
            tok = "space"
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
    try:
        return re.compile(prefix + body + suffix, re.IGNORECASE | re.DOTALL)
    except re.error:
        return None


def glob_match(pattern: str, value: str | None) -> bool:
    if value is None:
        return False
    rx = compile_glob(pattern)
    if rx is None:
        return False
    return rx.search(value) is not None


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


def glob_column(col, pattern: str):
    """Boolean Column: does ``col`` match the glob?

    The regex runs in an Arrow-vectorized pandas UDF; when the pattern
    is front-anchored with a literal prefix, a native case-insensitive
    ``startswith`` prefilter is AND-ed in front so the scan can skip
    non-candidates without entering Python.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    @F.pandas_udf(BooleanType())
    def _match(vs: pd.Series) -> pd.Series:
        rx = compile_glob(pattern)
        if rx is None:
            return pd.Series([False] * len(vs))
        return vs.map(
            lambda v: v is not None and rx.search(v) is not None
        ).astype(bool)

    cond = _match(col)
    prefix = literal_prefix(pattern)
    if prefix:
        cond = F.lower(col).startswith(prefix.lower()) & cond
    return cond
