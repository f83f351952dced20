"""Reply value model + s-expression rendering.

Mirrors the reference's graphd_value tree (ref graphd/graphd-value.c,
enum graphd/graphd.h:1666-1678) and its output tokenization (ref
graphd/graphd-request-output.c): atoms print bare, strings print
quoted with ``\\`` escapes, GUIDs print as 32 hex chars, timestamps as
ISO-8601 with the 4-digit sub-second sequence, lists as
space-separated parenthesized groups.
"""

from __future__ import annotations

import re

from dataclasses import dataclass, field

from graphd_spark.model import ts_to_string


@dataclass(frozen=True)
class Atom:
    """Unquoted token (true/false/node/->/datatype names/numbers)."""

    text: str


@dataclass(frozen=True)
class Str:
    text: str


@dataclass(frozen=True)
class Guid:
    text: str


@dataclass(frozen=True)
class Num:
    n: int


@dataclass(frozen=True)
class Ts:
    ts: int


class _Null:
    __slots__ = ()

    def __repr__(self):
        return "Null"


Null = _Null()


class _Empty:
    """A value with empty text (``literal=""``, ``none``): writes no
    bytes but still clears the output writer's pending-separator flag,
    so a following value emits its own space (ref
    graphd-request-output.c greq_format_list_sep — the space is
    skipped only while the flag is set; every completed value clears
    it, even one that wrote nothing; see test emptylit)."""

    __slots__ = ()

    def __repr__(self):
        return "Empty"


Empty = _Empty()


@dataclass
class List:
    items: list = field(default_factory=list)


@dataclass
class Splice:
    """Multiple values to inline into the surrounding list.

    Used by the ``contents`` pattern, which contributes one value per
    subconstraint (ref graphd-pattern.c CONTENTS handling), and by
    per-element expansion inside a set-level list.
    """

    items: list = field(default_factory=list)


#: anything escape_string must touch: protocol escapes plus the
#: su_encode marker () — absent all four, the string renders
#: verbatim (hot-path fast exit)
_ESC_NEEDED = re.compile('[\\\\"\n]')


def escape_string(s: str) -> str:
    if _ESC_NEEDED.search(s) is None:
        return s
    from graphd_spark.model import su_decode

    # restore raw non-UTF-8 bytes that were escaped to cross the
    # JVM/Arrow boundary (test/unit/ben2.sh)
    s = su_decode(s)
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        elif ch == "\n":
            out.append("\\n")
        else:
            out.append(ch)
    return "".join(out)


def render(v) -> str:
    # exact-type dispatch (none of the value types are subclassed;
    # the serving loop renders a handful of values per reply, and the
    # old 8-step isinstance chain was measurable there)
    r = _RENDERERS.get(type(v))
    if r is not None:
        return r(v)
    if v is Null:
        return "null"
    if v is Empty:
        return ""
    raise TypeError(f"unrenderable value {v!r}")


_RENDERERS = {
    Atom: lambda v: v.text,
    Str: lambda v: f'"{escape_string(v.text)}"',
    Guid: lambda v: v.text,
    Num: lambda v: str(v.n),
    Ts: lambda v: ts_to_string(v.ts),
    List: lambda v: "(" + join_values(v.items) + ")",
    _Null: lambda v: "null",
    _Empty: lambda v: "",
}


def join_values(items, sep_pending: bool = True) -> str:
    """Space-join with the reference writer's separator flag: a space
    goes before each value unless one is already pending ('(' and the
    reply keyword leave one pending); Empty values write nothing but
    clear the flag."""
    out = []
    for i in items:
        if i is Empty:
            sep_pending = False
            continue
        if not sep_pending:
            out.append(" ")
        out.append(render(i))
        sep_pending = False
    return "".join(out)
