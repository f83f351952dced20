"""Reply value model + s-expression rendering.

Mirrors the reference's graphd_value tree (ref graphd/graphd-value.c,
enum graphd/graphd.h:1666-1678) and its output tokenization (ref
graphd/graphd-request-output.c): atoms print bare, strings print
quoted with ``\\`` escapes, GUIDs print as 32 hex chars, timestamps as
ISO-8601 with the 4-digit sub-second sequence, lists as
space-separated parenthesized groups.
"""

from __future__ import annotations

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


def escape_string(s: str) -> str:
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
    if v is Null:
        return "null"
    if isinstance(v, Atom):
        return v.text
    if isinstance(v, Str):
        return f'"{escape_string(v.text)}"'
    if isinstance(v, Guid):
        return v.text
    if isinstance(v, Num):
        return str(v.n)
    if isinstance(v, Ts):
        return ts_to_string(v.ts)
    if isinstance(v, List):
        return "(" + " ".join(render(i) for i in v.items) + ")"
    raise TypeError(f"unrenderable value {v!r}")
