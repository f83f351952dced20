"""Constraint-tree IR: the parsed form of read/write templates.

Dataclasses mirroring the reference's constraint IR
(ref graphd/graphd.h:1131-1413 graphd_constraint) — but only the parts
that carry query semantics; iterator/runtime state stays out.

Linkage encoding (ref graphd/graphd.h:1197-1211): a subconstraint is
related to its parent either as

- ``("my", L)``  — my linkage field L points at my parent
                   (self.L == parent.guid), or
- ``("iam", L)`` — I am my parent's L (parent.L == self.guid).

Meta arrows (ref graphd/graphd-semantic.c:677-730): ``->`` without a
keyword means "my parent is my left; my first free child is my right";
``<-`` means "my parent is my right; my first free child is my left".
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

LINKAGES = ("left", "right", "typeguid", "scope")

# flag tri-state (ref graphd/graphd.h:419-426)
UNSPECIFIED, TRUE, FALSE, DONTCARE = "unspecified", "true", "false", "dontcare"


@dataclass(slots=True)
class StrCon:
    """One string constraint: value/name/type OP strings.

    ``values`` may hold several strings (``value=("a" "b")`` is an OR of
    equalities, ref graphd/graphd.h:537-557); None means null.
    """

    op: str  # '=', '!=', '~=', '<', '<=', '>', '>='
    values: list[Optional[str]]
    #: source tokens of the parsed string set (parser diagnostics)
    _val_toks: Optional[list] = None


@dataclass(slots=True)
class GuidCon:
    """GUID / linkage-GUID constraint (ref graphd/graphd.h:487-514).

    ``guids`` is the matched set; [None] expresses ``=null``.
    """

    op: str  # '=', '!=', '~='
    guids: list[Optional[str]]


@dataclass(slots=True)
class GenCon:
    """newest=/oldest= generational constraint (ref graphd/graphd.h:458-472)."""

    field: str  # 'newest' | 'oldest'
    op: str
    n: int


@dataclass(slots=True)
class TsCon:
    """timestamp OP literal (ref libgdp/gdp-parse.c:1696-1760)."""

    op: str
    text: str  # raw literal; bound to a 48-bit ts at compile time


@dataclass(slots=True)
class Pattern:
    """Result pattern node (ref graphd/graphd.h:567-677 pattern enum)."""

    kind: str  # 'list' | 'guid' | 'type' | 'name' | 'value' | 'datatype'
    # | 'left' | 'right' | 'typeguid' | 'scope' | 'meta' | 'live'
    # | 'archival' | 'timestamp' | 'contents' | 'count' | 'cursor'
    # | 'literal' | 'variable' | 'none' | 'generation' | 'previous'
    # | 'next' | 'estimate' | 'estimate-count' | 'iterator' | 'timeout'
    children: list["Pattern"] = field(default_factory=list)
    literal: Optional[str] = None  # for kind == 'literal'
    var: Optional[str] = None  # for kind == 'variable'
    negated: bool = False  # sort direction marker ('-' prefix)
    #: default-pattern element flags (ref graphd-pattern.c:38-59): a
    #: link_only entry is emitted only for link primitives; a
    #: contents_only entry only when the constraint has subconstraints.
    link_only: bool = False
    contents_only: bool = False

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()


@dataclass(slots=True)
class SortKey:
    pattern: Pattern
    descending: bool = False


@dataclass(slots=True)
class Constraint:
    """One node of the constraint tree (ref graphd/graphd.h:1131-1413)."""

    meta: str = UNSPECIFIED  # 'node' | 'to' (<-) | 'from' (->) | 'any'
    linkage: Optional[tuple[str, str]] = None  # ('my'|'iam', linkage)

    guid: list[GuidCon] = field(default_factory=list)
    prev: list[GuidCon] = field(default_factory=list)
    next: list[GuidCon] = field(default_factory=list)
    links: dict[str, list[GuidCon]] = field(default_factory=dict)

    type_strcons: list[StrCon] = field(default_factory=list)
    name_strcons: list[StrCon] = field(default_factory=list)
    value_strcons: list[StrCon] = field(default_factory=list)

    valuetype: Optional[int] = None
    timestamps: list[TsCon] = field(default_factory=list)
    gens: list[GenCon] = field(default_factory=list)

    live: str = UNSPECIFIED
    archival: str = UNSPECIFIED
    false: bool = False

    count_min: Optional[int] = None  # atleast= / count>=; optional => 0
    count_max: Optional[int] = None  # count<=
    count_eq: Optional[int] = None  # count=
    pagesize: Optional[int] = None
    resultpagesize: Optional[int] = None
    countlimit: Optional[int] = None
    #: countlimit was synthesized from start+pagesize, not written
    #: by the user (cursor resume shifts it; graphd-constraint-
    #: cursor.c:52-55)
    countlimit_defaulted: bool = False
    start: int = 0
    cursor: Optional[str] = None
    dateline: Optional[str] = None

    comparator: Optional[str] = None
    #: value-comparator= overrides matching only, never sorting
    #: (ref test/unit/david_8.sh)
    value_comparator: Optional[str] = None
    sort_comparators: list[str] = field(default_factory=list)
    sort: Optional[list[SortKey]] = None
    #: the sort= pattern was a single BARE (unparenthesized) key.
    #: Signature-relevant: a bare guid/-guid key signs unlisted
    #: ("sort=guid"), because the semantic guid-tiebreak append only
    #: listifies keys that need one (probed: pagesize=0 sort=guid
    #: probe cursors checksum over "sort=guid", cursor fuzz seed 335)
    sort_bare: bool = False
    #: source position of this constraint's closing ')' (error replies)
    src_close: Optional[int] = None

    result: Optional[Pattern] = None
    assignments: list[tuple[str, Pattern]] = field(default_factory=list)

    # write-side (ref doc/gr-protocol.txt:661-857)
    unique: Optional[list[str]] = None
    key: Optional[list[str]] = None
    anchor: bool = False
    #: anchor=local matches on the node's own fields only, ignoring
    #: subconstraints (ref test/unit/anchor3.sh)
    anchor_local: bool = False

    subs: list["Constraint"] = field(default_factory=list)
    #: or-chains (ref libgdp/gdp-parse.c:2056-2134): each chain is a list
    #: of alternative branch constraints; the primitive must satisfy one
    #: branch of every chain (chains AND together, branches OR).
    or_chains: list[list["Constraint"]] = field(default_factory=list)
    #: set on a branch joined to its predecessor by '||' (short-circuit:
    #: only tried if earlier branches failed, ref graphd-constraint-or.c)
    or_short_circuit: bool = False
    #: textual parse order of subconstraints vs or-chains: entries
    #: ("sub", i) / ("chain", j) index into subs / or_chains.  The
    #: reference keeps ONE con_head list in parse order (branch subs
    #: included), which drives the `contents` slot order
    #: (graphd-constraint.c con_head; probe: slots follow parse order
    #: across root subs and every branch's subs).
    clause_order: list = field(default_factory=list)
    parent: Optional["Constraint"] = None
    #: parser-internal: start= seen (duplicate detection) and the
    #: source token of a meta arrow (error positions)
    _start_seen: bool = False
    _meta_tok: Optional[tuple] = None
    #: serving-prologue verdict memo (fastread.shape_flags): every
    #: entry depends only on tree structure, pattern kinds, and
    #: numeric fields — all part of the prepared-shape key — so a
    #: patch-target tree whose string literals are rebound per
    #: request keeps its verdicts.  Excluded from compare/diff.
    fr_memo: Optional[dict] = field(
        default=None, repr=False, compare=False
    )

    def ordered_clauses(self):
        """("sub", Constraint) / ("chain", list[Constraint]) in parse
        order; synthesized subs-then-chains for programmatically built
        constraints that never went through the parser."""
        order = self.clause_order
        if len(order) != len(self.subs) + len(self.or_chains):
            order = [("sub", i) for i in range(len(self.subs))] + [
                ("chain", j) for j in range(len(self.or_chains))
            ]
        for kind, i in order:
            yield kind, (self.subs[i] if kind == "sub"
                         else self.or_chains[i])

    def walk(self):
        yield self
        for s in self.subs:
            yield from s.walk()
        for chain in self.or_chains:
            for b in chain:
                yield from b.walk()

    @property
    def is_optional(self) -> bool:
        return self.count_min == 0 and self.count_eq is None


@dataclass(slots=True)
class Request:
    """A parsed protocol request line."""

    command: str  # read | write | dump | restore | set | status | sync | ...
    modifiers: dict[str, str] = field(default_factory=dict)
    #: request modifiers in source order, with duplicates (the reply
    #: echoes id=/cost=/dateline= per occurrence in order, ref
    #: test/unit/param-order.sh)
    modifier_seq: list = field(default_factory=list)
    constraint: Optional[Constraint] = None
    rest: list = field(default_factory=list)  # non-template args (dump/set/...)
