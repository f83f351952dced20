"""Recursive-descent parser: request line -> Request / Constraint tree.

Clean-room implementation of the grammar in doc/gr-protocol.txt,
structured after the reference parser's productions
(ref libgdp/gdp-parse.c): parse_request -> parse_constraints ->
parse_con (or-chains, ref :2056-2134) -> parse_or_con dispatch
(ref :1916-2053).  Semantic defaults (live=true, count_min=start+1,
meta-arrow linkage inference) are applied in a separate pass, mirroring
graphd_semantic_constraint_complete_parse
(ref graphd/graphd-semantic.c:628-760).
"""

from __future__ import annotations

from graphd_spark.gql import lexer as L
from graphd_spark.gql.ir import (
    Constraint,
    GenCon,
    GuidCon,
    Pattern,
    Request,
    SortKey,
    StrCon,
    TsCon,
    LINKAGES,
    DONTCARE,
    FALSE,
    TRUE,
    UNSPECIFIED,
)
from graphd_spark.model import DATATYPE_CODES, guid_normalize

from operator import attrgetter

# _merge_item's batched field reads (hot on the full-parse path)
_MERGE_LIST_FIELDS = (
    "guid", "prev", "next", "type_strcons", "name_strcons",
    "value_strcons", "timestamps", "gens", "assignments", "subs",
)
_MERGE_LISTS = attrgetter(*_MERGE_LIST_FIELDS)
_MERGE_OPT_FIELDS = (
    "valuetype", "count_min", "count_max", "count_eq", "pagesize",
    "resultpagesize", "countlimit", "cursor", "dateline", "comparator",
    "value_comparator", "sort", "result", "unique", "key", "linkage",
)
_MERGE_OPTS = attrgetter(*_MERGE_OPT_FIELDS)


class ParseError(Exception):
    """Maps to an ``error SYNTAX``/``error SEMANTICS`` reply."""

    def __init__(self, message: str, code: str = "SYNTAX"):
        super().__init__(message)
        self.code = code


_STR_OPS = {L.EQ, L.NE, L.FE, L.LT, L.LE, L.GT, L.GE}

#: result/sort pattern atoms (ref graphd/graphd.h:567-677)
_PATTERN_ATOMS = {
    "archival",
    "contents",
    "count",
    "cursor",
    "datatype",
    "estimate",
    "estimate-count",
    "generation",
    "guid",
    "iterator",
    "left",
    "literal",
    "live",
    "meta",
    "name",
    "next",
    "none",
    "previous",
    "prev",
    "right",
    "scope",
    "timeout",
    "timestamp",
    "type",
    "typeguid",
    "value",
    "valuetype",
}

_CLUSTER_FIELDS = {
    "name",
    "typeguid",
    "datatype",
    "valuetype",
    "value",
    "left",
    "right",
    "scope",
    "timestamp",
}



def _linecol(text: str, pos: int) -> tuple[int, int]:
    """1-based (line, column) of a character offset (requests may span
    newlines; the reference reports positions per line, counting each
    tab as 8 columns — ref libgdp/gdp-lexer.c:33)."""
    line = text.count("\n", 0, pos) + 1
    nl = text.rfind("\n", 0, pos)
    col = 1
    for ch in text[nl + 1:pos]:
        col += 8 if ch == "\t" else 1
    return line, col


class Parser:
    def __init__(self, text: str, command: str = "read", toks=None):
        self.text = text
        self.toks = L.tokenize(text) if toks is None else toks
        self.i = 0
        self.command = command

    def at(self, pos: int) -> str:
        l, c = _linecol(self.text, pos)
        return f"on line {l}, column {c}"

    # -- token plumbing ---------------------------------------------------

    def peek(self, ahead: int = 0) -> L.Token:
        if ahead:
            j = min(self.i + ahead, len(self.toks) - 1)
            return self.toks[j]
        # hot path: the token list always ends with an END sentinel
        # and next() never advances past it, so i is always in range
        return self.toks[self.i]

    def next(self) -> L.Token:
        t = self.toks[self.i]
        if t.kind == L.ERRTOK:
            raise L.errtok_error(self.text, t)
        if t.kind != L.END:
            self.i += 1
        return t

    def expect(self, kind: str, what: str | None = None) -> L.Token:
        t = self.next()
        if t.kind != kind:
            raise ParseError(f"expected {what or kind}, got {t.text!r}")
        return t

    # -- entry points -----------------------------------------------------

    def parse_constraint(self) -> Constraint:
        self.expect(L.OPAR, "'('")
        con = self.parse_constraints()
        self.expect(L.CPAR, "')'")
        if self.peek().kind != L.END:
            raise ParseError(f"trailing input: {self.peek().text!r}")
        return con

    def parse_constraints(self) -> Constraint:
        """Parse constraint items until ')' / '}' / end into one node."""
        con = Constraint()
        # write requests allow each linkage keyword once per constraint
        # (ref gdp-parse.c ctx_linkmap; test/unit/random4.sh)
        if not hasattr(self, "_linkmaps"):
            self._linkmaps = []
        self._linkmaps.append({})
        try:
            while True:
                t = self.peek()
                if t.kind in (L.CPAR, L.CBRC, L.END):
                    return con
                self.parse_con(con)
        finally:
            self._linkmaps.pop()

    def _note_linkage_kw(self, t: "L.Token") -> None:
        """Record a left/right/scope/typeguid keyword use; duplicate
        use within one write constraint is a SEMANTICS error at the
        second keyword (ref gdp-parse.c:1427-1430 linkmap_test)."""
        if self.command != "write" or not getattr(self, "_linkmaps", None):
            return
        lm = self._linkmaps[-1]
        lk = t.text.lower()
        if lk in lm:
            raise ParseError(
                f"{self.at(t.pos)}: '{t.text}': duplicate linkage "
                "declaration",
                "SEMANTICS",
            )
        lm[lk] = t.pos

    def parse_con(self, con: Constraint) -> None:
        """One Constraint production: OrConstraint ('|' Constraint)?

        Ref libgdp/gdp-parse.c:2060-2134: '|' binds single adjacent
        clause items; an absent right-hand side is an empty (always
        true) branch.
        """
        t = self.peek()
        if t.kind in (L.BOR, L.LOR):
            # leading '|': empty left branch
            first = Constraint()
        else:
            first = Constraint()
            self.parse_or_con(first)
            if self.peek().kind not in (L.BOR, L.LOR):
                self._merge_item(con, first)
                return
        branches = [first]
        while self.peek().kind in (L.BOR, L.LOR):
            lor = self.next().kind == L.LOR
            nxt = self.peek()
            if nxt.kind in (L.CPAR, L.CBRC, L.END):
                b = Constraint()  # trailing '|': empty branch
                b.or_short_circuit = lor
                branches.append(b)
                break
            b = Constraint()
            self.parse_or_con(b)
            # '||' is short-circuit: this branch is only tried if the
            # preceding branches failed (ref libgdp/gdp-parse.c:2136
            # tkn_kind == TOK_LOR -> conlist_add_or short_circuit;
            # graphd/graphd-constraint-or.c).  '|' and '||' can mix in
            # one chain, so the flag lives on the joined branch.
            b.or_short_circuit = lor
            branches.append(b)
        # NESTED chain normalization: a branch that is a BARE brace
        # group holding one chain ({ {A|B} | C }) splices its inner
        # branches into the enclosing chain, depth-first.  Probed
        # byte-identical against the reference — replies, winner
        # slots, $var bindings, AND cursor checksums are equal for
        # the nested and flat spellings (the reference's own
        # normalization), for intrinsic and sub-bearing branches
        # alike; branches mixing predicates with a nested chain are
        # parse errors in both engines and never reach here.
        if any(self._is_bare_chain(b) for b in branches):
            flat = []
            for b in branches:
                if self._is_bare_chain(b):
                    inner = b.or_chains[0]
                    if inner:
                        # the outer joining flag rides the first
                        # spliced branch; later ones keep their own
                        inner[0].or_short_circuit = b.or_short_circuit
                    flat.extend(inner)
                else:
                    flat.append(b)
            branches = flat
        con.clause_order.append(("chain", len(con.or_chains)))
        con.or_chains.append(branches)

    @staticmethod
    def _is_bare_chain(b: Constraint) -> bool:
        """True when branch ``b`` is nothing but one or-chain (the
        parse of a bare ``{...|...}`` branch)."""
        return (
            len(b.or_chains) == 1
            and not (
                b.guid or b.prev or b.next or b.links
                or b.type_strcons or b.name_strcons or b.value_strcons
                or b.timestamps or b.gens or b.subs or b.assignments
                or b.sort or b.sort_comparators or b.false or b.anchor
            )
            and b.valuetype is None
            and b.live == UNSPECIFIED
            and b.archival == UNSPECIFIED
            and b.meta == UNSPECIFIED
            and b.linkage is None
            and b.count_min is None
            and b.count_max is None
            and b.count_eq is None
            and b.pagesize is None
            and b.resultpagesize is None
            and b.countlimit is None
            and b.start == 0
            and b.cursor is None
            and b.dateline is None
            and b.comparator is None
            and b.value_comparator is None
            and b.result is None
            and b.unique is None
            and b.key is None
        )

    def _merge_item(self, con: Constraint, item: Constraint) -> None:
        """Fold a single parsed clause item into the enclosing node."""
        if item.clause_order:
            sub_off, chain_off = len(con.subs), len(con.or_chains)
            con.clause_order.extend(
                (k, i + (sub_off if k == "sub" else chain_off))
                for k, i in item.clause_order
            )
        # batched field reads (one C attrgetter call instead of ~26
        # dynamic getattr calls — this merge runs per clause item on
        # the full-parse serving path)
        for f, v in zip(_MERGE_LIST_FIELDS, _MERGE_LISTS(item)):
            if v:
                getattr(con, f).extend(v)
        for s in item.subs:
            s.parent = con
        if item.links:
            for k, v in item.links.items():
                con.links.setdefault(k, []).extend(v)
        for f, v in zip(_MERGE_OPT_FIELDS, _MERGE_OPTS(item)):
            if v is not None:
                if getattr(con, f) is not None and f not in ("linkage",):
                    if f == "cursor":
                        # ref gdp-parse duplicate-cursor wording
                        raise ParseError(
                            "more than one cursor=...", "SEMANTICS"
                        )
                    # wordings per graphd-constraint-clause.c:569-798:
                    # bare name for the page/size/type fields, "X=..."
                    # for countlimit, "value for X" otherwise
                    fname = f.replace("_", "-")
                    if fname in (
                        "valuetype", "pagesize", "resultpagesize",
                        "start",
                    ):
                        raise ParseError(
                            f"more than one {fname}", "SEMANTICS"
                        )
                    if fname in ("countlimit",):
                        raise ParseError(
                            f"more than one {fname}=...", "SEMANTICS"
                        )
                    raise ParseError(
                        f"more than one value for {fname}",
                        "SEMANTICS",
                    )
                setattr(con, f, v)
                if f == "sort":
                    con.sort_bare = item.sort_bare
        if item.start:
            if getattr(con, "_start_seen", False):
                raise ParseError("more than one start", "SEMANTICS")
            con.start = item.start
            con._start_seen = True
        if item.live != UNSPECIFIED:
            if con.live != UNSPECIFIED:
                raise ParseError(
                    'duplicate assignment to "live" flag', "SEMANTICS"
                )
            con.live = item.live
        if item.archival != UNSPECIFIED:
            if con.archival != UNSPECIFIED:
                raise ParseError(
                    'duplicate assignment to "archival" flag',
                    "SEMANTICS",
                )
            con.archival = item.archival
        if item.meta != UNSPECIFIED:
            if con.meta != UNSPECIFIED:
                tok = getattr(item, "_meta_tok", None)
                where = (
                    f"{self.at(tok[1])}: '{tok[0]}': " if tok else ""
                )
                raise ParseError(
                    f"{where}a meta constraint has already been "
                    "defined",
                    "SEMANTICS",
                )
            con.meta = item.meta
        if item.sort_comparators:
            # ref graphd-ast.c:495-510: one clause per constraint
            if con.sort_comparators:
                raise ParseError(
                    "only one sort-comparator clause per constraint",
                    "SEMANTICS",
                )
            con.sort_comparators = item.sort_comparators
        con.false = con.false or item.false
        con.anchor = con.anchor or item.anchor
        con.anchor_local = con.anchor_local or item.anchor_local
        con.or_chains.extend(item.or_chains)

    # -- single clause items ----------------------------------------------

    def parse_or_con(self, con: Constraint) -> None:
        t = self.peek()
        if t.kind == L.STR:  # bare string literal = type constraint
            self.next()
            con.type_strcons.append(StrCon("=", [t.text]))
            return
        if t.kind in (L.LARR, L.RARR):
            self.parse_arrow(con)
            return
        if t.kind == L.BIARR:
            # '<->': the link touches its parent from either side
            # (engine extension, doc/gr-model.txt:176-181)
            self.next()
            con.meta = "both"
            con._meta_tok = (t.text, t.pos)
            return
        if t.kind == L.VAR:
            self.parse_variable_assignment(con)
            return
        if t.kind == L.OPAR:
            self.next()
            sub = self.parse_constraints()
            close = self.expect(L.CPAR, "')'")
            sub.src_close = close.pos
            sub.parent = con
            con.clause_order.append(("sub", len(con.subs)))
            con.subs.append(sub)
            return
        if t.kind == L.OBRC:
            # '{ ... }' groups a clause list into one unit, so an
            # or-chain can bind more than a single adjacent clause
            # (ref libgdp/gdp-parse.c sequence braces, used as
            # '{...} || {...}' in e.g. test/unit/varsort.sh)
            self.next()
            while self.peek().kind != L.CBRC:
                if self.peek().kind == L.END:
                    raise ParseError("unterminated '{...}' sequence")
                self.parse_con(con)
            self.next()
            return
        if t.kind == L.ERRTOK:
            raise L.errtok_error(self.text, t)
        if t.kind != L.ATOM:
            raise ParseError(f"unexpected token {t.text!r}")
        word = t.text.lower()
        # linkage->( ... ) subconstraint form
        if word in LINKAGES and self.peek(1).kind == L.RARR:
            self._note_linkage_kw(t)
            self.next()
            self.next()
            if self.peek().kind == L.OPAR:
                self.next()
                sub = self.parse_constraints()
                self.expect(L.CPAR, "')'")
                sub.parent = con
                sub.linkage = ("iam", word)  # parent's L == sub.guid
                con.clause_order.append(("sub", len(con.subs)))
                con.subs.append(sub)
                return
            raise ParseError(f"expected '(' after {word}->")
        handler = getattr(self, f"_con_{word.replace('-', '_')}", None)
        if handler is None:
            raise ParseError(
                f"{self.at(t.pos)}: '{t.text}': "
                "invalid constraint",
                "SEMANTICS",
            )
        handler()

    # -- arrows -----------------------------------------------------------

    def parse_arrow(self, con: Constraint) -> None:
        t = self.next()
        if t.kind == L.RARR:
            con.meta = "from"
            con._meta_tok = (t.text, t.pos)
            return
        # '<-' [linkage], unless 'linkage OP ...' follows
        nxt = self.peek()
        if nxt.kind == L.ATOM and nxt.text.lower() in LINKAGES:
            after = self.peek(1)
            if after.kind not in _STR_OPS and after.kind != L.RARR:
                self._note_linkage_kw(nxt)
                self.next()
                con.linkage = ("my", nxt.text.lower())  # my L == parent.guid
                return
        con.meta = "to"
        con._meta_tok = (t.text, t.pos)

    def parse_variable_assignment(self, con: Constraint) -> None:
        var = self.next().text
        self.expect(L.EQ, "'='")
        pat = self.parse_pattern()
        con.assignments.append((var, pat))

    # -- keyword clauses (each invoked with the keyword as lookahead) -----

    def _op_and_stringset(self) -> StrCon:
        op_tok = self.next()
        if op_tok.kind not in _STR_OPS:
            raise ParseError(f"expected operator, got {op_tok.text!r}")
        values = self.parse_stringset()
        sc = StrCon(op_tok.kind, values)
        sc._val_toks = self._last_strset_toks
        return sc

    def parse_stringset(self) -> list[str | None]:
        t = self.next()
        if t.kind == L.STR:
            self._last_strset_toks = [t]
            return [t.text]
        if t.kind == L.ATOM and t.text.lower() == "null":
            self._last_strset_toks = [t]
            return [None]
        if t.kind == L.OPAR:
            out: list[str | None] = []
            toks: list[L.Token] = []
            while True:
                t = self.next()
                if t.kind == L.CPAR:
                    self._last_strset_toks = toks
                    if not out:
                        # an empty string set means null (ref
                        # test/unit/group.sh: name=() matches the
                        # unnamed primitive, like name=null)
                        return [None]
                    return out
                if t.kind == L.STR:
                    out.append(t.text)
                    toks.append(t)
                elif t.kind == L.ATOM and t.text.lower() == "null":
                    out.append(None)
                    toks.append(t)
                else:
                    raise ParseError(f"expected string, got {t.text!r}")
        raise ParseError(
            f"{self.at(t.pos)}: '{t.text}': expected a string or '('"
        )

    def _guid_lit(self, t: L.Token) -> str | None:
        try:
            return guid_normalize(t.text)
        except ValueError:
            # malformed GUID literal maps to an 'error SYNTAX' reply
            # (message format per gdp-parse.c; test/unit/micro.sh R05)
            raise ParseError(
                f"{self.at(t.pos)}: '{t.text}': invalid GUID value",
                "SEMANTICS",
            )

    def _fail_null_guid(self, t: L.Token):
        # the `guid' field itself never allows the null token (ref
        # gdp-parse.c:655, allow_null = kind != GDP_GUIDCON_THIS;
        # test/unit/nullguid.sh: guid=null errors, guid=0 is EMPTY)
        raise ParseError(
            f"{self.at(t.pos)}: '{t.text}': null GUIDs cannot be "
            "used in this context",
            "SEMANTICS",
        )

    def _guidset(self, forbid_null: bool = False) -> list[str | None]:
        t = self.next()
        if t.kind in (L.ATOM, L.STR):
            if (
                forbid_null
                and t.kind == L.ATOM
                and t.text.lower() == "null"
            ):
                self._fail_null_guid(t)
            return [self._guid_lit(t)]
        if t.kind == L.OPAR:
            opar = t
            out: list[str | None] = []
            while True:
                t = self.next()
                if t.kind == L.CPAR:
                    if forbid_null and not out:
                        raise ParseError(
                            f"{self.at(opar.pos)}: '(': empty set "
                            "not allowed here",
                            "SEMANTICS",
                        )
                    break
                if t.kind in (L.ATOM, L.STR):
                    if (
                        forbid_null
                        and t.kind == L.ATOM
                        and t.text.lower() == "null"
                    ):
                        self._fail_null_guid(t)
                    out.append(self._guid_lit(t))
                else:
                    raise ParseError(f"expected GUID, got {t.text!r}")
            if self.command == "write" and len(out) > 1:
                raise ParseError(
                    f"{self.at(opar.pos)}: '(': multiple "
                    "GUID values are only allowed in read requests",
                    "SEMANTICS",
                )
            return out
        raise ParseError(f"expected GUID, got {t.text!r}")

    def _num(self) -> int:
        t = self.next()
        # quoted numbers are accepted (ref test sortnumber pagesize="4")
        if t.kind not in (L.ATOM, L.STR):
            raise ParseError(f"expected number, got {t.text!r}")
        try:
            return int(t.text)
        except ValueError:
            raise ParseError(f"expected number, got {t.text!r}")

    # -- patterns ---------------------------------------------------------

    def parse_pattern(self, in_sort: bool = False) -> Pattern:
        t = self.next()
        neg = False
        if t.kind in (L.MINUS, L.PLUS) and in_sort:
            neg = t.kind == L.MINUS
            t = self.next()
        if t.kind == L.OPAR:
            children = []
            while self.peek().kind != L.CPAR:
                if self.peek().kind == L.END:
                    raise ParseError("unterminated pattern list")
                children.append(self.parse_pattern(in_sort=in_sort))
            self.next()
            return Pattern("list", children=children, negated=neg)
        if t.kind == L.VAR:
            return Pattern("variable", var=t.text, negated=neg)
        if t.kind == L.STR:
            return Pattern("literal", literal=t.text, negated=neg)
        if t.kind != L.ATOM:
            raise ParseError(f"bad pattern token {t.text!r}")
        word = t.text.lower()
        if word == "literal":
            nxt = self.peek()
            if nxt.kind != L.EQ:
                raise ParseError(
                    f"{self.at(nxt.pos)}: '{nxt.text}': "
                    "missing '=' after 'literal'"
                )
            self.next()
            s = self.next()
            if s.kind not in (L.STR, L.ATOM):
                raise ParseError(f"expected literal value, got {s.text!r}")
            return Pattern("literal", literal=s.text, negated=neg)
        if word == "prev":
            word = "previous"
        if word not in _PATTERN_ATOMS:
            raise ParseError(f"unknown pattern {t.text!r}", "SEMANTICS")
        return Pattern(word, negated=neg)


# ---------------------------------------------------------------------------
# Keyword handlers.  parse_or_con stores the work-in-progress item on
# self._item before dispatching, so handlers read/write it directly.
# ---------------------------------------------------------------------------


def _make_handlers():
    P = Parser

    def handler(name):
        def deco(fn):
            setattr(P, f"_con_{name.replace('-', '_')}", fn)
            return fn

        return deco

    @handler("guid")
    def _con_guid(self):
        self.next()
        op = self.next()
        if op.kind not in (L.EQ, L.NE, L.FE):
            raise ParseError("guid accepts =, != and ~= only")
        self._item.guid.append(
            GuidCon(op.kind, self._guidset(forbid_null=True))
        )

    @handler("prev")
    def _con_prev(self):
        self.next()
        op = self.next()
        if op.kind not in (L.EQ, L.NE, L.FE):
            raise ParseError("prev accepts =, != and ~= only")
        self._item.prev.append(GuidCon(op.kind, self._guidset()))

    setattr(P, "_con_previous", P._con_prev)

    @handler("next")
    def _con_next(self):
        self.next()
        op = self.next()
        if op.kind not in (L.EQ, L.NE, L.FE):
            raise ParseError("next accepts =, != and ~= only")
        self._item.next.append(GuidCon(op.kind, self._guidset()))

    def _linkage_con(self, which):
        kw = self.next()
        self._note_linkage_kw(kw)
        op = self.next()
        if op.kind not in (L.EQ, L.NE, L.FE):
            raise ParseError(f"{which} accepts =, != and ~= only")
        self._item.links.setdefault(which, []).append(
            GuidCon(op.kind, self._guidset())
        )

    for lk in LINKAGES:
        setattr(
            P,
            f"_con_{lk}",
            (lambda which: lambda self: _linkage_con(self, which))(lk),
        )

    def _string_con(self, which):
        self.next()
        op_tok = self.peek()
        sc = self._op_and_stringset()
        if self.command == "write" and sc.op != L.EQ:
            raise ParseError(
                f"{self.at(op_tok.pos)}: '{op_tok.text}': "
                "operator cannot be used in write requests",
                "SEMANTICS",
            )
        if which != "value" and sc.op not in (L.EQ, L.NE):
            raise ParseError(
                f"{self.at(op_tok.pos)}: '{op_tok.text}': "
                "operator can only be used with 'value' constraints",
                "SEMANTICS",
            )
        if self.command == "write" and len(sc.values) > 1:
            t2 = getattr(sc, "_val_toks", [None, None])[1]
            if t2 is not None:
                # ref gdp-parse parse_stringset allow_multi (group.sh)
                raise ParseError(
                    f'{self.at(t2.pos)}: "{t2.text}": multiple values '
                    "are only allowed in read requests",
                    "SEMANTICS",
                )
            raise ParseError(f'more than one value for "{which}"')
        getattr(self._item, f"{which}_strcons").append(sc)

    for w in ("type", "name", "value"):
        setattr(
            P,
            f"_con_{w}",
            (lambda which: lambda self: _string_con(self, which))(w),
        )

    @handler("valuetype")
    def _con_valuetype(self):
        self.next()
        self.expect(L.EQ, "'='")
        t = self.next()
        # names may be quoted: datatype="string" (ref test ben.in)
        if t.kind in (L.ATOM, L.STR) and t.text.lower() in DATATYPE_CODES:
            self._item.valuetype = DATATYPE_CODES[t.text.lower()]
        else:
            try:
                n = int(t.text)
            except ValueError:
                raise ParseError(
                    f"{self.at(t.pos)}: '{t.text}': "
                    "invalid datatype",
                    "SEMANTICS",
                )
            if not 1 <= n <= 255:
                raise ParseError(
                    f"{self.at(t.pos)}: '{t.text}': "
                    "invalid datatype",
                    "SEMANTICS",
                )
            self._item.valuetype = n

    setattr(P, "_con_datatype", P._con_valuetype)

    @handler("timestamp")
    def _con_timestamp(self):
        self.next()
        op = self.next()
        if op.kind not in _STR_OPS or op.kind == L.FE:
            raise ParseError("bad timestamp operator")
        t = self.next()
        if t.kind == L.ATOM and t.text.lower() in ("newest", "oldest"):
            # generational alias: timestamp=newest == newest=0
            self._item.gens.append(GenCon(t.text.lower(), "=", 0))
            return
        if t.kind != L.ATOM:
            raise ParseError(f"bad timestamp {t.text!r}")
        from graphd_spark.model import ts_from_string

        try:
            ts_from_string(t.text)
        except ValueError:
            raise ParseError(
                f"{self.at(t.pos)}: '{t.text}': expected "
                "a timestamp value",
                "SEMANTICS",
            )
        self._item.timestamps.append(TsCon(op.kind, t.text))

    @handler("newest")
    def _con_newest(self):
        which = self.next().text.lower()
        op = self.next()
        if op.kind not in _STR_OPS or op.kind == L.FE:
            raise ParseError("bad generation operator")
        self._item.gens.append(GenCon(which, op.kind, self._num()))

    setattr(P, "_con_oldest", P._con_newest)

    @handler("live")
    def _con_live(self):
        which = self.next().text.lower()
        self.expect(L.EQ, "'='")
        t = self.expect(L.ATOM, "true/false/dontcare")
        val = {"true": TRUE, "false": FALSE, "dontcare": DONTCARE}.get(
            t.text.lower()
        )
        if val is None:
            raise ParseError(f"bad flag value {t.text!r}")
        setattr(self._item, which, val)

    setattr(P, "_con_archival", P._con_live)

    @handler("false")
    def _con_false(self):
        t = self.next()
        if self.command == "write":
            raise ParseError(
                f"{self.at(t.pos)}: '{t.text}': constraint "
                "can only be used in read requests",
                "SEMANTICS",
            )
        self._item.false = True

    @handler("node")
    def _con_node(self):
        t = self.next()
        self._item.meta = "node"
        self._item._meta_tok = (t.text, t.pos)

    @handler("any")
    def _con_any(self):
        t = self.next()
        self._item.meta = "any"
        self._item._meta_tok = (t.text, t.pos)

    @handler("optional")
    def _con_optional(self):
        t = self.next()
        if self.command == "write":
            raise ParseError(
                f"{self.at(t.pos)}: '{t.text}': constraint "
                "can only be used in read requests",
                "SEMANTICS",
            )
        self._item.count_min = 0

    @handler("atleast")
    def _con_atleast(self):
        self.next()
        self.expect(L.EQ, "'='")
        self._item.count_min = self._num()

    @handler("count")
    def _con_count(self):
        self.next()
        op = self.next()
        n = self._num()
        if op.kind == L.EQ:
            self._item.count_eq = n
        elif op.kind == L.GE:
            self._item.count_min = n
        elif op.kind == L.GT:
            self._item.count_min = n + 1
        elif op.kind == L.LE:
            self._item.count_max = n
        elif op.kind == L.LT:
            self._item.count_max = n - 1
        else:
            raise ParseError("bad count operator")

    def _page_num(self, field):
        self.next()
        self.expect(L.EQ, "'='")
        setattr(self._item, field, self._num())

    setattr(P, "_con_pagesize", lambda self: _page_num(self, "pagesize"))
    setattr(
        P,
        "_con_resultpagesize",
        lambda self: _page_num(self, "resultpagesize"),
    )
    setattr(P, "_con_countlimit", lambda self: _page_num(self, "countlimit"))
    setattr(P, "_con_start", lambda self: _page_num(self, "start"))

    @handler("sort")
    def _con_sort(self):
        self.next()
        self.expect(L.EQ, "'='")
        pat = self.parse_pattern(in_sort=True)
        keys = pat.children if pat.kind == "list" else [pat]
        self._item.sort = [SortKey(k, k.negated) for k in keys]
        self._item.sort_bare = pat.kind != "list"

    @handler("comparator")
    def _con_comparator(self):
        self.next()
        self.expect(L.EQ, "'='")
        self._item.comparator = self.expect(L.STR, "string").text

    @handler("value-comparator")
    def _con_value_comparator(self):
        # overrides matching only; sorting keeps using comparator=
        # (ref test/unit/david_8.sh)
        self.next()
        self.expect(L.EQ, "'='")
        self._item.value_comparator = self.expect(L.STR, "string").text

    @handler("sort-comparator")
    def _con_sort_comparator(self):
        self.next()
        # ref graphd-ast.c:495-510 ast_conlist_new_sortcomparator
        if self._item.sort_comparators:
            raise ParseError(
                "only one sort-comparator clause per constraint",
                "SEMANTICS",
            )
        self.expect(L.EQ, "'='")
        t = self.next()
        if t.kind == L.STR:
            self._item.sort_comparators = [t.text]
        elif t.kind == L.OPAR:
            out = []
            while self.peek().kind != L.CPAR:
                out.append(self.expect(L.STR, "string").text)
            self.next()
            self._item.sort_comparators = out
        else:
            raise ParseError("expected string after sort-comparator=")

    @handler("result")
    def _con_result(self):
        self.next()
        self.expect(L.EQ, "'='")
        self._item.result = self.parse_pattern()

    @handler("cursor")
    def _con_cursor(self):
        self.next()
        self.expect(L.EQ, "'='")
        t = self.next()
        if t.kind == L.ATOM and t.text.lower() == "null":
            # cursor=null = no cursor (ref gdp-parse; test cursor2)
            return
        if t.kind != L.STR:
            raise ParseError(
                f"{self.at(t.pos)}: '{t.text}': expected 'null' or "
                "a cursor value"
            )
        if self._item.cursor is not None:
            raise ParseError("more than one cursor=...", "SEMANTICS")
        self._item.cursor = t.text

    @handler("dateline")
    def _con_dateline(self):
        self.next()
        op = self.next()
        if op.kind not in (L.LT, L.GT):
            # ref gdp-parse parse_con_dateline (test dateline-1)
            raise ParseError(
                f"{self.at(op.pos)}: '{op.text}': expected '<' or '>'"
            )
        if self.command == "write":
            raise ParseError(
                "dateline constraint in literal", "SEMANTICS"
            )
        t = self.next()
        if t.kind not in (L.STR, L.ATOM):
            raise ParseError(
                f"{self.at(t.pos)}: '{t.text}': expected a dateline"
            )
        val = t.text
        if val.strip() == "":
            # an empty dateline has no entries: the bound is vacuous
            # (ref libgraph/graph-dateline.c; test/unit/dateline-2.sh
            # reads with dateline>"" match everything)
            return
        db, _, count = val.strip().lower().rpartition(".")
        if not (
            db and count
            and all(c in "0123456789abcdef" for c in db + count)
        ):
            raise ParseError(f'invalid dateline "{val}"')
        self._item.dateline = (op.kind, val)

    def _cluster(self, field):
        self.next()
        if self.command != "write":
            raise ParseError(f'"{field}=" only works with "write"')
        self.expect(L.EQ, "'='")
        t = self.next()
        items = []
        if t.kind == L.ATOM:
            items = [t.text.lower()]
        elif t.kind == L.OPAR:
            while self.peek().kind != L.CPAR:
                items.append(self.expect(L.ATOM, "field").text.lower())
            self.next()
        else:
            raise ParseError(f"expected field list after {field}=")
        for it in items:
            if it not in _CLUSTER_FIELDS:
                raise ParseError(f"bad {field} field {it!r}", "SEMANTICS")
        setattr(self._item, field, items)

    setattr(P, "_con_unique", lambda self: _cluster(self, "unique"))
    setattr(P, "_con_key", lambda self: _cluster(self, "key"))

    @handler("anchor")
    def _con_anchor(self):
        t = self.next()
        if self.command != "write":
            raise ParseError(
                f"{self.at(t.pos)}: '{t.text}': \"anchor\" "
                f"flag cannot be used in a \"{self.command}\" command"
            )
        self._item.anchor = True
        if self.peek().kind == L.EQ:
            self.next()
            v = self.expect(L.ATOM, "anchor mode").text.lower()
            self._item.anchor_local = v == "local"


_make_handlers()


# parse_or_con needs self._item available to handlers; patch it in:
_orig_parse_or_con = Parser.parse_or_con


def _parse_or_con(self, con):
    self._item = con
    return _orig_parse_or_con(self, con)


Parser.parse_or_con = _parse_or_con


# ---------------------------------------------------------------------------
# semantic pass (ref graphd/graphd-semantic.c:628-760)
# ---------------------------------------------------------------------------


def apply_semantics(con: Constraint, command: str = "read",
                    text: str = "") -> Constraint:
    """Defaults + meta-arrow linkage inference, applied post-order.

    The reference completes constraints bottom-up: ast_conlist_add_subcon
    runs validate_conlist when each subconstraint closes, before the
    parent completes (ref graphd/graphd-ast.c).  So for nested
    meta-arrows like ``read (-> (<- ...))`` the child's own '<-' rule
    claims its linkage first, and the parent's arrow inference only
    binds children still free.
    """
    for sub in con.subs:
        apply_semantics(sub, command, text)
    for chain in con.or_chains:
        for branch in chain:
            branch.parent = con.parent
            apply_semantics(branch, command, text)
    if con.meta == "from":
        # "->": parent is my left; first free child is my right
        if (con.linkage is None and con.parent is not None
                and "left" in con.links):
            raise ParseError(
                "cannot mix <-left and left=...", "SEMANTICS"
            )
        if con.linkage is None and con.parent is not None and "left" not in con.links:
            con.linkage = ("my", "left")
        if "right" not in con.links:
            for sub in con.subs:
                if sub.linkage is None:
                    sub.linkage = ("iam", "right")
                    break
    elif con.meta == "to":
        # "<-": parent is my right; first free child is my left
        if (con.linkage is None and con.parent is not None
                and "right" in con.links):
            raise ParseError(
                "cannot mix <-right and right=...", "SEMANTICS"
            )
        if con.linkage is None and con.parent is not None and "right" not in con.links:
            con.linkage = ("my", "right")
        if "left" not in con.links:
            for sub in con.subs:
                if sub.linkage is None:
                    sub.linkage = ("iam", "left")
                    break
    elif con.meta == "both":
        # "<->": parent is my left OR my right (undirected traversal;
        # compiles to an exploded two-key join, see compiler)
        if command == "write":
            raise ParseError(
                "'<->' cannot be used in write requests - a written "
                "link must pick a direction",
                "SEMANTICS",
            )
        if con.linkage is None and con.parent is not None:
            con.linkage = ("my", "bi")
    if con.archival == UNSPECIFIED:
        con.archival = DONTCARE
    if con.live == UNSPECIFIED:
        con.live = TRUE
    if any(g.op in ("=", "~=") and not g.guids for g in con.guid):
        con.false = True
    # a sub whose linkage neither its own arrows nor the parent's
    # inference determined cannot join (ref gdp-parse: 'unknown
    # subconstraint linkage' at the sub's closing paren)
    for sub in con.subs:
        if sub.linkage is None:
            line, col = _linecol(text, sub.src_close or 0)
            raise ParseError(
                f"on line {line}, column {col}: ')': unknown "
                "subconstraint linkage",
                "SEMANTICS",
            )
    # ref graphd-semantic.c:440-460: sort comparators attach 1:1 to
    # leading sort keys
    if con.sort_comparators:
        if not con.sort:
            raise ParseError("sortcomparators with no sort", "SEMANTICS")
        if len(con.sort_comparators) > len(con.sort):
            raise ParseError(
                "more sort comparators than sorts", "SEMANTICS"
            )
    if command == "write":
        for which, scs in (
            ("type", con.type_strcons),
            ("name", con.name_strcons),
            ("value", con.value_strcons),
        ):
            if sum(len(sc.values) for sc in scs) > 1:
                raise ParseError(f'more than one value for "{which}"')
        if con.type_strcons and con.links.get("typeguid"):
            raise ParseError(
                "can't have a type and a typeguid in the same write "
                "request.",
                "SEMANTICS",
            )
    if command == "write" and con.key is not None and any(
        g.op == "~=" for g in con.guid
    ):
        raise ParseError(
            'cannot mix "key=" and "guid~=" constraints - did you '
            'mean "unique"?'
        )
    if con.result is not None:
        _check_set_atom_depth(con.result, 0)
    if con.parent is None and command == "read":
        # page/count defaults, applied once linkage inference has
        # settled (ref graphd-semantic.c:260-315): an i-am-linked
        # subconstraint matches at most once per parent, so its page
        # sizes clamp to 1; an explicit pagesize bounds counting at
        # start + pagesize
        for c in con.walk():
            if c.linkage is not None and c.linkage[0] == "iam":
                if c.pagesize is None or c.pagesize > 1:
                    c.pagesize = 1
                if c.countlimit is not None and c.countlimit > 1:
                    c.countlimit = 1
                if c.resultpagesize is not None and c.resultpagesize > 1:
                    c.resultpagesize = 1
            if c.pagesize is not None and c.countlimit is None:
                # pagesize=0 caps the count at start+0 too — the
                # rendered count is 0 even though the emptiness probe
                # still pulls an element (probed: pagesize=0
                # result=(cursor count) answers 0 with [o:1])
                c.countlimit = c.start + c.pagesize
                # a resumed cursor shifts the implicit cap by its
                # offset (scan_prefix defaults start to the cursor
                # offset, graphd-constraint-cursor.c:52-55)
                c.countlimit_defaulted = True
    return con


_SET_VALUE_ATOMS = ("count", "cursor", "estimate", "estimate-count",
                    "iterator", "timeout")


# ---------------------------------------------------------------------------
# variable analysis (ref graphd/graphd-variable-analysis.c)
# ---------------------------------------------------------------------------


def _pattern_vars(pat) -> list[str]:
    return [p.var for p in pat.walk() if p.kind == "variable"]


def _render_pattern(pat) -> str:
    """Pattern -> source-ish text for error messages."""
    if pat.kind == "list":
        return "(" + " ".join(_render_pattern(c) for c in pat.children) + ")"
    if pat.kind == "variable":
        return pat.var
    if pat.kind == "literal":
        return f'literal="{pat.literal}"'
    return pat.kind


def _subst_pattern(pat, assigns, stack):
    """Deep-copy ``pat`` with same-level variable references replaced
    by their assignment patterns (the reference treats same-level
    variables as aliases, ref graphd-variable-analysis.c)."""
    from dataclasses import replace

    if pat.kind == "variable" and pat.var in assigns:
        if pat.var in stack:
            raise ParseError(
                f"circular assignment of {stack[0]} to itself"
            )
        inner = _subst_pattern(
            assigns[pat.var], assigns, stack + [pat.var]
        )
        if pat.negated:
            inner = replace(inner, negated=True)
        return inner
    return replace(
        pat,
        children=[_subst_pattern(c, assigns, stack) for c in pat.children],
    )


def _assigned_below(con) -> set[str]:
    out: set[str] = set()
    for c in con.walk():
        out.update(v for v, _ in c.assignments)
    return out


def _assignments_not_returned(con, inherited: frozenset = frozenset()
                              ) -> list[str]:
    """Variables assigned but not consumed by a result/sort pattern
    (or another assignment) of their own or a containing constraint
    (ref graphd-semantic.c; test/unit/varerrs.sh: `read ($foo=value)`
    is a SYNTAX error)."""
    refs: set[str] = set(inherited)
    for _, pat in con.assignments:
        refs.update(_pattern_vars(pat))
    if con.result is not None:
        refs.update(_pattern_vars(con.result))
    if con.sort:
        for sk in con.sort:
            refs.update(_pattern_vars(sk.pattern))
    out = [v for v, _ in con.assignments if v not in refs]
    frozen = frozenset(refs)
    for sub in con.subs:
        out.extend(_assignments_not_returned(sub, frozen))
    for chain in con.or_chains:
        for b in chain:
            out.extend(_assignments_not_returned(b, frozen))
    return out


def analyze_variables(con) -> None:
    """Same-level variable substitution + the reference's validation
    errors, applied post-order."""
    for sub in con.subs:
        analyze_variables(sub)
    for chain in con.or_chains:
        for b in chain:
            analyze_variables(b)

    assigns: dict[str, object] = {}
    names = [v for v, _ in con.assignments]
    for var, pat in con.assignments:
        if var not in assigns:
            assigns[var] = pat

    # 1. circular same-level assignment chains
    def _dfs(var, stack):
        pat = assigns.get(var)
        if pat is None:
            return
        for ref in _pattern_vars(pat):
            if ref in stack:
                raise ParseError(
                    f"circular assignment of {stack[0]} to itself"
                )
            if ref in assigns:
                _dfs(ref, stack + [ref])

    for var in names:
        _dfs(var, [var])

    # 2. referenced but assigned nowhere in this subtree
    referenced: list[str] = []
    for _, pat in con.assignments:
        referenced.extend(_pattern_vars(pat))
    if con.result is not None:
        referenced.extend(_pattern_vars(con.result))
    if con.sort:
        for sk in con.sort:
            referenced.extend(_pattern_vars(sk.pattern))
    below = _assigned_below(con)
    for ref in referenced:
        if ref not in assigns and ref not in below:
            raise ParseError(
                f"variable {ref} is returned, but not set in the "
                "constraint or any subconstraint"
            )

    # 3. duplicate assignment
    seen: set[str] = set()
    for v in names:
        if v in seen:
            raise ParseError(f"variable {v} is assigned to twice")
        seen.add(v)

    # 4. substitute same-level aliases into result/sort/assignments
    if assigns:
        resolved = {
            v: _subst_pattern(p, {k: q for k, q in assigns.items()
                                  if k != v}, [v])
            for v, p in assigns.items()
        }
        con.assignments = [(v, resolved[v]) for v, _ in con.assignments
                           if v in resolved]
        if con.result is not None:
            con.result = _subst_pattern(con.result, resolved, [])
        if con.sort:
            new_keys = []
            for sk in con.sort:
                pat = _subst_pattern(sk.pattern, resolved, [])
                desc = sk.descending or pat.negated
                if pat.kind == "list":
                    raise ParseError("cannot sort by nested lists.")
                sk.pattern = pat
                sk.descending = desc
                new_keys.append(sk)
            con.sort = new_keys

    # 5. result patterns nest at most two list levels
    if con.result is not None:
        _check_result_depth(con.result, 0)


def _check_result_depths(con) -> None:
    """analyze_variables' step 5 alone, for variable-free requests
    (post-order over subs and or-branches like the full pass)."""
    for sub in con.subs:
        _check_result_depths(sub)
    for chain in con.or_chains:
        for b in chain:
            _check_result_depths(b)
    if con.result is not None:
        _check_result_depth(con.result, 0)


def _check_result_depth(pat, depth: int) -> None:
    if pat.kind == "list":
        if depth >= 2:
            raise ParseError(
                f'result expression "{_render_pattern(pat)}" nests '
                "lists more than two levels deep",
                "SEMANTICS",
            )
        if sum(1 for c in pat.children if c.kind == "list") > 1:
            raise ParseError(
                "can only have one nested list per result list - "
                "(x (y)) and ((x y)) work, ((x) (y)) doesn't."
            )
        for c in pat.children:
            _check_result_depth(c, depth + 1)


def _check_nested_assignments(con) -> None:
    """A variable assigned in a constraint AND in a nested
    subconstraint is a SYNTAX error (graphd-semantic.c:150-162: the
    check walks con_parent from the assigning constraint).  Or-branch
    boundaries stop the walk — a branch has no con_parent link, so
    root+branch, branch+branch, and root+branch-sub pairs are all
    legal (the root assignment simply wins; probed against the
    reference binary) while branch + that branch's own sub errors.
    Post-order, matching the reference's per-')'-completion checks."""
    for sub in con.subs:
        _check_nested_assignments(sub)
    for chain in con.or_chains:
        for b in chain:
            _check_nested_assignments(b)
    for v, _ in con.assignments:
        anc = con.parent
        while anc is not None:
            if any(v2 == v for v2, _ in anc.assignments):
                raise ParseError(
                    f"variable {v} is assigned to twice in nested "
                    "constraints"
                )
            anc = anc.parent


def _gencon_min(g: GenCon) -> int:
    """gencon_min of one of our GenCon entries (ref
    graphd_generational_constraint)."""
    if g.op in ("=", ">="):
        return g.n
    if g.op == ">":
        return g.n + 1
    return 0  # <, <=


def _normalize_version_pointers(con) -> None:
    """``prev=null``/``prev~=null`` rewrite to ``oldest=0`` and
    ``next=null``/``next~=null`` to ``newest=0`` — the pointer
    constraint is CONSUMED and the generational one takes its place
    (graphd_guid_constraint_convert,
    graphd-guid-constraint.c:334-347 previous / :63-67,138-141
    next).  With a generational constraint now assigned, the
    newest=0 default no longer applies, which both match semantics
    and the signed cursor envelope observe (the envelope signs
    ``newest=*`` for an unconstrained newest).  A conflicting
    pre-existing bound (min > 0) makes the constraint false; bounds
    with min == 0 are REPLACED.  Only the all-null forms rewrite —
    sets carrying real guids keep pointer semantics."""
    def one(node, field, cons):
        kept, changed = [], False
        for gc in cons:
            if gc.op in ("=", "~=") and all(
                g is None for g in gc.guids
            ):
                changed = True
                prior = [
                    g for g in node.gens if g.field == field
                ]
                if all(_gencon_min(g) == 0 for g in prior):
                    node.gens = [
                        g for g in node.gens if g.field != field
                    ] + [GenCon(field, "=", 0)]
                else:
                    node.false = True
                # the consumed pointer stays on the constraint as an
                # EMPTY include set — it no longer matches anything
                # (acceptance ignores empty sets) but still signs as
                # "previous=()" / "next=()" in the cursor envelope
                # (guidcon_convert_previous returns without clearing
                # guidcon_include_valid; signature_guid_set's
                # gs_n == 0 branch)
                kept.append(GuidCon("=", []))
            else:
                kept.append(gc)
        return kept, changed

    for node in con.walk():
        had_gens = bool(node.gens)
        changed = False
        if node.prev:
            node.prev, c = one(node, "oldest", node.prev)
            changed = changed or c
        if node.next:
            node.next, c = one(node, "newest", node.next)
            changed = changed or c
        # NOTE deliberately NO newest=0 default here: the conversion
        # runs BEFORE the generational default
        # (graphd_guid_constraint_convert: convert at :429, default
        # at :493), so a converted oldest/newest suppresses the
        # default exactly like an explicit one — prev=null implies
        # oldest=0 with newest UNCONSTRAINED
        _ = (had_gens, changed)


def _check_contents_usage(con) -> None:
    """An explicit ``contents`` pattern needs subconstraints (ref
    test/unit/nick1.sh).  Subconstraints inside or-branches count:
    the reference keeps branch subs on the prototype's con_head, so
    ``({a (<-left)} | {b}) result=((contents))`` is legal
    (graphd-constraint.c:100 checks con_head)."""
    has_subs = bool(con.subs) or any(
        b.subs for chain in con.or_chains for b in chain
    )
    if con.result is not None and not has_subs:
        if any(
            p.kind == "contents" and not p.contents_only
            for p in con.result.walk()
        ):
            raise ParseError(
                'can\'t use "contents" return instruction in template '
                "without contained templates",
                "SEMANTICS",
            )
    for sub in con.subs:
        _check_contents_usage(sub)
    for chain in con.or_chains:
        for b in chain:
            _check_contents_usage(b)


def _check_set_atom_depth(pat, depth: int) -> None:
    """Set-scoped atoms live at most one parenthesis deep (ref
    graphd-constraint-clause.c result checking)."""
    if pat.kind == "list":
        for c in pat.children:
            _check_set_atom_depth(c, depth + 1)
    elif pat.kind in _SET_VALUE_ATOMS and depth > 1:
        raise ParseError(
            "'count', 'cursor', 'estimate', 'estimate-count', "
            "'iterator', or 'timeout' can only appear inside at most "
            "one set of parentheses"
        )


# ---------------------------------------------------------------------------
# request line parsing
# ---------------------------------------------------------------------------

_COMMANDS = {
    "read",
    "write",
    "dump",
    "restore",
    "set",
    "status",
    "sync",
    "iterate",
    "verify",
    "replica",
    "replica-write",
    "smp",
    "crash",
}

#: loglevel vocabulary (ref libcl/cl-loglevel.c:17-41)
_LOGLEVELS = {
    "ultra", "verbose", "spew", "debug", "detail", "info", "fail",
    "overview", "operator-error", "operator", "error", "fatal",
}

#: request modifiers (ref doc/gr-protocol.txt:171-262)
_MODIFIERS = {
    "timeout",
    "id",
    "dateline",
    "asof",
    "cost",
    "loglevel",
    "heatmap",
}


def parse_request(line: str, toks=None) -> Request:
    p = Parser(line, toks=toks)
    cmd_tok = p.next()
    if cmd_tok.kind != L.ATOM:
        raise ParseError(
            f"{p.at(cmd_tok.pos)}: '{cmd_tok.text}': "
            "invalid start of a request"
        )
    cmd = cmd_tok.text.lower()
    if cmd not in _COMMANDS:
        raise ParseError(
            f"{p.at(cmd_tok.pos)}: '{cmd_tok.text}': no such request"
        )
    req = Request(command=cmd)
    # request modifiers: atom '=' (atom|string) before the template
    while (
        p.peek().kind == L.ATOM
        and p.peek().text.lower() in _MODIFIERS
        and p.peek(1).kind == L.EQ
    ):
        name = p.next().text.lower()
        p.next()
        val = p.next()
        if val.kind not in (L.ATOM, L.STR, L.OPAR):
            raise ParseError(f"bad {name}= value")
        if val.kind == L.OPAR:  # e.g. asof=(...) — keep raw tokens
            depth = 1
            parts = []
            while depth:
                t = p.next()
                if t.kind == L.END:
                    raise ParseError(f"bad {name}= value")
                if name == "loglevel" and t.kind == L.ATOM and (
                    t.text.lower() not in _LOGLEVELS
                ):
                    # ref libcl/cl-loglevel.c vocabulary
                    # (test/unit/micro.sh R09)
                    raise ParseError(
                        f"{p.at(t.pos)}: '{t.text}': "
                        "invalid loglevel value"
                    )
                if t.kind == L.OPAR:
                    depth += 1
                elif t.kind == L.CPAR:
                    depth -= 1
                    if not depth:
                        break
                parts.append(t.text)
            req.modifiers[name] = " ".join(parts)
            req.modifier_seq.append((name, req.modifiers[name]))
        else:
            req.modifiers[name] = val.text
            req.modifier_seq.append((name, val.text))
        continue
    if cmd in ("read", "write", "iterate", "verify"):
        p.command = cmd
        p.expect(L.OPAR, "'('")
        con = p.parse_constraints()
        p.expect(L.CPAR, "')'")
        req.constraint = apply_semantics(con, cmd, p.text)
        if req.constraint.linkage is not None:
            kind, lk = req.constraint.linkage
            arrow = f"<-{lk}" if kind == "my" else f"{lk}->"
            raise ParseError(
                f"can't use ({arrow} ..) on the outermost constraint - "
                f"do you mean {lk}=GUID?",
                "SEMANTICS",
            )
        if cmd == "read":
            _check_contents_usage(req.constraint)
            # the variable passes walk every pattern in the tree; a
            # request with no '$var' token anywhere (the common
            # serving shape) has nothing for them to find or raise —
            # except analyze_variables' step 5 (result-list nesting
            # depth), which runs standalone below
            if not any(t.kind == L.VAR for t in p.toks):
                _check_result_depths(req.constraint)
            else:
                # collect assigned-but-never-returned violations
                # BEFORE alias substitution erases same-level
                # references, but report them only after
                # analyze_variables had its chance to raise (the
                # reference orders returned-but-not-set and
                # assigned-twice first; test/unit/sort7.sh)
                unreturned = _assignments_not_returned(req.constraint)
                analyze_variables(req.constraint)
                if unreturned:
                    raise ParseError(
                        f"variable {unreturned[0]} is assigned, but "
                        "not returned in this or any containing "
                        "constraint"
                    )
                _check_nested_assignments(req.constraint)
            _normalize_version_pointers(req.constraint)
    else:
        # leave remaining tokens raw for the command dispatcher
        while p.peek().kind != L.END:
            req.rest.append(p.next())
    return req
