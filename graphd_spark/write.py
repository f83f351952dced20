"""The write pipeline: literal constraint tree -> appended primitives.

Mirrors the reference's staged write state machine (ref
graphd/graphd-write.c:596-782): before anything is written, embedded
reads annotate the tree —

1. **anchor** constraints must match exactly one existing primitive
   (else ``EMPTY "anchor constraint not found"``); the whole matched
   subtree's GUIDs are reused, and a matched child's linkage can
   resolve its *parent* (ref graphd-write-annotate-anchor.c; see
   test/unit/anchor.out.exp where '(<-left ... anchor)' pins the root);
2. **unique** constraints fail with ``EXISTS`` if any primitive
   matches the listed fields (ref graphd-write-check-unique.c);
3. **key** constraints upsert: match by the key fields; identical
   explicit fields reuse the old primitive, differing ones version it
   (ref graphd-write-annotate-keyed.c);

then primitives are allocated in dependency order — a link's endpoints
before the link:

- subconstraints the parent points at (``("iam", L)``) are written
  *before* the parent,
- subconstraints pointing at the parent (``("my", L)``) after it,

reproducing reference GUID assignment byte-for-byte (see
test/unit/vars.out.exp).  Type strings bind (creating type primitives
on demand) before a node's children (test/unit/version2.out.exp).

Embedded matches run driver-side over the store's point indexes — the
same shape as the reference's hmap lookups; the analytical read path
never comes through here.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from itertools import islice
from typing import Iterable, Iterator

from graphd_spark.comparators import write_value_match
from graphd_spark.gql.ir import Constraint, LINKAGES
from graphd_spark.model import DATATYPE_NAMES, Primitive, ts_from_string
from graphd_spark.store import PrimitiveStore
from graphd_spark.typesys import TypeSystem


def _dedup_by_id(prims: Iterable[Primitive]) -> Iterator[Primitive]:
    """Drop consecutive duplicates from an id-ordered primitive
    stream (the exact-index and widened-scan branches of a value
    lookup both yield the same primitive)."""
    last = None
    for p in prims:
        if last is None or p.id != last:
            yield p
        last = p.id


class WriteError(Exception):
    def __init__(self, code: str, message: str):
        super().__init__(message)
        self.code = code
        self.message = message


@dataclass
class WriteNode:
    """Reply-shaped result: one primitive GUID + child results."""

    guid: str
    children: list["WriteNode"] = field(default_factory=list)
    #: the template node this reply answers (write result= shaping)
    con: object = None


@dataclass
class Match:
    prim: Primitive
    subs: dict[int, "Match"] = field(default_factory=dict)


def _single(values, what: str) -> str | None:
    if len(values) != 1:
        raise WriteError(
            "SEMANTICS", f"multiple {what} values in a write template"
        )
    return values[0]


class WriteExecutor:
    def __init__(self, store: PrimitiveStore, types: TypeSystem):
        self.store = store
        self.types = types
        #: id(con) -> reused GUID (anchor/key matches)
        self.resolved: dict[int, str] = {}
        #: id(con) -> GUID of the primitive this node versions (key=)
        self.version_of: dict[int, str] = {}

    def execute(self, con: Constraint) -> WriteNode:
        """Staged pipeline per graphd-write.c:596-782: validate ->
        version targets -> anchors -> keys -> pointed reuse -> unique
        checks -> allocation."""
        self._normalize_prev_next(con)
        self._validate(con)
        self._check_tag_fields(con)
        self._check_versioning(con)
        self._annotate_anchors(con)
        self._annotate_keys(con)
        self._annotate_pointed(con)
        self._check_unique(con)
        return self._write_node(con, parent_guid=None)

    def _normalize_prev_next(self, con: Constraint) -> None:
        """previous=/~= in a write versions its target exactly like
        guid=/~= (null/empty forms are no-ops); next= can never be
        written — the successor doesn't exist yet (ref
        test/unit/guid2.sh)."""
        from graphd_spark.gql.ir import GuidCon

        for gc in con.next:
            for g in gc.guids:
                if g is not None:
                    raise WriteError(
                        "SEMANTICS",
                        f"can't use NEXT{gc.op}{g} in a write request!",
                    )
        con.next = []
        for gc in con.prev:
            nonnull = [g for g in gc.guids if g is not None]
            if nonnull:
                con.guid.append(GuidCon(gc.op, nonnull))
        con.prev = []
        for sub in con.subs:
            self._normalize_prev_next(sub)

    def _check_versioning(self, con: Constraint) -> None:
        """guid=/guid~= targets must exist (and be newest for '=')
        before any other annotation runs (ref anchor2.out.exp: the
        OUTDATED error wins over the anchor EMPTY).  An opportunistic
        guid~= whose lineage head already equals the template reuses
        it instead of versioning (ref anchor2.sh last write).  guid=
        on an anchored node is a match pin, not versioning."""
        if con.guid and not con.anchor:
            gc = con.guid[0]
            target = _single(gc.guids, "guid")
            if target is None:
                raise WriteError("SEMANTICS", "cannot version the null GUID")
            old = self.store.get(target)
            if old is None:
                raise WriteError(
                    "SEMANTICS",
                    f"not found: cannot read predecessor record {target}",
                )
            if gc.op == "=" and not self.store.is_newest(target):
                raise WriteError(
                    "OUTDATED", f'"{target}" has been versioned'
                )
        for sub in con.subs:
            self._check_versioning(sub)

    # -- validation --------------------------------------------------------

    def _validate(self, con: Constraint) -> None:
        if con.or_chains:
            raise WriteError(
                "SYNTAX", "\"|\" cannot be used in a \"write\" command"
            )
        for sc in con.type_strcons + con.name_strcons + con.value_strcons:
            if sc.op != "=":
                raise WriteError(
                    "SYNTAX", "write templates only accept \"=\" literals"
                )
        # explicit linkage GUIDs must resolve (ref graphd-write.c via
        # pdb linkage checks; test/unit/link2.sh: dangling left= fails
        # before any id is burned)
        for lk in LINKAGES:
            for gc in con.links.get(lk, ()):
                if gc.op != "=":
                    continue
                for g in gc.guids:
                    if g is not None and self.store.get(g) is None:
                        # the null guid prints "0"
                        # (libgraph/graph-guid.c graph_guid_to_string)
                        shown = "0" if set(g) == {"0"} else g
                        # the typeguid linkage displays as "type"
                        # (pdb_linkage_to_string, libpdb/pdb-linkage.c)
                        word = "type" if lk == "typeguid" else lk
                        raise WriteError(
                            "SEMANTICS", f"{word}={shown}: not found"
                        )
        for sub in con.subs:
            if sub.linkage is None:
                raise WriteError(
                    "SEMANTICS",
                    "subconstraint in a write template has no linkage",
                )
            self._validate(sub)

    def _check_tag_fields(self, con: Constraint) -> None:
        """Every unique=/key= field must be specified in the template
        (graphd_unique_parse_check, graphd-unique.c:122;
        graphd_key_parse_check, graphd-key.c:617) — post-order, the
        reference checks each constraint as its ')' completes.
        Linkages count as specified via the my-linkage to the parent,
        an explicit linkage GUID, or an iam subconstraint
        (graphd_constraint_linkage_pattern, graphd-constraint.c:25);
        typeguid is exempt when a type string is given."""
        for sub in con.subs:
            self._check_tag_fields(sub)
        pat = set()
        if con.linkage is not None and con.linkage[0] == "my":
            pat.add(con.linkage[1])
        for lk in LINKAGES:
            if any(gc.op == "=" for gc in con.links.get(lk, ())):
                pat.add(lk)
        for sub in con.subs:
            if sub.linkage is not None and sub.linkage[0] == "iam":
                pat.add(sub.linkage[1])
        for tag, is_key in ((con.unique, False), (con.key, True)):
            if tag is None:
                continue
            fields = set(tag)
            # PDB_LINKAGE enum order (pdb.h:77-105)
            for lk in ("typeguid", "right", "left", "scope"):
                if lk in fields and lk not in pat:
                    if lk == "typeguid" and con.type_strcons:
                        continue
                    if is_key:
                        raise WriteError(
                            "SEMANTICS",
                            f"{lk} is used as a key without "
                            f"specifying a {lk} linkage for the "
                            "constraint.",
                        )
                    raise WriteError(
                        "SEMANTICS",
                        f"request for {lk} uniqueness without "
                        f"specifying a {lk}?",
                    )
            missing = []
            if (
                "datatype" in fields or "valuetype" in fields
            ) and con.valuetype is None:
                missing.append("data- or valuetype")
            if "timestamp" in fields and not con.timestamps:
                missing.append("timestamp")
            if "name" in fields and not con.name_strcons:
                missing.append("name")
            if "value" in fields and not con.value_strcons:
                missing.append("value")
            if missing:
                what = missing[0]
                if is_key:
                    raise WriteError(
                        "SEMANTICS",
                        f"{what} is used as a key without specifying "
                        f"a {what} in the constraint",
                    )
                raise WriteError(
                    "SEMANTICS",
                    f"request for {what} uniqueness without "
                    f"specifying a {what}?",
                )

    # -- template field extraction ----------------------------------------

    def _literal_fields(self, con: Constraint) -> dict:
        """The explicitly-specified fields of a write constraint."""
        out: dict = {}
        if con.value_strcons:
            out["value"] = _single(con.value_strcons[0].values, "value")
        if con.name_strcons:
            out["name"] = _single(con.name_strcons[0].values, "name")
        if con.type_strcons:
            tname = _single(con.type_strcons[0].values, "type")
            # read-only resolution: matching never creates types
            out["typeguid"] = (
                self.types.resolve(tname) if tname is not None else None
            )
            out["__type_unresolved"] = (
                tname is not None and out["typeguid"] is None
            )
        for lk in LINKAGES:
            for gc in con.links.get(lk, ()):
                if gc.op != "=":
                    raise WriteError(
                        "SYNTAX",
                        f"\"{lk}\" in a write template only accepts \"=\"",
                    )
                out[lk] = _single(gc.guids, lk)
        if con.valuetype is not None:
            out["datatype"] = con.valuetype
        return out

    # -- embedded matching (the write path's point reads) ------------------

    def _match_tree(
        self,
        con: Constraint,
        parent_prim: Primitive | None,
        fields: set[str] | None = None,
        local_only: bool = False,
        require_nonnull: set[str] | None = None,
    ) -> Iterator[Match]:
        """Existing primitives matching this constraint (and subs),
        LAZILY in id order.

        A generator so every consumer (unique EXISTS test, key
        collision, anchor 0/1/many) stops at its first (or second)
        match instead of materializing the full match set — a key= or
        unique= write against a value shared by 10^6 primitives pulls
        candidates in store-bounded batches (store.POINT_LOOKUP_BOUND)
        and short-circuits at the first hit, never collecting the hot
        bin to the driver (ref graphd-write-annotate.c iterates its
        hmap bin candidate-by-candidate the same way)."""
        lits = self._literal_fields(con)
        if lits.pop("__type_unresolved", False):
            return  # unknown type name matches nothing

        cands: "Iterable[Primitive]"
        kind_lk = con.linkage or (None, None)
        if con.guid and con.guid[0].op == "=":
            # guid= on an anchored node pins the match
            # (ref test/unit/anchor3.sh GUID=... anchor=local)
            t = con.guid[0].guids[0]
            p = self.store.get(t) if t else None
            cands = [p] if p is not None else []
        elif parent_prim is not None and kind_lk[0] == "iam":
            # parent points at the match: direct lookup
            g = getattr(parent_prim, kind_lk[1])
            p = self.store.get(g) if g else None
            cands = [p] if p is not None else []
        elif (
            "value" in lits
            and lits["value"] is not None
            and (fields is None or "value" in fields)
        ):
            # candidate enumeration must come from a field the match
            # actually CHECKS: a key=(name) write's value= narrows
            # nothing (write-fuzz seeds 0-40 caught value-indexed
            # enumeration hiding every name-keyed match).
            # comparator-normalized forms hash apart driver-side, so
            # widen with a lazy scan for lenient comparators
            # ("A B" ~ "A  B"); both streams are id-ordered, so a
            # heap-merge + id-dedup preserves id order WITHOUT
            # materializing either stream
            exact = self.store.find_by_value(lits["value"])
            widened = (
                p
                for p in self.store.iter_all()
                if p.value is not None
                and write_value_match(con.value_comparator or con.comparator,
                             lits["value"], p.value)
            )
            cands = _dedup_by_id(
                heapq.merge(exact, widened, key=lambda p: p.id)
            )
        elif (
            "name" in lits
            and lits["name"] is not None
            and (fields is None or "name" in fields)
        ):
            cands = self.store.find_by_name(lits["name"])
        else:
            cands = self.store.iter_all()

        # linkage pointers already resolved on pointee subs narrow the
        # match (unique clusters span connected primitives, ref
        # doc/gr-protocol.txt:661-743)
        for sub in con.subs:
            if (
                sub.linkage
                and sub.linkage[0] == "iam"
                and id(sub) in self.resolved
            ):
                lits.setdefault(
                    sub.linkage[1], self.resolved[id(sub)]
                )

        check = fields  # None = all specified fields
        for p in cands:
            if p is None or not p.live or not self.store.is_newest(p.guid):
                continue
            if not self._prim_matches(p, con, lits, parent_prim, check):
                continue
            if require_nonnull and not all(
                self._pointer_alive(getattr(p, lk))
                for lk in require_nonnull
            ):
                # a keyed linkage expressed as a subconstraint needs
                # the candidate to HAVE that pointer (keyburn2 §1.1:
                # a right-less Mike is no key match for key=(name
                # right) right->(...)), and the pointer must aim at a
                # LIVE NEWEST primitive — a superseded target
                # disqualifies the candidate even though a mismatching
                # live target merely versions it (keyburn2 §1.2 vs
                # write-fuzz seed 283, probed: versioning the old
                # target makes the keyed write create fresh)
                continue
            m = Match(prim=p)
            ok = True
            if not local_only:
                for i, sub in enumerate(con.subs):
                    sub_m = next(self._match_tree(sub, p), None)
                    if sub_m is None:
                        ok = False
                        break
                    m.subs[i] = sub_m
            if ok:
                yield m

    def _pointer_alive(self, guid) -> bool:
        """True when a raw pointer references a live, newest primitive
        (the keyed-match pointer requirement; see require_nonnull)."""
        if guid is None:
            return False
        tp = self.store.get(guid)
        return (
            tp is not None and tp.live and self.store.is_newest(tp.guid)
        )

    def _prim_matches(
        self,
        p: Primitive,
        con: Constraint,
        lits: dict,
        parent_prim: Primitive | None,
        fields: set[str] | None,
    ) -> bool:
        def want(f):
            return fields is None or f in fields

        if want("value") and "value" in lits:
            comp = con.value_comparator or con.comparator
            if not write_value_match(comp, lits["value"], p.value):
                return False
        if want("name") and "name" in lits:
            a, b = lits["name"], p.name
            if (a is None) != (b is None):
                return False
            if a is not None and a.lower() != b.lower():
                return False
        if want("typeguid") and "typeguid" in lits:
            if p.typeguid != lits["typeguid"]:
                return False
        for lk in LINKAGES:
            if lk == "typeguid":
                continue
            if want(lk) and lk in lits:
                if getattr(p, lk) != lits[lk]:
                    return False
        if want("datatype") and "datatype" in lits:
            if p.datatype != lits["datatype"]:
                return False
        if want("timestamp") and con.timestamps:
            tc = con.timestamps[0]
            try:
                if p.timestamp != ts_from_string(tc.text):
                    return False
            except ValueError:
                return False
            # the reference's match is a READ, so timestamp bounds
            # ALSO compile to the id range of graphd_timestamp_to_id's
            # bsearch (graphd-read.c:300-420) — with explicit
            # out-of-order stamps a newest duplicate beyond the
            # boundary id is invisible and unique=(timestamp) creates
            # anyway (write-fuzz seed 223 vs the reference binary)
            ts = ts_from_string(tc.text)
            lo = self.store.timestamp_to_id(ts, "ge")
            hi = self.store.timestamp_to_id(ts, "le")
            if lo is None or hi is None:
                return False
            if not (lo <= p.id <= hi):
                return False
        if parent_prim is not None and con.linkage is not None:
            kind, lk = con.linkage
            if kind == "my":
                # a keyed/unique 'my' sub matches GLOBALLY unless its
                # linkage is part of the tag set — the link between
                # cluster members joins the match only when covered
                # by the key/unique fields (doc/gr-protocol.txt
                # 6.1.9.2/6.1.10.1; probed: key=(value) reuses an
                # existing match whose pointer aims elsewhere, and no
                # link is written)
                if (fields is None or lk in fields) and getattr(
                    p, lk
                ) != parent_prim.guid:
                    return False
            else:  # iam: parent.lk == p.guid, pre-filtered above
                if getattr(parent_prim, lk) != p.guid:
                    return False
        elif con.linkage is not None and con.linkage[0] == "my":
            # linkage exists but the parent is not yet bound: the
            # match must at least have the pointer — only when the
            # linkage is in the tag set (see above)
            if (
                fields is None or con.linkage[1] in fields
            ) and getattr(p, con.linkage[1]) is None:
                return False
        return True

    # -- pass 1: anchors ---------------------------------------------------

    def _annotate_anchors(self, con: Constraint) -> None:
        if con.anchor and id(con) not in self.resolved:
            parent_prim = self._parent_context(con)
            matches = []
            for m in self._match_tree(
                con, parent_prim, local_only=con.anchor_local
            ):
                # an anchored 'my' sub under an unresolved parent
                # matches in CONTEXT: the candidate's pointer target
                # must satisfy the parent template (probed:
                # '(<-right anchor value="a-b")' under value="cherry
                # pie" misses an a-b link pointing at a null-value
                # prim, while an empty parent template matches it)
                if (
                    parent_prim is None
                    and con.parent is not None
                    and con.linkage is not None
                    and con.linkage[0] == "my"
                    and id(con.parent) not in self.resolved
                ):
                    tg = getattr(m.prim, con.linkage[1])
                    tp = self.store.get(tg) if tg else None
                    if (
                        tp is None
                        or not tp.live
                        or not self.store.is_newest(tp.guid)
                    ):
                        continue
                    plits = self._literal_fields(con.parent)
                    if plits.pop("__type_unresolved", False):
                        continue
                    if not self._prim_matches(
                        tp, con.parent, plits, None, None
                    ):
                        continue
                matches.append(m)
                if len(matches) == 2:
                    break
            if len(matches) != 1:
                raise WriteError("EMPTY", "anchor constraint not found")
            self._adopt_match(con, matches[0])
            # a matched child's linkage resolves an unbound parent
            # (ref anchor.out.exp: '(<-left ... anchor)' pins the root)
            if (
                con.parent is not None
                and id(con.parent) not in self.resolved
                and con.linkage is not None
                and con.linkage[0] == "my"
            ):
                pg = getattr(matches[0].prim, con.linkage[1])
                if pg is not None:
                    self.resolved[id(con.parent)] = pg
        for sub in con.subs:
            self._annotate_anchors(sub)

    def _adopt_match(self, con: Constraint, m: Match) -> None:
        self.resolved[id(con)] = m.prim.guid
        for i, sub in enumerate(con.subs):
            if i in m.subs:
                self._adopt_match(sub, m.subs[i])

    # -- pass 2/3: unique + keys ------------------------------------------

    def _parent_prim(self, con: Constraint):
        if con.parent is not None and id(con.parent) in self.resolved:
            return self.store.get(self.resolved[id(con.parent)])
        return None

    def _parent_context(self, con: Constraint):
        """Parent primitive for matching: resolved, or — for a parent
        that versions a lineage — that lineage's head (an anchored
        child of a guid~= write matches against the current version,
        ref anchor2.sh)."""
        p = self._parent_prim(con)
        if p is not None:
            return p
        parent = con.parent
        if parent is not None and parent.guid:
            t = parent.guid[0].guids[0]
            if t is not None:
                return self.store.newest_of(t)
        return None

    def _annotate_keys(self, con: Constraint) -> None:
        if (
            con.key is not None
            and id(con) not in self.resolved
            and id(con) not in self.version_of
        ):
            # key=() binds with ZERO fields: every live newest
            # primitive matches the key part, so the first one in id
            # order is versioned/reused into the template (probed:
            # 'write (value="c" key=())' versions the store's first
            # newest primitive; chris7's '(name="new" key=())' root
            # versions the previous root).  keyburn6's fresh create
            # happens because its keyed LINK makes the cluster read
            # fail, not because the empty key skips binding.
            fields = self._cluster_fields(con.key)
            # a keyed iam sub whose linkage is part of its keyed
            # parent's key binds only through the parent's old
            # pointer — never globally (keyburn2 §5.3-§5.6: a failed
            # parent key creates a fresh child even when a global
            # name match exists; §4.3's unkeyed connection still
            # binds globally)
            parent = con.parent
            if (
                parent is not None
                and con.linkage is not None
                and con.linkage[0] == "iam"
                and parent.key
                and con.linkage[1] in self._cluster_fields(parent.key)
            ):
                old_parent = None
                if id(parent) in self.resolved:
                    old_parent = self.store.get(
                        self.resolved[id(parent)]
                    )
                elif id(parent) in self.version_of:
                    old_parent = self.store.get(
                        self.version_of[id(parent)]
                    )
                if old_parent is not None:
                    for m in self._match_tree(
                        con, old_parent, fields, local_only=True
                    ):
                        if self._differs(con, m.prim, exclude=fields):
                            self.version_of[id(con)] = m.prim.guid
                        else:
                            self.resolved[id(con)] = m.prim.guid
                        break
                for sub in con.subs:
                    self._annotate_keys(sub)
                return
            # a 'my' sub whose OWN key covers its linkage joins the
            # parent's cluster the other way around — IF the parent is
            # itself keyed (clusters span "primitives that each have
            # keys", doc/gr-protocol.txt 6.1.10.1): the match must
            # point at the parent's OLD primitive, so a failed parent
            # key means a fresh child.  An unkeyed (or key=()) parent
            # stays outside the cluster and the covered link matches
            # any non-null pointer (chris7: key=(right value) under
            # key=() versions a global match, pointing it at the new
            # parent)
            if (
                parent is not None
                and parent.key is not None  # key=() still clusters
                and con.linkage is not None
                and con.linkage[0] == "my"
                and con.linkage[1] in fields
            ):
                old_parent = None
                if id(parent) in self.resolved:
                    old_parent = self.store.get(
                        self.resolved[id(parent)]
                    )
                elif id(parent) in self.version_of:
                    old_parent = self.store.get(
                        self.version_of[id(parent)]
                    )
                if old_parent is not None:
                    for m in self._match_tree(
                        con, old_parent, fields, local_only=True
                    ):
                        if self._differs(con, m.prim, exclude=fields):
                            self.version_of[id(con)] = m.prim.guid
                        else:
                            self.resolved[id(con)] = m.prim.guid
                        break
                for sub in con.subs:
                    self._annotate_keys(sub)
                return
            # keyed linkages written as iam subconstraints: the key
            # requires the pointer to exist, not the target to match
            # (ref graphd-write-annotate-keyed.c; keyburn2 §1.1/§1.2)
            iam_subs = [
                sub for sub in con.subs
                if sub.linkage is not None and sub.linkage[0] == "iam"
            ]
            # 'my' subs whose OWN key covers their linkage are cluster
            # MEMBERS: the cluster matches all-or-nothing — a parent
            # candidate with no matching keyed child is rejected
            # entirely, even if the parent fields alone match (probed:
            # key=(value) + (<-left value="x" key=(value left)) with no
            # "x" child creates BOTH fresh despite a parent match)
            cluster_subs = [
                sub for sub in con.subs
                if sub.key is not None
                and sub.linkage is not None
                and sub.linkage[0] == "my"
                and sub.linkage[1] in self._cluster_fields(sub.key)
            ]
            # keyed iam subs whose connection is in the PARENT's key
            # are cluster members too (the parent holds the pointer);
            # unkeyed ones keep keyburn2's pointer-must-exist +
            # version-on-target-change semantics below
            iam_cluster = [
                sub for sub in iam_subs
                if sub.key is not None and sub.linkage[1] in fields
            ]
            cluster_subs = cluster_subs + iam_cluster
            m0 = None
            sub_prims: dict = {}
            for m in self._match_tree(
                con, self._parent_prim(con), fields, local_only=True,
                require_nonnull={
                    s.linkage[1] for s in iam_subs
                    if s.linkage[1] in fields
                    and id(s) not in self.resolved
                },
            ):
                sub_prims = {}
                ok = True
                for sub in cluster_subs:
                    sfields = self._cluster_fields(sub.key)
                    sm = next(self._match_tree(
                        sub, m.prim, sfields, local_only=True
                    ), None)
                    if sm is None:
                        ok = False
                        break
                    sub_prims[id(sub)] = sm.prim
                if ok:
                    m0 = m
                    break
            if m0 is not None:
                old = m0.prim
                for sub in cluster_subs:
                    sprim = sub_prims[id(sub)]
                    sfields = self._cluster_fields(sub.key)
                    if self._differs(sub, sprim, exclude=sfields):
                        self.version_of[id(sub)] = sprim.guid
                    else:
                        self.resolved[id(sub)] = sprim.guid
                version = self._differs(con, old, exclude=fields)
                # a versioned iam cluster member changes the parent's
                # pointer, so the parent versions with it
                version = version or any(
                    id(s) in self.version_of for s in iam_cluster
                )
                if not version:
                    # every UNKEYED iam pointer must keep its target:
                    # if the old target no longer satisfies the sub
                    # template the pointer changes to a fresh node and
                    # the keyed match versions (keyburn2
                    # §1.2/§2.1/§2.2: Elke -> Anke, or null -> Anke,
                    # version Mike)
                    for sub in iam_subs:
                        if sub in iam_cluster:
                            continue
                        lk = sub.linkage[1]
                        if id(sub) in self.resolved:
                            if getattr(old, lk) != self.resolved[
                                id(sub)
                            ]:
                                version = True
                                break
                        elif next(
                            self._match_tree(sub, old), None
                        ) is None:
                            version = True
                            break
                if version:
                    self.version_of[id(con)] = old.guid
                else:
                    self.resolved[id(con)] = old.guid
            elif (
                parent is not None
                and parent.key is not None
                and con.linkage is not None
                and con.linkage[0] == "iam"
                and con.linkage[1] not in self._cluster_fields(
                    parent.key
                )
            ):
                # a keyed iam sub with an UNCOVERED connection whose
                # global key match failed binds through the matched
                # parent's OLD pointer and versions that target into
                # the desired state (probed: key=(value) parent +
                # right->(value="a-b" key=(value)) versions the old
                # "100" target when no global "a-b" exists; keyburn2
                # §4.3/§4.4 pin that a GLOBAL match wins first)
                old_parent = None
                if id(parent) in self.resolved:
                    old_parent = self.store.get(
                        self.resolved[id(parent)]
                    )
                elif id(parent) in self.version_of:
                    old_parent = self.store.get(
                        self.version_of[id(parent)]
                    )
                if old_parent is not None:
                    tg = getattr(old_parent, con.linkage[1])
                    tp = self.store.get(tg) if tg else None
                    if (
                        tp is not None
                        and tp.live
                        and self.store.is_newest(tp.guid)
                    ):
                        if self._differs(con, tp, exclude=set()):
                            self.version_of[id(con)] = tp.guid
                        else:
                            self.resolved[id(con)] = tp.guid
        for sub in con.subs:
            self._annotate_keys(sub)

    def _annotate_pointed(self, con: Constraint) -> None:
        """Pointed reuse (ref graphd-write-annotate-pointed.c,
        test/unit/keyburn3.sh): an unkeyed primitive pointed at by a
        matched cluster, whose explicit fields the pointee already
        satisfies, is not re-created."""
        changed = True
        while changed:
            changed = False
            for node in con.walk():
                # a VERSIONED key match participates too: the pointed
                # check runs against the matched OLD primitive's
                # pointers (graphd annotates the matched GUID before
                # the version/reuse decision — CONSTRAINT_HAS_GUID;
                # write-fuzz seed 177: a versioning key=(value right)
                # parent still reuses its old right target)
                g = self.resolved.get(id(node))
                if g is None:
                    g = self.version_of.get(id(node))
                if g is None:
                    continue
                prim = self.store.get(g)
                if prim is None:
                    continue
                # upward: this match's linkage pointer names the parent
                parent = node.parent
                if (
                    parent is not None
                    and id(parent) not in self.resolved
                    and node.linkage is not None
                    and node.linkage[0] == "my"
                    and parent.key is None
                    and parent.unique is None
                    and not parent.guid
                ):
                    pg = getattr(prim, node.linkage[1])
                    cand = self.store.get(pg) if pg else None
                    if cand is not None and cand.live and (
                        self.store.is_newest(cand.guid)
                    ):
                        lits = self._literal_fields(parent)
                        if not lits.pop("__type_unresolved", False) and (
                            self._prim_matches(cand, parent, lits,
                                               None, None)
                        ):
                            self.resolved[id(parent)] = cand.guid
                            changed = True
                # downward: pointees of the matched primitive
                for sub in node.subs:
                    if (
                        id(sub) in self.resolved
                        or sub.linkage is None
                        or sub.linkage[0] != "iam"
                        or sub.key is not None
                        or sub.unique is not None
                        or sub.guid
                    ):
                        continue
                    sg = getattr(prim, sub.linkage[1])
                    cand = self.store.get(sg) if sg else None
                    if cand is not None and cand.live and (
                        self.store.is_newest(cand.guid)
                    ):
                        lits = self._literal_fields(sub)
                        if not lits.pop("__type_unresolved", False) and (
                            self._prim_matches(cand, sub, lits, None, None)
                        ):
                            self.resolved[id(sub)] = cand.guid
                            changed = True

    def _check_unique(self, con: Constraint, in_cluster: bool = False
                      ) -> None:
        """Unique clusters span connected unique-tagged primitives
        (ref doc/gr-protocol.txt:661-743, test/unit/unique4.sh): the
        EXISTS test matches the whole connected cluster as a tree —
        all or nothing, no partial reuse."""
        if (
            con.unique is not None
            and not in_cluster
            and id(con) not in self.resolved
        ):
            matches = self._cluster_matches(con, self._parent_prim(con))
            # a write that versions a lineage may collide with that
            # lineage's own primitives (ref test/unit/unique3.sh)
            if con.guid:
                target = _single(con.guid[0].guids, "guid")
                old = self.store.get(target) if target else None
                if old is not None:
                    matches = (
                        m for m in matches if m.lineage != old.lineage
                    )
            # lazy EXISTS probe: the first survivor decides — a hot
            # unique value never materializes its whole match set
            if next(iter(matches), None) is not None:
                raise WriteError(
                    "EXISTS", "primitive tagged as unique already exist"
                )
        for sub in con.subs:
            self._check_unique(
                sub, in_cluster=self._in_parent_cluster(con, sub)
            )

    def _in_parent_cluster(self, parent: Constraint, sub: Constraint
                           ) -> bool:
        """Is the sub part of the parent's unique cluster?  Only when
        their *connection* is in the unique field set (ref
        test/unit/uniquecluster.sh case 7: unconnected unique tags are
        separate clusters)."""
        if parent.unique is None or sub.unique is None or (
            sub.linkage is None
        ):
            return False
        kind, lk = sub.linkage
        if kind == "iam":
            return lk in self._cluster_fields(parent.unique)
        return lk in self._cluster_fields(sub.unique)

    def _cluster_matches(self, con: Constraint,
                         parent_prim: Primitive | None
                         ) -> Iterator[Primitive]:
        """Primitives matching this unique node AND its whole
        connected cluster, lazily.  Non-unique subs whose linkage is
        named in the unique fields constrain the match (uniquecluster
        cases 8/9) without joining the cluster."""
        fields = self._cluster_fields(con.unique or [])
        ms = self._match_tree(con, parent_prim, fields, local_only=True)
        for m in ms:
            ok = True
            for sub in con.subs:
                if sub.linkage is None:
                    continue
                kind, lk = sub.linkage
                if sub.unique is not None and self._in_parent_cluster(
                    con, sub
                ):
                    if next(
                        self._cluster_matches(sub, m.prim), None
                    ) is None:
                        ok = False
                        break
                elif kind == "iam" and lk in fields:
                    if next(
                        self._match_tree(sub, m.prim), None
                    ) is None:
                        ok = False
                        break
            if ok:
                yield m.prim

    def _cluster_fields(self, names: list[str]) -> set[str]:
        out = set()
        for n in names:
            out.add({"valuetype": "datatype"}.get(n, n))
        return out

    def _differs(self, con: Constraint, old: Primitive,
                 exclude: set[str]) -> bool:
        """Does any explicit non-key field differ from the old
        primitive?  Unspecified fields never differ (ref octet.sh:
        key=value write against a named primitive reuses it)."""
        lits = self._literal_fields(con)
        lits.pop("__type_unresolved", None)
        for f, v in lits.items():
            if f in exclude:
                continue
            if f == "value":
                if not write_value_match(
                    con.value_comparator or con.comparator, v, old.value
                ):
                    return True
            elif f == "name":
                a, b = v, old.name
                if (a is None) != (b is None) or (
                    a is not None and a.lower() != b.lower()
                ):
                    return True
            elif getattr(old, f) != v:
                return True
        return False

    # -- pass 4: allocation ------------------------------------------------

    def _write_node(self, con: Constraint, parent_guid: str | None
                    ) -> WriteNode:
        if id(con) in self.resolved:
            out = WriteNode(guid=self.resolved[id(con)], con=con)
            for sub in con.subs:
                out.children.append(
                    self._write_node(sub, parent_guid=out.guid)
                )
            return out

        # 1. bind the type first (may create type primitives) — the
        # reference resolves a constraint's typeguid before its
        # children (see test/unit/version2.out.exp GUID order)
        typeguid = None
        if con.type_strcons:
            tname = _single(con.type_strcons[0].values, "type")
            if tname is not None:
                typeguid = self.types.make_name(tname)

        # 2. pointees next: subs this primitive will point at
        iam_results: dict[int, WriteNode] = {}
        for i, sub in enumerate(con.subs):
            if sub.linkage and sub.linkage[0] == "iam":
                iam_results[i] = self._write_node(sub, parent_guid=None)

        # 3. linkage fields: literals, parent linkage, pointee children
        links: dict[str, str | None] = {}
        for lk in LINKAGES:
            for gc in con.links.get(lk, ()):
                if gc.op != "=":
                    raise WriteError(
                        "SYNTAX",
                        f"\"{lk}\" in a write template only accepts \"=\"",
                    )
                links[lk] = _single(gc.guids, lk)
        if typeguid is not None:
            links["typeguid"] = typeguid
        if con.linkage is not None and parent_guid is not None:
            kind, lk = con.linkage
            if kind == "my":
                links[lk] = parent_guid
        for i, sub in enumerate(con.subs):
            if sub.linkage and sub.linkage[0] == "iam":
                links[sub.linkage[1]] = iam_results[i].guid

        # 4. scalar literals
        name = value = None
        if con.name_strcons:
            name = _single(con.name_strcons[0].values, "name")
        if con.value_strcons:
            value = _single(con.value_strcons[0].values, "value")
        datatype = con.valuetype
        if con.value_strcons and datatype is None:
            # any explicit value literal — even null — defaults the
            # datatype to string (ref test/unit/nullvalue.out.exp)
            datatype = 2
        timestamp = None
        if con.timestamps:
            tc = con.timestamps[0]
            if tc.op != "=":
                raise WriteError(
                    "SYNTAX",
                    "timestamp in a write template only accepts \"=\"",
                )
            try:
                timestamp = ts_from_string(tc.text)
            except ValueError as e:
                raise WriteError("SYNTAX", str(e))
        live = con.live != "false"
        archival = con.archival != "false"

        # 5. versioning: explicit guid=/guid~= (ref
        # doc/gr-protocol.txt:531-554) or a key= match.  A key match
        # versions the lineage HEAD at write time: when two keyed
        # members of one request bound the same pre-write primitive,
        # the second chains onto the first's fresh version (probed:
        # key=(value) parent + key=() sub both match prim 0, the sub
        # writes generation 2 with previous = the parent's new guid)
        prev = self.version_of.get(id(con))
        if prev is not None:
            prev = self.store.newest_of(prev).guid
        if con.guid:
            gc = con.guid[0]
            target = _single(gc.guids, "guid")
            if target is None:
                raise WriteError("SEMANTICS", "cannot version the null GUID")
            old = self.store.get(target)
            if old is None:
                raise WriteError(
                    "SEMANTICS",
                    f"not found: cannot read predecessor record {target}",
                )
            if gc.op == "=":
                if not self.store.is_newest(target):
                    raise WriteError(
                        "OUTDATED",
                        f'"{target}" has been versioned',
                    )
                prev = target
            elif gc.op == "~=":
                prev = self.store.newest_of(target).guid
            else:
                raise WriteError(
                    "SYNTAX", "guid in a write template accepts = and ~="
                )

        p = self.store.append(
            typeguid=links.get("typeguid"),
            left=links.get("left"),
            right=links.get("right"),
            scope=links.get("scope"),
            prev=prev,
            name=name,
            value=value,
            datatype=datatype,
            live=live,
            archival=archival,
            timestamp=timestamp,
        )

        # 6. dependents after: subs pointing at this primitive
        out = WriteNode(guid=p.guid, con=con)
        for i, sub in enumerate(con.subs):
            if sub.linkage and sub.linkage[0] == "iam":
                out.children.append(iam_results[i])
            else:
                out.children.append(self._write_node(sub, parent_guid=p.guid))
        return out
