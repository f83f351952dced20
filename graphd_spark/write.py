"""The write pipeline: literal constraint tree -> appended primitives.

Mirrors the reference's staged write state machine (ref
graphd/graphd-write.c:596-782): anchors/keys/uniques are annotated by
embedded reads first, then primitives are allocated in dependency
order — a link's endpoints must exist before the link, so

- subconstraints the parent points at (``("iam", L)``: parent.L ==
  sub.guid) are written *before* the parent,
- subconstraints pointing at the parent (``("my", L)``: sub.L ==
  parent.guid) are written *after* it,

which reproduces the reference's GUID assignment order exactly (see
test/unit/vars.out.exp: root 9, then per '->' link: type a,b; node c;
link d).  Type strings are resolved (creating type primitives on
demand) immediately before the primitive that uses them
(graphd_type_make_name, ref graphd/graphd-type.c).

Each write request is atomic: the engine brackets execute() in a store
transaction and rolls back on error (ref
doc/a-brief-tour-of-graphd.md:73-82).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from graphd_spark.gql.ir import Constraint, LINKAGES
from graphd_spark.model import DATATYPE_NAMES, ts_from_string
from graphd_spark.store import PrimitiveStore
from graphd_spark.typesys import TypeSystem


class WriteError(Exception):
    def __init__(self, code: str, message: str):
        super().__init__(message)
        self.code = code
        self.message = message


@dataclass
class WriteNode:
    """Reply-shaped result: one written primitive + child results."""

    guid: str
    children: list["WriteNode"] = field(default_factory=list)


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

    def execute(self, con: Constraint) -> WriteNode:
        self._validate(con)
        return self._write_node(con, parent_guid=None)

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
        for sub in con.subs:
            if sub.linkage is None:
                raise WriteError(
                    "SEMANTICS",
                    "subconstraint in a write template has no linkage",
                )
            self._validate(sub)

    # -- allocation --------------------------------------------------------

    def _write_node(self, con: Constraint, parent_guid: str | None) -> WriteNode:
        # 1. resolve the type string first (may create type
        # primitives) — the reference binds a constraint's typeguid
        # before descending into its children (see
        # test/unit/version2.out.exp GUID order).
        typeguid = None
        if con.type_strcons:
            tname = _single(con.type_strcons[0].values, "type")
            if tname is not None:
                typeguid = self.types.make_name(tname)

        # 2. pointees next: subs the parent will point at.
        iam_results: dict[int, WriteNode] = {}
        for i, sub in enumerate(con.subs):
            if sub.linkage and sub.linkage[0] == "iam":
                iam_results[i] = self._write_node(sub, parent_guid=None)

        # 3. linkage fields: literals, parent linkage, pointee children.
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

        # 4. scalar literals.
        name = value = None
        if con.name_strcons:
            name = _single(con.name_strcons[0].values, "name")
        if con.value_strcons:
            value = _single(con.value_strcons[0].values, "value")
        datatype = con.valuetype
        if datatype is not None and datatype not in DATATYPE_NAMES:
            pass  # any 1..255 allowed (ref gr-protocol.txt:520)
        timestamp = None
        if con.timestamps:
            tc = con.timestamps[0]
            if tc.op != "=":
                raise WriteError(
                    "SYNTAX", "timestamp in a write template only accepts \"=\""
                )
            try:
                timestamp = ts_from_string(tc.text)
            except ValueError as e:
                raise WriteError("SYNTAX", str(e))
        live = con.live != "false"
        archival = con.archival != "false"

        # 5. versioning (ref doc/gr-protocol.txt:531-554): guid= is
        # pessimistic (target must still be newest), guid~= follows the
        # lineage to its head.
        prev = None
        if con.guid:
            gc = con.guid[0]
            target = _single(gc.guids, "guid")
            if target is None:
                raise WriteError("SEMANTICS", "cannot version the null GUID")
            old = self.store.get(target)
            if old is None:
                raise WriteError("EMPTY", "not found")
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

        # 6. dependents after: subs pointing at this primitive.
        out = WriteNode(guid=p.guid)
        for i, sub in enumerate(con.subs):
            if sub.linkage and sub.linkage[0] == "iam":
                out.children.append(iam_results[i])
            else:
                out.children.append(self._write_node(sub, parent_guid=p.guid))
        return out
