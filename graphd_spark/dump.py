"""dump / restore: the bulk export/import path.

Tuple text format (ref doc/gr-protocol.txt:1213-1296,
graphd/graphd-dump.c, graphd-restore.c), version "5" per tuple:

  (guid typeguid name datatype value scope live archival timestamp
   left right prev)

with the null GUID written as ``0`` (see test/unit/keyburn.sh for live
examples).  ``restore ("5" start end (tuple)...)`` replays the range —
preserving foreign database ids, so subsequently written primitives
continue the restored id sequence (test/unit/keyburn.out.exp) — and
``dump`` emits it.
"""

from __future__ import annotations

from graphd_spark.gql import lexer as L
from graphd_spark.model import (
    DATATYPE_CODES,
    DATATYPE_NAMES,
    guid_db,
    guid_serial,
    ts_from_string,
    ts_to_string,
)
from graphd_spark.pattern import GraphdError
from graphd_spark.values import Atom, Guid, List, Num, Splice, Str, Ts


def _tuple_value(session, p):
    def g(x):
        return Guid(x) if x is not None else Num(0)

    return List(
        [
            Guid(p.guid),
            g(p.typeguid),
            Str(p.name) if p.name is not None else Atom("null"),
            Atom(DATATYPE_NAMES.get(p.datatype, str(p.datatype)))
            if p.value is not None or p.datatype != 1
            else Atom("null"),
            Str(p.value) if p.value is not None else Atom("null"),
            g(p.scope),
            Atom("true" if p.live else "false"),
            Atom("true" if p.archival else "false"),
            Atom(ts_to_string(p.timestamp)[:-1]),  # dump drops the Z
            g(p.left),
            g(p.right),
            g(p.prev),
        ]
    )


def do_dump(session, req):
    """dump [start end] -> ("5" start end (tuple)...)."""
    nums = [t for t in req.rest if t.kind == L.ATOM and t.text.isdigit()]
    start = int(nums[0].text) if nums else 0
    end = int(nums[1].text) if len(nums) > 1 else len(session.store.rows)
    if start > end:
        raise GraphdError("SEMANTICS", f"start {start} exceeds end {end}")
    items = [Str("5"), Num(start), Num(end)]
    for p in session.store.rows[start:end]:
        items.append(_tuple_value(session, p))
    return List(items)


def _atom_guid(text: str):
    t = text.strip().lower()
    if t in ("0", "null"):
        return None
    return t


def do_restore(session, req):
    """restore ("VERSION" start end (tuple)...)."""
    toks = list(req.rest)
    i = 0

    def next_tok():
        nonlocal i
        if i >= len(toks):
            raise GraphdError("SYNTAX", "truncated restore payload")
        t = toks[i]
        i += 1
        return t

    t = next_tok()
    if t.kind != L.OPAR:
        raise GraphdError("SYNTAX", "expected '(' after restore")
    version = next_tok().text
    if version not in ("2", "4", "5", "6"):
        raise GraphdError("SEMANTICS", f"unsupported dump version {version!r}")
    start = int(next_tok().text)
    next_tok()  # end marker (informational)

    store = session.store
    if start == 0 and len(store.rows) > 0:
        raise GraphdError(
            "SEMANTICS", "restore start=0 requires an empty database"
        )
    store.begin()
    try:
        while True:
            t = next_tok()
            if t.kind == L.CPAR:
                break
            if t.kind != L.OPAR:
                raise GraphdError("SYNTAX", "expected tuple in restore")
            fields = []
            while True:
                ft = next_tok()
                if ft.kind == L.CPAR:
                    break
                fields.append(ft)
            if len(fields) < 12:
                raise GraphdError(
                    "SYNTAX", "short tuple in restore payload"
                )
            (guid, typeguid, name, datatype, value, scope, live,
             archival, ts, left, right, prev) = fields[:12]
            dt = 1
            if datatype.kind == L.ATOM and datatype.text.lower() != "null":
                dtt = datatype.text.lower()
                dt = DATATYPE_CODES.get(
                    dtt, int(dtt) if dtt.isdigit() else 1
                )
            store.append(
                guid=guid.text.lower(),
                typeguid=_atom_guid(typeguid.text),
                name=name.text if name.kind == L.STR else None,
                datatype=dt,
                value=value.text if value.kind == L.STR else None,
                scope=_atom_guid(scope.text),
                left=_atom_guid(left.text),
                right=_atom_guid(right.text),
                prev=_atom_guid(prev.text),
                live=live.text.lower() != "false",
                archival=archival.text.lower() != "false",
                timestamp=ts_from_string(ts.text),
            )
    except Exception:
        store.rollback()
        raise
    # adopt the restored database id: new writes continue the sequence
    if store.rows:
        store.db_id = guid_db(store.rows[-1].guid)
    store.commit()
    session.types.__init__(store)  # re-read the type system
    return None
