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
    """Version-6 dump tuple: (guid typeguid name datatype value scope
    live archival txstart timestamp left right prev); null typeguid
    prints ``null``, null linkage GUIDs print ``0`` (see
    test/unit/dumpnl.out.exp)."""

    def g(x):
        return Guid(x) if x is not None else Num(0)

    return List(
        [
            Guid(p.guid),
            Guid(p.typeguid) if p.typeguid is not None else Atom("null"),
            Str(p.name) if p.name is not None else Atom("null"),
            Atom(DATATYPE_NAMES.get(p.datatype, str(p.datatype)))
            if p.value is not None or p.datatype != 1
            else Atom("null"),
            Str(p.value) if p.value is not None else Atom("null"),
            g(p.scope),
            Atom("true" if p.live else "false"),
            Atom("true" if p.archival else "false"),
            Atom("true" if p.txstart else "false"),
            Atom(ts_to_string(p.timestamp)),
            g(p.left),
            g(p.right),
            g(p.prev),
        ]
    )


def do_dump(session, req):
    """dump [start end] -> ("6" start end (tuple)...)."""
    for t in req.rest:
        if t.kind == L.STR:
            raise GraphdError(
                "SYNTAX",
                f'on line 1, column {t.pos + 1}: "{t.text}": expected '
                "a dump constraint, or ')'",
            )
    nums = [t for t in req.rest if t.kind == L.ATOM and t.text.isdigit()]
    start = int(nums[0].text) if nums else 0
    end = int(nums[1].text) if len(nums) > 1 else len(session.store.rows)
    if start > end:
        raise GraphdError("SEMANTICS", f"start {start} exceeds end {end}")
    items = [Str("6"), Num(start), Num(end)]
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
    if version not in ("1", "2", "4", "5", "6"):
        raise GraphdError("SEMANTICS", f"unsupported dump version {version!r}")
    start = int(next_tok().text)
    end_tok = next_tok()
    if start > int(end_tok.text):
        raise GraphdError(
            "SEMANTICS",
            f"on line 1, column {end_tok.pos + 1}: '{end_tok.text}': "
            "start value cannot exceed end value",
        )

    if start == 0 and len(session.store.rows) > 0:
        # restore from 0 destroys existing state
        # (ref doc/gr-protocol.txt:1271-1296)
        from graphd_spark.store import PrimitiveStore

        session.store = PrimitiveStore()
        session.types.__init__(session.store)
    store = session.store
    store.begin()
    try:
        while True:
            t = next_tok()
            if t.kind == L.CPAR:
                break
            if t.kind != L.OPAR:
                raise GraphdError("SYNTAX", "expected tuple in restore")
            if version in ("1", "2"):
                # pre-typeguid dumps require the reference's migration
                # (type strings -> type system, guid recompression);
                # only empty v1/v2 payloads are accepted
                raise GraphdError(
                    "SEMANTICS",
                    f"cannot migrate dump version {version!r} payloads",
                )
            fields = []
            while True:
                ft = next_tok()
                if ft.kind == L.CPAR:
                    break
                fields.append(ft)
            want = 13 if version == "6" else 12
            if len(fields) < want:
                raise GraphdError(
                    "SYNTAX", "short tuple in restore payload"
                )
            if version == "6":
                (guid, typeguid, name, datatype, value, scope, live,
                 archival, _txstart, ts, left, right, prev) = fields[:13]
            else:
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
