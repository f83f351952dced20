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
    guid_compose,
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
    end = int(nums[1].text) if len(nums) > 1 else session.store.count()
    if start > end:
        raise GraphdError("SEMANTICS", f"start {start} exceeds end {end}")
    items = [Str("6"), Num(start), Num(end)]
    for p in session.store.iter_range(start, end):
        items.append(_tuple_value(session, p))
    return List(items)


def _atom_guid(text: str):
    t = text.strip().lower()
    if t in ("0", "null"):
        return None
    return t


def _v2_guid(g: str | None) -> str | None:
    """Convert a version-2 GUID to the version-3 layout.

    V2 packed the database id as (a.bits[0:18] << 30) | b.bits[34:64]
    and the serial as b.bits[0:34] (ref libgraph/graph.h:248-260
    GRAPH_V2GUID_DB/SERIAL); v3 GUIDs (marked by the RFC4122 nibble 4
    at a.bits[28:32]) pass through.  Test rerestore:
    113a9a8400001c06a301d5e800000000 -> 0701a8c04000757a80...00."""
    if g is None:
        return None
    a = int(g[:16], 16)
    b = int(g[16:], 16)
    if (a >> 28) & 0xF == 4:
        return g
    db = ((a & 0x3FFFF) << 30) | ((b >> 34) & 0x3FFFFFFF)
    return guid_compose(db, b & ((1 << 34) - 1))


def do_restore(session, req, replica: bool = False):
    """restore ("VERSION" start end (tuple)...).

    With ``replica``, the payload is a master's replication batch —
    ``replica-write (start end (tuple)...)`` (ref
    libgdp/gdp-parse.c:2908): the version is implicitly the current
    one, and tuples the replica already holds verify-and-skip instead
    of erroring (masters deliberately restart the stream 256
    primitives early, graphd-replica.c:1137-1143)."""
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
    version = "6" if replica else next_tok().text
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
    if int(end_tok.text) - start > 1_000_000:
        # ref libgdp/gdp-parse.c:3015, GRAPHD_RESTORE_MAX
        # (graphd.h:73); rejected at parse time (test/unit/random2.sh)
        raise GraphdError(
            "SEMANTICS",
            f"on line 1, column {end_tok.pos + 1}: '{end_tok.text}': "
            "too many records",
        )
    if start > session.store.count():
        # ref graphd-restore.c:377-384 graphd_restore_check
        raise GraphdError(
            "SEMANTICS",
            "restored records must be contiguous - cannot restore "
            f"records above {session.store.count()} "
            f"(attempted: {start})",
        )

    if start == 0 and session.store.count() > 0 and not replica:
        # restore from 0 destroys existing state
        # (ref doc/gr-protocol.txt:1271-1296)
        session.store = session.fresh_store()
        session.types.__init__(session.store)
    store = session.store
    store.begin()
    _base_db = store.db_id
    if version == "1" and start == 0:
        # v1 migration: the type system is rebuilt in an *adjacent*
        # database id space (pdb_restore_avoid_database_id bumps the
        # id; ref graphd-restore.c:59-88, tests onerestore,
        # threerestore: type-system primitives read back in db+1 with
        # their ids as serials), created up front and on demand as new
        # type strings appear, so they interleave with the tuples in
        # id order.  The predictable clock ticks only on these
        # allocations — payload tuples carry their own timestamps.
        from graphd_spark.model import ts_predictable

        _alloc = iter(range(1 << 34))

        def _alt_guid_for_id(_id):
            return guid_compose(_base_db + 1, _id)

        def _alt_ts_for_id(_id):
            return ts_predictable(next(_alloc))

        store.guid_for_id = _alt_guid_for_id
        store.ts_for_id = _alt_ts_for_id
        session.types.__init__(store)
        # bootstrap lazily at the first tuple: restoring an EMPTY v1
        # dump leaves the store truly empty, so the next write starts
        # at id 0 (ref test/unit/group.sh `restore ("1" 0 0)`)
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
            if version == "1":
                if start == 0:
                    session.types.ensure_bootstrap()
                # v1 tuples carry a *string* type where later versions
                # have the typeguid, and their guids recompress into
                # the local database space, serial preserved (ref
                # graphd-restore.c:144-170; test benrestore: foreign
                # ...48d15800012a3 reads back as the local guid with
                # serial 0x12a3)
                def local(g):
                    return (
                        guid_compose(_base_db, guid_serial(g))
                        if g is not None
                        else None
                    )

                tg = None
                if typeguid.kind == L.STR and typeguid.text:
                    tg = session.types.make_name(typeguid.text)
                store.append(
                    guid=local(guid.text.lower()),
                    typeguid=tg,
                    name=name.text if name.kind == L.STR else None,
                    datatype=dt,
                    value=value.text if value.kind == L.STR else None,
                    scope=local(_atom_guid(scope.text)),
                    left=local(_atom_guid(left.text)),
                    right=local(_atom_guid(right.text)),
                    prev=local(_atom_guid(prev.text)),
                    live=live.text.lower() != "false",
                    archival=archival.text.lower() != "false",
                    timestamp=ts_from_string(ts.text),
                )
                continue
            gtxt = guid.text.lower()
            if replica and store.get(gtxt) is not None:
                # overlap with the already-replicated prefix: verified
                # identical by guid, skipped (graphd-restore overlap)
                continue
            links = {
                "typeguid": _atom_guid(typeguid.text),
                "right": _atom_guid(right.text),
                "left": _atom_guid(left.text),
                "scope": _atom_guid(scope.text),
            }
            prev_g = _atom_guid(prev.text)
            if version == "2":
                gtxt = _v2_guid(gtxt)
                links = {k: _v2_guid(v) for k, v in links.items()}
                prev_g = _v2_guid(prev_g)
            # linkage guids must resolve (pdb linkage order; ref
            # pdb-primitive-alloc.c:470-492, graphd-restore.c:300-310;
            # test badrestore)
            for lk in ("typeguid", "right", "left", "scope"):
                lg = links[lk]
                if (
                    lg is not None
                    and lg != gtxt
                    and lg not in store.by_guid
                ):
                    raise GraphdError(
                        "SEMANTICS",
                        f"cannot allocate primitive {gtxt}: not "
                        f"found: {lk}={lg} does not exist",
                    )
            store.append(
                guid=gtxt,
                typeguid=links["typeguid"],
                name=name.text if name.kind == L.STR else None,
                datatype=dt,
                value=value.text if value.kind == L.STR else None,
                scope=links["scope"],
                left=links["left"],
                right=links["right"],
                prev=prev_g,
                live=live.text.lower() != "false",
                archival=archival.text.lower() != "false",
                timestamp=ts_from_string(ts.text),
            )
    except Exception:
        store.rollback()
        raise
    finally:
        if version == "1" and start == 0:
            # restore the normal local-space guid/ts allocators
            for attr in ("guid_for_id", "ts_for_id"):
                try:
                    delattr(store, attr)
                except AttributeError:
                    pass
    # adopt the restored database id: new writes continue the sequence
    # (v1 payloads were recompressed into the local id space already)
    if store.count() > 0 and version != "1":
        store.db_id = guid_db(store.last_primitive().guid)
    store.commit()
    session.types.__init__(store)  # re-read the type system
    return None


# -- distributed bulk restore ---------------------------------------------


#: tuple-line tokenizer: quoted string (with escapes) or bare atom —
#: a fast regex specialization of the gql lexer for the flat dump
#: tuple grammar (no nesting inside a tuple)
_TUPLE_TOKEN = __import__("re").compile(
    r'"((?:[^"\\]|\\.)*)"|([^\s()]+)'
)
_ESC = __import__("re").compile(r"\\(.)")
_ESC_MAP = {"\\": "\\", '"': '"', "n": "\n"}


def _unescape(s: str) -> str:
    return _ESC.sub(lambda m: _ESC_MAP.get(m.group(1), m.group(1)), s)


def _sep_before(ch: str) -> bool:
    return ch == "(" or ch.isspace()


def _sep_after(ch: str) -> bool:
    return ch == ")" or ch.isspace()


def _tokenize_line(line: str) -> list:
    """(is_string, text) tokens of one tuple line.

    Fast path: C-speed ``str.split`` on the quote character — valid
    whenever the line has no backslash escapes and every quote sits at
    a token boundary (the overwhelmingly common dump shape).  Any line
    that fails those checks takes the original regex tokenizer; both
    paths produce identical token streams (pinned by
    tests/test_bulk_restore.py round-trips).  The regex costs ~15
    us/line (one match object per token); the split path ~7 us/line —
    at a 121M-primitive production dump that is minutes of executor
    CPU."""
    if "\\" in line:
        return _tokenize_line_re(line)
    parts = line.split('"')
    n = len(parts)
    if n % 2 == 0:  # unbalanced quote: not a boundary-clean line
        return _tokenize_line_re(line)
    toks = []
    for j, seg in enumerate(parts):
        if j % 2:
            toks.append((True, seg))
        else:
            # quote-boundary checks: an opening quote must follow a
            # separator, a closing quote must be followed by one —
            # otherwise the regex scanner would have glued the quote
            # into an atom and the split disagrees
            if j + 1 < n and seg and not _sep_before(seg[-1]):
                return _tokenize_line_re(line)
            if j > 0 and seg and not _sep_after(seg[0]):
                return _tokenize_line_re(line)
            if "(" in seg or ")" in seg:
                seg = seg.replace("(", " ").replace(")", " ")
            for a in seg.split():
                toks.append((False, a))
    return toks


def _tokenize_line_re(line: str) -> list:
    toks = []
    for m in _TUPLE_TOKEN.finditer(line):
        if m.group(1) is not None:
            toks.append((True, _unescape(m.group(1))))
        else:
            toks.append((False, m.group(2)))
    return toks


def parse_tuple_batch(lines, db_id: int, derived: bool = True):
    """Parse version-6 dump tuple lines into primitive dicts (worker-
    side; no store access).  Linkage canonicalization and version
    chains are resolved afterwards with joins — see bulk_restore.

    With ``derived`` the comparator columns (value_norm/value_num/
    value_fkey) and timestamps are computed once per *unique* value
    through a memo — dump values and timestamps repeat heavily, so
    this drops the per-row Python cost from ~100us to the ~25us
    tokenize.  ``derived=False`` emits only the tokenize output (raw
    ``ts_text`` in place of the parsed ``timestamp``): bulk_restore
    attaches the derived columns as separate Arrow-vectorized
    projections AFTER the chain joins, so a consumer that never reads
    them (e.g. an aggregate over guid/value) has Catalyst prune the
    whole derivation away."""
    if derived:
        from graphd_spark.comparators import (
            decode_number,
            fuzzy_key,
            render_sci,
            value_norm_key,
        )

        def _derived(val):
            if val is None:
                return None, None, None
            d = decode_number(val, scientific=True)
            return (
                value_norm_key(val),
                None if d is None else render_sci(d),
                fuzzy_key(val),
            )

    derived_memo: dict = {}
    ts_memo: dict = {}
    out = []
    for line in lines:
        line = line.strip()
        if not line:
            continue
        toks = _tokenize_line(line)  # (is_string, text)
        if len(toks) < 13:
            raise ValueError(f"short tuple: {line[:80]}")
        (guid, typeguid, name, datatype, value, scope, live,
         archival, txstart, ts, left, right, prev) = toks[:13]
        dt = 1
        if not datatype[0] and datatype[1].lower() != "null":
            dtt = datatype[1].lower()
            dt = DATATYPE_CODES.get(dtt, int(dtt) if dtt.isdigit() else 1)
        val = value[1] if value[0] else None
        gtxt = guid[1].lower()
        row = dict(
            id=guid_serial(gtxt),
            guid=gtxt,
            typeguid=_atom_guid(typeguid[1]),
            left=_atom_guid(left[1]),
            right=_atom_guid(right[1]),
            scope=_atom_guid(scope[1]),
            prev=_atom_guid(prev[1]),
            name=name[1] if name[0] else None,
            datatype=dt,
            value=val,
            live=live[1].lower() != "false",
            archival=archival[1].lower() != "false",
            txstart=txstart[1].lower() == "true",
        )
        if derived:
            dv = derived_memo.get(val)
            if dv is None:
                dv = derived_memo[val] = _derived(val)
            tst = ts_memo.get(ts[1])
            if tst is None:
                tst = ts_memo[ts[1]] = ts_from_string(ts[1])
            row.update(
                value_norm=dv[0], value_num=dv[1], value_fkey=dv[2],
                timestamp=tst,
            )
        else:
            row["ts_text"] = ts[1]
        out.append(row)
    return out


#: column order of parse_tuple_columns == bulk_restore's parsed_schema
TUPLE_RAW_COLUMNS = (
    "id", "guid", "typeguid", "left", "right", "scope", "prev",
    "name", "datatype", "value", "live", "archival", "txstart",
    "ts_text",
)


def parse_tuple_columns(lines, db_id: int) -> dict:
    """Columnar twin of ``parse_tuple_batch(derived=False)``: returns
    ``{column: list}`` in TUPLE_RAW_COLUMNS order instead of one dict
    per row.  Feeding pandas a dict of flat lists skips the per-row
    dict construction and pandas' row-wise dict consolidation —
    together ~40% of the executor parse cost at 1M+ tuples (the
    restore hot path)."""
    cols: dict = {k: [] for k in TUPLE_RAW_COLUMNS}
    (ap_id, ap_guid, ap_typeguid, ap_left, ap_right, ap_scope, ap_prev,
     ap_name, ap_datatype, ap_value, ap_live, ap_archival, ap_txstart,
     ap_ts) = (cols[k].append for k in TUPLE_RAW_COLUMNS)
    for line in lines:
        line = line.strip()
        if not line:
            continue
        toks = _tokenize_line(line)
        if len(toks) < 13:
            raise ValueError(f"short tuple: {line[:80]}")
        (guid, typeguid, name, datatype, value, scope, live,
         archival, txstart, ts, left, right, prev) = toks[:13]
        dt = 1
        if not datatype[0] and datatype[1].lower() != "null":
            dtt = datatype[1].lower()
            dt = DATATYPE_CODES.get(dtt, int(dtt) if dtt.isdigit() else 1)
        gtxt = guid[1].lower()
        ap_id(guid_serial(gtxt))
        ap_guid(gtxt)
        ap_typeguid(_atom_guid(typeguid[1]))
        ap_left(_atom_guid(left[1]))
        ap_right(_atom_guid(right[1]))
        ap_scope(_atom_guid(scope[1]))
        ap_prev(_atom_guid(prev[1]))
        ap_name(name[1] if name[0] else None)
        ap_datatype(dt)
        ap_value(value[1] if value[0] else None)
        ap_live(live[1].lower() != "false")
        ap_archival(archival[1].lower() != "false")
        ap_txstart(txstart[1].lower() == "true")
        ap_ts(ts[1])
    return cols


def _derived_columns():
    """(timestamp, value_norm, value_num, value_fkey) as Arrow-
    vectorized column factories over (ts_text, value).  Memoized per
    batch on unique inputs — dump values/timestamps repeat heavily.
    Deterministic pandas_udfs, so Catalyst prunes any the consumer
    never selects (the point of splitting them out of the parse)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType, LongType, StringType

    def _memo_map(s, fn):
        uniq = {v: fn(v) for v in s.dropna().unique()}
        return s.map(lambda v: None if v is None else uniq[v])

    def _ts(s):
        return _memo_map(s, ts_from_string)

    def _norm(s):
        from graphd_spark.comparators import value_norm_key

        return _memo_map(s, value_norm_key)

    def _num(s):
        from graphd_spark.comparators import decode_number, render_sci

        def one(v):
            d = decode_number(v, scientific=True)
            return None if d is None else render_sci(d)

        return _memo_map(s, one)

    def _fkey(s):
        from graphd_spark.comparators import fuzzy_key

        return _memo_map(s, fuzzy_key)

    # the positional (fn, returnType) form: the decorator form infers
    # the eval type from pd.Series annotations, which would force a
    # module-level pandas import onto every dump.py consumer
    return (
        F.pandas_udf(_ts, LongType()),
        F.pandas_udf(_norm, StringType()),
        F.pandas_udf(_num, StringType()),
        F.pandas_udf(_fkey, BinaryType()),
    )


def bulk_restore(spark, lines_df, db_id: int, chains: bool | None = None,
                 spread: bool = True):
    """Distributed restore: parse dump tuples on executors, resolve
    version chains with iterative joins, return the full primitives
    DataFrame (PRIMITIVES_SCHEMA).

    The driver-side ``do_restore`` replays tuples through the store
    one at a time — right for protocol requests, hours for a
    production-sized 121M-primitive dump (ref
    doc/a-brief-tour-of-graphd.md:203).  Here each partition parses
    its own lines (ids come from the guid serial, so no global
    ordering pass), ``lineage``/``generation`` resolve by walking
    prev-chains breadth-first with equi-joins (depth = max chain
    length, short in practice), and the four linkage-canonical
    columns come from one broadcast-or-shuffle join each against the
    lineage map.  Input: a DataFrame with one version-6 tuple per
    ``value`` row (the payload lines of ``restore ("6" lo hi ...)``).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from graphd_spark.api import _ship_package
    from graphd_spark.model import PRIMITIVES_SCHEMA

    _ship_package(spark)  # workers unpickle the tuple parser

    # the executor parse is tokenize-only: timestamps and the derived
    # comparator columns attach AFTER the chain joins as separate
    # Arrow projections (_derived_columns), so (a) the chain-walk
    # checkpoints materialize raw columns only and (b) a consumer
    # that never reads them (restore_bulk's checksum aggregate) has
    # Catalyst prune the whole derivation out of the plan
    raw_fields = [
        f for f in PRIMITIVES_SCHEMA.fields
        if not f.name.endswith("_lin")
        and f.name not in (
            "lineage", "generation",
            "timestamp", "value_norm", "value_num", "value_fkey",
        )
    ]
    from pyspark.sql.types import StringType, StructField, StructType

    parsed_schema = StructType(
        raw_fields + [StructField("ts_text", StringType(), False)]
    )

    def _parse(batches):
        for pdf in batches:
            cols = parse_tuple_columns(pdf["value"].tolist(), db_id)
            yield pd.DataFrame(cols, columns=list(TUPLE_RAW_COLUMNS))

    _ts_udf, _norm_udf, _num_udf, _fkey_udf = _derived_columns()

    def _finish(df):
        return df.select(
            *[
                c.name for c in PRIMITIVES_SCHEMA.fields
                if c.name not in (
                    "timestamp", "value_norm", "value_num", "value_fkey",
                )
            ],
            _ts_udf(F.col("ts_text")).alias("timestamp"),
            _norm_udf(F.col("value")).alias("value_norm"),
            _num_udf(F.col("value")).alias("value_num"),
            _fkey_udf(F.col("value")).alias("value_fkey"),
        ).select(*[f.name for f in PRIMITIVES_SCHEMA.fields])

    # spread the Python parse across the cluster even when the input
    # arrives in few partitions (e.g. downstream of a global window).
    # ``spread=False`` lets a caller that already widened its source
    # skip the probe — df.rdd.getNumPartitions() compiles the physical
    # plan (~40 ms + codegen) just to count partitions.
    if spread:
        par = spark.sparkContext.defaultParallelism
        if lines_df.rdd.getNumPartitions() < par:
            lines_df = lines_df.repartition(par)
    parsed = lines_df.mapInPandas(_parse, parsed_schema)

    # chain-free probe BEFORE the Python parse: the prev field is the
    # tuple's trailing atom, so a plain suffix test on the raw text
    # decides whether any version chains exist at all — the common
    # fresh-dump case then stays fully lazy, one parse pass total,
    # no checkpoint materialization.  (endswith, not a regex: an
    # end-anchored regex backtracks from every offset and is ~100x
    # slower per line)
    # ``chains`` lets a caller that knows its dump shape (e.g. a fresh
    # generation-0 export) skip the probe scan entirely — on a
    # synthesized or streamed input the probe is a full extra
    # evaluation of the line source
    if chains is not None:
        has_chain = chains
    else:
        trimmed = F.rtrim(F.lower(F.col("value")))
        has_chain = not lines_df.filter(
            ~(
                trimmed.endswith(" 0)")
                | trimmed.endswith(" null)")
                | (F.length(trimmed) == 0)
            )
        ).isEmpty()
    if not has_chain:
        # chain-free dump (every tuple generation 0): lineage is the
        # guid itself and the linkage columns are already canonical —
        # skip the whole join cascade (one scan instead of six
        # shuffles; the common case for fresh dumps)
        df = parsed.withColumn("lineage", F.col("guid")).withColumn(
            "generation", F.lit(0)
        )
        for lk in ("typeguid", "left", "right", "scope"):
            df = df.withColumn(f"{lk}_lin", F.col(lk))
        return _finish(df)
    parsed = parsed.localCheckpoint()  # parse once; the joins reuse

    base = parsed.select("guid", "prev")
    resolved = (
        base.filter(F.col("prev").isNull())
        .select(
            F.col("guid").alias("m_guid"),
            F.col("guid").alias("m_lineage"),
            F.lit(0).alias("m_generation"),
        )
        .localCheckpoint()
    )
    frontier = resolved
    acc = [resolved]
    while True:
        nxt = (
            base.join(
                frontier, base["prev"] == frontier["m_guid"]
            )
            .select(
                F.col("guid").alias("m_guid"),
                F.col("m_lineage"),
                (F.col("m_generation") + 1).alias("m_generation"),
            )
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        acc.append(nxt)
        frontier = nxt
    linmap = acc[0]
    for part in acc[1:]:
        linmap = linmap.union(part)
    linmap = linmap.localCheckpoint()

    df = parsed.join(
        linmap, parsed["guid"] == linmap["m_guid"], "left"
    ).select(
        parsed["*"],
        F.coalesce("m_lineage", "guid").alias("lineage"),
        F.coalesce("m_generation", F.lit(0)).alias("generation"),
    )
    canon = linmap.select(
        F.col("m_guid").alias("c_guid"),
        F.col("m_lineage").alias("c_lin"),
    )
    for lk in ("typeguid", "left", "right", "scope"):
        df = df.join(
            canon, df[lk] == canon["c_guid"], "left"
        ).select(
            *[c for c in df.columns if c not in ("c_guid", "c_lin")],
            F.coalesce("c_lin", lk).alias(f"{lk}_lin"),
        )
    return _finish(df)
