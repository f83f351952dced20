"""The primitive store: an append-only log of graph tuples.

The reference keeps primitives in an append-only "istore" addressed by
dense local ids, with GUIDs = database-id + serial (ref
libaddb/README:9-15, libpdb/pdb-primitive.h:36-146).  Here the store
is:

- driver-side: a Python list of :class:`~graphd_spark.model.Primitive`
  (the OLTP write path — graphd is single-writer, ref
  doc/a-brief-tour-of-graphd.md:73-82, so writes never need a cluster);
- Spark-side: one ``primitives`` DataFrame (``to_df``) that the read
  compiler plans against.  At scale this DataFrame comes from Parquet
  (``save_parquet``/``load_parquet``); the in-memory log is the
  golden-test / predictable-mode backend and the staging buffer.

Version chains: every primitive carries ``lineage`` (GUID of the first
generation) and ``generation`` (0-based), making the reference's
generation index (libpdb/pdb-generation) a plain pair of columns —
"newest" membership compiles to a window over ``lineage`` instead of a
prev-chain walk.

Write transactions are atomic per request (ref
doc/a-brief-tour-of-graphd.md:73-82): ``begin``/``commit``/``rollback``
bracket each write request; rollback truncates the log back to the
transaction start, so failed writes leave nothing behind.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

from graphd_spark.model import (
    PREDICTABLE_DB_ID,
    PRIMITIVES_SCHEMA,
    PRIMITIVE_FIELDS,
    Primitive,
    guid_compose,
    ts_predictable,
)


class StoreError(Exception):
    code = "SYSTEM"

    @property
    def message(self) -> str:
        return str(self)


class TooBigError(StoreError):
    """Primitive exceeds the storage format's size fields (ref
    libpdb/pdb-primitive-alloc.c:88-115, graphd-write.c:273)."""

    code = "TOOBIG"


#: name length field is 2 bytes (ref PDB_PRIMITIVE_NAMELEN_SIZE)
NAME_MAX = (1 << 16) - 1
#: one istore tile bounds the whole primitive (ref libaddb/addb-tiled)
PRIMITIVE_MAX = 32 * 1024


class PrimitiveStore:
    """Append-only primitive log with driver-side point indexes.

    The driver-side indexes (by guid / name / value) serve the *write*
    pipeline's embedded lookups (type resolution, unique/key/anchor
    matching — ref graphd/graphd-write.c:596-782), which are point
    queries over hot keys.  Analytical reads never use them; they go
    through ``to_df`` + the DataFrame compiler.
    """

    def __init__(self, db_id: int = PREDICTABLE_DB_ID):
        self.db_id = db_id
        self.rows: list[Primitive] = []
        self.by_guid: dict[str, Primitive] = {}
        # guid -> guid of the successor version (None key absent = newest)
        self.next_version: dict[str, str] = {}
        # case-folded value -> ids (ref libpdb hmap PDB_HASH_VALUE is
        # matched case-insensitively, graphd-type.c strncasecmp)
        self._value_ids: dict[str, list[int]] = {}
        self._name_ids: dict[str, list[int]] = {}
        self._txn_start: Optional[int] = None
        self._version = 0  # bumped per commit; invalidates the df cache
        self._df = None
        self._df_version = -1

    # -- transactions -----------------------------------------------------

    def begin(self) -> None:
        if self._txn_start is not None:
            raise StoreError("nested write transaction")
        self._txn_start = len(self.rows)

    def commit(self) -> None:
        self._txn_start = None
        self._version += 1

    def rollback(self) -> None:
        if self._txn_start is None:
            return
        while len(self.rows) > self._txn_start:
            p = self.rows.pop()
            del self.by_guid[p.guid]
            if p.prev is not None:
                self.next_version.pop(p.prev, None)
            if p.value is not None:
                self._value_ids[p.value.lower()].pop()
            if p.name is not None:
                self._name_ids[p.name.lower()].pop()
        self._txn_start = None

    # -- append -----------------------------------------------------------

    @property
    def next_id(self) -> int:
        return len(self.rows)

    def guid_for_id(self, id: int) -> str:
        return guid_compose(self.db_id, id)

    def ts_for_id(self, id: int) -> int:
        """Predictable-mode timestamp for an allocated primitive
        (overridable: v1 restores tick only on allocations, not on
        payload tuples carrying their own timestamps)."""
        return ts_predictable(id)

    def append(
        self,
        *,
        typeguid: str | None = None,
        left: str | None = None,
        right: str | None = None,
        scope: str | None = None,
        prev: str | None = None,
        name: str | None = None,
        value: str | None = None,
        datatype: int | None = None,
        live: bool = True,
        archival: bool = True,
        txstart: bool | None = None,
        timestamp: int | None = None,
        guid: str | None = None,
    ) -> Primitive:
        """Allocate the next id and append one primitive.

        Mirrors pdb_primitive_alloc: datatype defaults to string(2) when
        a value is present, null(1) otherwise (ref graphd-type.c
        write_primitive); predictable timestamps count primitives (ref
        graphd/graphd-predictable.c).
        """
        if name is not None and len(name) + 1 > NAME_MAX:
            raise TooBigError("name too long")
        total = (len(name) if name else 0) + (len(value) if value else 0)
        if total + 128 > PRIMITIVE_MAX:
            raise TooBigError("primitive too big")
        id = self.next_id
        if txstart is None:
            # first primitive of the current write transaction (ref
            # write_primitive: PDB_PRIMITIVE_BIT_TXSTART unless
            # gdw_txstart_written; bootstrap primitives count too)
            txstart = self._txn_start is not None and id == self._txn_start
        if guid is None:
            guid = self.guid_for_id(id)
        if datatype is None:
            datatype = 1 if value is None else 2
        if timestamp is None:
            timestamp = self.ts_for_id(id)
        if prev is not None:
            prev_p = self.by_guid.get(prev)
            if prev_p is None:
                raise StoreError(f"versioning unknown guid {prev}")
            lineage, generation = prev_p.lineage, prev_p.generation + 1
            self.next_version[prev] = guid
        else:
            lineage, generation = guid, 0
        from graphd_spark.comparators import (
            decode_number,
            fuzzy_key,
            render_sci,
            value_norm_key,
        )

        def lin(g: str | None) -> str | None:
            # canonicalize a linkage reference to its lineage head
            # (unknown/foreign guids canonicalize to themselves)
            if g is None:
                return None
            t = self.by_guid.get(g)
            return t.lineage if t is not None else g

        p = Primitive(
            id=id,
            guid=guid,
            typeguid=typeguid,
            left=left,
            right=right,
            scope=scope,
            prev=prev,
            typeguid_lin=lin(typeguid),
            left_lin=lin(left),
            right_lin=lin(right),
            scope_lin=lin(scope),
            name=name,
            datatype=datatype,
            value=value,
            value_norm=value_norm_key(value),
            value_num=(
                None
                if value is None
                or (dec := decode_number(value, scientific=True)) is None
                else render_sci(dec)
            ),
            value_fkey=None if value is None else fuzzy_key(value),
            live=live,
            archival=archival,
            txstart=txstart,
            timestamp=timestamp,
            lineage=lineage,
            generation=generation,
        )
        self.rows.append(p)
        self.by_guid[guid] = p
        if value is not None:
            self._value_ids.setdefault(value.lower(), []).append(id)
        if name is not None:
            self._name_ids.setdefault(name.lower(), []).append(id)
        return p

    # -- driver-side point lookups (write path only) ----------------------

    def get(self, guid: str) -> Optional[Primitive]:
        return self.by_guid.get(guid)

    def is_newest(self, guid: str) -> bool:
        return guid not in self.next_version

    def newest_of(self, guid: str) -> Optional[Primitive]:
        """Follow the version chain from ``guid`` to its newest."""
        p = self.by_guid.get(guid)
        while p is not None and (nxt := self.next_version.get(p.guid)):
            p = self.by_guid.get(nxt)
        return p

    def find_by_value(self, value: str) -> Iterator[Primitive]:
        for id in self._value_ids.get(value.lower(), ()):
            yield self.rows[id]

    def find_by_name(self, name: str) -> Iterator[Primitive]:
        for id in self._name_ids.get(name.lower(), ()):
            yield self.rows[id]

    def lineage_members(self, lineage: str) -> list[str]:
        """All version GUIDs of a lineage (walks the next chain)."""
        out = []
        g: str | None = lineage
        while g is not None:
            p = self.by_guid.get(g)
            if p is None:
                break
            out.append(g)
            g = self.next_version.get(g)
        return out

    # -- Spark view -------------------------------------------------------

    def to_df(self, spark):
        """The ``primitives`` DataFrame (cached until the next commit)."""
        if self._df is not None and self._df_version == self._version:
            return self._df
        data = [p.as_row() for p in self.rows[: self._txn_start]
                ] if self._txn_start is not None else [
                    p.as_row() for p in self.rows]
        self._df = spark.createDataFrame(data, PRIMITIVES_SCHEMA)
        self._df_version = self._version
        return self._df

    # -- Parquet backend (bulk / scale path) ------------------------------

    def save_parquet(self, spark, path: str, partitions: int = 1) -> None:
        self.to_df(spark).repartition(partitions).write.mode(
            "overwrite"
        ).parquet(path)

    def append_parquet(self, spark, path: str, since_id: int = 0) -> int:
        """Append rows with id >= since_id as one commit file — the
        append-only log a replica stream (streaming.py) tails.
        Returns the next id (the dateline horizon)."""
        from graphd_spark.model import PRIMITIVES_SCHEMA

        rows = [p.as_row() for p in self.rows[since_id:]]
        if rows:
            spark.createDataFrame(rows, PRIMITIVES_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(path)
        return len(self.rows)

    @classmethod
    def load_parquet(cls, spark, path: str, db_id: int = PREDICTABLE_DB_ID):
        """Rehydrate the driver-side log from a Parquet primitives table.

        Loads ordered by id; only sensible for stores that fit on the
        driver (tests, dump/restore round-trips).  Analytical use reads
        the DataFrame directly.
        """
        store = cls(db_id=db_id)
        df = spark.read.parquet(path).orderBy("id")
        for r in df.collect():
            d = {f: r[f] for f in PRIMITIVE_FIELDS}
            p = Primitive(**d)
            store.rows.append(p)
            store.by_guid[p.guid] = p
            if p.prev is not None:
                store.next_version[p.prev] = p.guid
            if p.value is not None:
                store._value_ids.setdefault(p.value.lower(), []).append(p.id)
            if p.name is not None:
                store._name_ids.setdefault(p.name.lower(), []).append(p.id)
        store._version += 1
        return store

    def __len__(self) -> int:
        return len(self.rows)
