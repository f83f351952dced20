"""graphd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of googlearchive/graphd.

The reference (graphd, the Metaweb/Freebase tuple store) is a C server
evaluating a template-based graph query language over one universal
"primitive" tuple table.  This package re-expresses that capability
Spark-first:

- ``graphd_spark.schema``     — the universal primitives schema (ref doc/gr-model.txt)
- ``graphd_spark.guid``       — GUID codec (db id + serial <-> 32-hex)
- ``graphd_spark.store``      — append-only store + `current` view (newest/live dedup)
- ``graphd_spark.gql``        — lexer/parser for the graphd query language (ref libgdp/)
- ``graphd_spark.plans``      — constraint-tree -> DataFrame compiler (ref graphd/graphd-read*.c)
- ``graphd_spark.write``      — write pipeline: version/unique/key/anchor (ref graphd/graphd-write.c)
- ``graphd_spark.functions``  — comparators, glob ~=, text analysis, dedup, similarity
- ``graphd_spark.sources``    — dump/restore codec (ref graphd/graphd-dump.c)
- ``graphd_spark.streaming``  — replica stream (ref graphd/graphd-replica.c)

Design notes: declare plans with the DataFrame API and let Catalyst pick
physical strategy; Python UDFs only for the ``~=`` glob automaton and
vector math that built-ins cannot express (and those are Arrow-batched
pandas UDFs).  Everything here is derived from public knowledge: the
Apache Spark API and the reference repository's documented behavior.
"""

__version__ = "0.1.0"
