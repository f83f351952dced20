"""Cached JVM expression handles (py4j round-trip elimination).

Every ``F.col()``/``F.lit()`` call costs two py4j round trips (a
getattr on the JVM functions object plus the call); plan-heavy code —
the constraint compiler, the inventory query builders — issues
hundreds per plan, and the round trip, not Python, is the cost
(profiled at ~1.5 ms each under gateway load).  Column objects are
immutable unresolved expressions, so one JVM handle per
(SparkContext, name/literal) serves every plan.  Keys carry the
active SparkContext's id: a restarted context (tests) misses and
rebuilds; stale entries are a few hundred tiny proxies.

No rows or results are ever cached here — only expression fragments,
the same objects a module-level ``COL = F.col("x")`` constant would
hold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_JCACHE: dict = {}


def _ctx_id() -> int:
    from pyspark import SparkContext

    return id(SparkContext._active_spark_context)


def _c(name: str):
    """Cached ``F.col(name)``."""
    key = (_ctx_id(), "col", name)
    col = _JCACHE.get(key)
    if col is None:
        col = _JCACHE[key] = F.col(name)
    return col


def _l(value):
    """Cached ``F.lit(value)`` for hashable scalars (type-keyed, so
    True/1/1.0 stay distinct literals); unhashable values fall
    through to a plain F.lit."""
    try:
        key = (_ctx_id(), "lit", type(value), value)
        lit = _JCACHE.get(key)
    except TypeError:
        return F.lit(value)
    if lit is None:
        lit = _JCACHE[key] = F.lit(value)
    return lit


def _cc(tag: str, build):
    """Cached constant compound expression: ``build()`` runs once per
    SparkContext (e.g. the newest-generation distance predicate every
    compiled read re-derives)."""
    key = (_ctx_id(), "cc", tag)
    e = _JCACHE.get(key)
    if e is None:
        e = _JCACHE[key] = build()
    return e
