"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet, and compare row count, column names, and (order-
insensitively) the values.

Comparison is strict: values are canonicalized (floats via repr after a
1e-9 relative guard only for diagnostics — the assert is on exact
canonical form, mirroring a value-hash) and multisets must match.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE

QUERY_NAMES = sorted(entrymod.queries().keys())


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round-trip float; ints render as ints
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        tuple(canon(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_matches_oracle(name, spark, duck):
    fn = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)

    sdf = fn(spark, SF_ORACLE)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check, mirrors driver
        return

    res = duck.execute(oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ms, md = rows_multiset(spark_cols, spark_rows), rows_multiset(duck_cols, duck_rows)
    if ms != md:
        only_s = list((ms - md).items())[:5]
        only_d = list((md - ms).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n only-spark: {only_s}\n only-duck:  {only_d}"
        )
