"""Capture .explain('formatted') for every headline query.

Usage:
    python tools/capture_plans.py <suffix> [query ...]

Writes plans/r09/<query>_<suffix>.txt for each headline query (or the
named subset).  Also prints a one-line plan-shape summary per query:
Exchange count, join strategies, Python-eval nodes, pushed filters.
"""

from __future__ import annotations

import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphd_spark.session import get_spark  # noqa: E402
from graphd_spark import (  # noqa: E402,F401
    inventory,
    inventory_events,
    inventory_gql,
    inventory_media,
    inventory_pipeline,
)
import bench  # noqa: E402


def summarize(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"^\s*[+:]?-?\s*\(?\d*\)?\s*Exchange", plan, re.M)),
        "BHJ": plan.count("BroadcastHashJoin"),
        "SMJ": plan.count("SortMergeJoin"),
        "SHJ": plan.count("ShuffledHashJoin"),
        "BNLJ": plan.count("BroadcastNestedLoopJoin"),
        "Cartesian": plan.count("CartesianProduct"),
        "PyEval": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        "MapInPandas": plan.count("MapInPandas") + plan.count("MapInArrow"),
        "Window": len(re.findall(r"\(\d+\) Window", plan)),
        "Codegen": plan.count("WholeStageCodegen"),
    }
    return ", ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or bench.HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r09",
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("graphd_spark_plans")
    from graphd_spark.session import load_tables

    load_tables(spark, sf_dir)
    inventory_gql._graph(spark, sf_dir)
    for name in names:
        fn = inventory.QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        try:
            sys.stdout = buf
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {summarize(plan)}")
    spark.stop()


if __name__ == "__main__":
    main()
