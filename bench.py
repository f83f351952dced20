"""Benchmark runner: headline inventory queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is executed to completion (count of the materialized result,
so the full plan runs; nothing is collected to the driver beyond the
count).  Timing includes plan + execution, not session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphd_spark.session import get_spark  # noqa: E402
from graphd_spark import (  # noqa: E402,F401
    inventory,
    inventory_events,
    inventory_gql,
    inventory_media,
    inventory_pipeline,
)

# headline set: the operator families that dominate real workloads —
# the graphd template-join shape, top-k/window paths, versioning dedup,
# and the scale-critical pipeline ops (near-dup detection, ANN).
HEADLINE = [
    "scan_project_filter",
    "linkage_join_2hop",
    "semi_join_exists",
    "anti_join_count0",
    "cardinality_atleast",
    "isa_distinct_expand",
    "count_per_parent",
    "sort_multikey_topk",
    "topk_per_group",
    "newest_version_dedup",
    "timestamp_range_agg",
    "events_window_agg",
    "collect_contents",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "dedup_components",
    "corpus_vocab_topk",
    "events_asof_join",
    "events_sessionize",
    "media_features",
    "text_quality_score",
    "restore_bulk",
    # parsed graphd queries through the constraint-tree compiler
    "gql_linkage_semi",
    "gql_sort_topk",
    "gql_contents_count",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("graphd_spark_bench")
    # warm the JVM + load table metadata outside the timed region
    from graphd_spark.session import load_tables

    load_tables(spark, sf_dir)
    # one throwaway job primes whole-stage codegen, shuffle services
    # and the parquet footer cache so the first timed query measures
    # the plan, not JIT warmup
    from pyspark.sql import functions as _F

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        _F.col("l_quantity") > 0
    ).groupBy("l_returnflag").count().count()
    # building the graph-store session (31 protocol writes into the
    # parquet log) is data load, not query execution — do it here so
    # the gql_* timings measure the compiled read plans
    inventory_gql._graph(spark, sf_dir)

    import gc

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = inventory.QUERIES[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
        # free the query's cached/checkpointed blocks before the next
        # timed region: dropping the DataFrame refs lets Spark's
        # ContextCleaner unpersist localCheckpoint RDDs, so one
        # query's working set doesn't become the next one's GC load
        gc.collect()
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "inventory_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
