"""One-shot 10x scale spot-check (VERDICT r8 item 8).

Materializes a synthetic sf1 dataset at /tmp/sf1 by replicating the
sf0.1 parquet tables 10x with key offsetting and content perturbation
(so duplicate rates, join fan-outs, and group cardinalities scale
LINEARLY instead of collapsing onto 10-way clones), then runs the
bench headline at both scales and prints per-query scaling factors.

A linear-ish design (bucketed/banded dedup joins, salted skew joins,
O(log n) components) should land scaling factors near 10x the data at
well under 10x the time on local[32] (Spark amortizes fixed overhead);
anything super-linear beyond shuffle constants is flagged.

Usage: python tools/sf1_spot.py [--build-only|--run-only]

Round-9 measured result (sf1_spot_results_r9.json, local[32]):
10x data -> 2.31x headline wall (49.7s -> 115.0s), zero queries over
10x.  Worst factors: restore_bulk 5.95x (row-heaviest op, closest to
linear in actual data work), collect_contents 3.66x, topk_per_group
3.13x, ann_ivf_topk 2.95x; the text/quality kernels sit near 1.1x
(fixed job overhead dominates at these scales).  Nothing
super-linear: the design audit's claim (bucketed/banded dedup joins,
broadcast ANN sides, salted boilerplate join, O(log n) components)
now has a measured point behind it.

Post-optimization re-run (sf1_spot_results_r9opt.json, N=3 medians):
10x data -> 5.59x headline wall (23.8s -> 133.2s).  The factors ROSE
vs the pre-optimization run because the optimization round removed
the fixed per-query overhead that previously padded the sf0.1
denominator — they now approximate the honest data-work scaling.  Two
entries sit at/over 10x: corpus_vocab_topk 10.02x (exactly linear in
exploded tokens) and restore_bulk 12.42x (1.24x per unit data — the
checksum countDistinct shuffle grows with rows; within shuffle
constants).  Everything else is sub-linear; nothing super-linear
beyond shuffle constants.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
REPLICAS = 10

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

#: per-table key columns to offset per replica (keeps joins sane:
#: replica k's orders point at replica k's customers, etc.)
_OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: small dimensions replicate verbatim (region/nation keys are shared
#: vocabulary — offsetting them would break every join)
_VERBATIM = {"region", "nation"}


def build(spark):
    from pyspark.sql import functions as F

    for t in TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(DST, f"{t}.parquet")
        df = spark.read.parquet(src)
        if t in _VERBATIM:
            df.write.mode("overwrite").parquet(dst)
            continue
        n = df.count()
        base = 10 ** len(str(max(1, n) * REPLICAS))
        rep = df.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        for c in _OFFSET_COLS.get(t, []):
            if c in rep.columns:
                rep = rep.withColumn(
                    c, F.col(c) + F.col("__r") * F.lit(base)
                )
        # perturb content/embeddings per replica so near-dup rates and
        # ANN neighborhoods stay CONSTANT per unit data (clones would
        # turn every doc into a 10-way duplicate and quadratically
        # inflate pair joins — the wrong stress)
        if t == "documents" and "text" in rep.columns:
            rep = rep.withColumn(
                "text",
                F.when(
                    F.col("__r") == 0, F.col("text")
                ).otherwise(
                    F.concat(
                        F.col("text"), F.lit(" r"),
                        F.col("__r").cast("string"),
                    )
                ),
            )
        if t == "embeddings" and "embedding" in rep.columns:
            rep = rep.withColumn(
                "embedding",
                F.when(F.col("__r") == 0, F.col("embedding")).otherwise(
                    F.transform(
                        F.col("embedding"),
                        lambda v, i: v
                        + (
                            F.col("__r").cast("float")
                            * F.lit(0.003)
                            * F.when((i % 2) == 0, F.lit(1.0))
                            .otherwise(F.lit(-1.0))
                        ),
                    )
                ),
            )
        rep.drop("__r").write.mode("overwrite").parquet(dst)
        print(f"built {t}: {n} -> {n * REPLICAS}", file=sys.stderr)


def run_bench(sf_dir: str, runs: int | None = None) -> dict:
    if runs is None:
        # N=3 medians by default: the r9 optimization session measured
        # single-sample runs inflated up to 5x by host-level memory
        # contention; the median filters those spikes out of the
        # scaling factors (override with SF1_SPOT_RUNS)
        runs = int(os.environ.get("SF1_SPOT_RUNS", "3"))
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    env["SPARK_GRAFT_BENCH_SERVING"] = "0"
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=3600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise SystemExit(
            f"bench failed at {sf_dir}:\n{out.stdout}\n{out.stderr[-2000:]}"
        )
    return json.loads(line[-1])


def main():
    args = sys.argv[1:]
    if "--run-only" not in args:
        from graphd_spark.session import get_spark

        spark = get_spark("sf1_build")
        t0 = time.time()
        build(spark)
        print(f"build: {time.time() - t0:.1f}s", file=sys.stderr)
        spark.stop()
        if "--build-only" in args:
            return
    b01 = run_bench(SRC)
    b1 = run_bench(DST)
    factors = {}
    for q, t1 in b1["queries"].items():
        t0 = b01["queries"].get(q)
        if t0:
            factors[q] = round(t1 / t0, 2)
    print(json.dumps({
        "sf0.1_total": b01["value"],
        "sf1_total": b1["value"],
        "total_factor": round(b1["value"] / b01["value"], 2),
        "factors": factors,
        "flagged_over_10x": {
            q: f for q, f in factors.items() if f > 10.0
        },
    }, indent=1))


if __name__ == "__main__":
    main()
