"""SparkSession construction tuned for the graphd_spark engine.

Local testing runs on ``local[N]`` (single JVM); production target is a
multi-executor cluster reading ~100 TB.  The settings below are the ones
that matter at both scales:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  replaces the reference's adaptive "producer contest" optimizer
  (ref graphd/graphd-iterator-and-statistics.c:204-381).
- Arrow transfer on (all our Python-side operators are pandas-UDF based).
- shuffle partitions sized for the test box; at cluster scale this is
  superseded by AQE coalescing + advisory partition sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: tables the driver's testdata provides (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "graphd_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4's DataFrame-debugging hook sets a JVM-side origin
        # (extra py4j round trips + a Python stack walk) on EVERY
        # DataFrame API call; the constraint-tree compiler makes
        # hundreds of such calls per request, and disabling the hook
        # measured a 30% faster compile (0.195 s -> 0.136 s per
        # compiled read).  Costs only error-message call-site
        # enrichment — nothing at executor/query time.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def scan_bytes(df) -> int | None:
    """On-disk bytes feeding a scan-rooted frame, from file metadata
    only (no plan compilation, no job).  None when the frame has no
    resolvable local input files."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        path = f[7:] if f.startswith("file://") else f
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    return total


#: (applicationId, sf_dir, file signature) -> {name: DataFrame}.  The
#: cache holds table *plans* (lazy scans + the events ts rebuild), never
#: rows: every action over a cached frame still reads the parquet.
#: Building those plans costs ~90 ms/table of driver round-trips
#: (schema read, temp-view registration), and every inventory query
#: calls load_tables — uncached, that metadata work dominated the
#: simple queries' bench time (~0.9 s of a ~1.0 s total at sf0.1).
_TABLES_CACHE: dict[tuple, dict] = {}


def _sf_signature(sf_dir: str) -> tuple:
    """Cheap freshness token: (name, mtime_ns, size) per table file, so
    a rewritten directory (test fixtures) is never served stale."""
    sig = []
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        try:
            st = os.stat(path)
            sig.append((name, st.st_mtime_ns, st.st_size))
        except OSError:
            continue
    return tuple(sig)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Load the driver's parquet tables from ``sf_dir`` and register temp views.

    Returns {name: DataFrame}.  Missing files are skipped (early SFs may
    lack some tables).  Results are memoized per (session, dir, file
    signature) — see ``_TABLES_CACHE``.
    """
    sf_dir = os.path.abspath(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, _sf_signature(sf_dir))
    cached = _TABLES_CACHE.get(key)
    if cached is not None:
        return cached
    # the driver's events table stores TIMESTAMP(NANOS) which Spark 4
    # refuses by default; read nanos as long and rebuild a (lossless for
    # micro-granular data) TimestampType column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            for field in df.schema.fields:
                if field.name == "ts" and field.dataType.typeName() == "long":
                    from pyspark.sql import functions as F

                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
            df.createOrReplaceTempView(name)
            out[name] = df
    _TABLES_CACHE[key] = out
    # bound the memo: each rewritten/new directory signature adds an
    # entry; FIFO-evict old generations (they just rebuild on miss)
    while len(_TABLES_CACHE) > 32:
        _TABLES_CACHE.pop(next(iter(_TABLES_CACHE)))
    return out
