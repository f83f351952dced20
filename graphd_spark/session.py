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
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Load the driver's parquet tables from ``sf_dir`` and register temp views.

    Returns {name: DataFrame}.  Missing files are skipped (early SFs may
    lack some tables).
    """
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
    return out
