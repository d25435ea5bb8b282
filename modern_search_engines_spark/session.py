"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-reproducibility first (UTC session timezone, ANSI
off to match reference float semantics) and for scale second (AQE with
skew-join handling, Arrow batches for the pandas UDFs). On a real cluster
the same builder is used by ``spark-submit --py-files``; only
``master``/executor sizing differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "modern-search-engines-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or \
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    b = (
        SparkSession.builder.appName(app_name).master(master)
        # -- determinism
        .config("spark.sql.session.timeZone", "UTC")
        # -- adaptive execution: runtime shuffle coalescing + skew splits
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- Arrow for pandas UDFs (the extraction/tokenize hot path)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # -- scans: keep splits memory-bounded for wide html rows
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # -- quieter driver
        .config("spark.ui.showConsoleProgress", "false")
    )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
