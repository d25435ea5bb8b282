"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-reproducibility first (UTC session timezone; ANSI
mode stays at the Spark 4 default of ON — expressions that can divide by
zero or cast loosely are guarded at the expression level instead, see
``operators/quality.py``) and for scale second (AQE with
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
    # Under spark-submit the JVM gateway already exists and --master was
    # decided by the submitter (local[N] here, yarn/k8s on a cluster).
    # Calling builder.master() there would OVERRIDE the submitted master
    # with this module's local default — measured: a spark-submit
    # --master local[1] build ran at local[*] speed, and on a real
    # cluster the driver would silently fall back to local mode. The
    # gateway env vars are the reliable launched-by-spark-submit signal.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if under_submit:
        master = None
    else:
        master = master or os.environ.get("SPARK_GRAFT_MASTER") or \
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    jvm_opts = "-XX:+UseParallelGC"
    # scoped logging config (Spark defaults + a deny filter for the
    # benign PythonAccumulatorV2 update-race stack traces — see the file
    # header). Only when the packaged file exists on the driver's disk:
    # inside a --py-files zip it does not, and Spark's defaults apply.
    log_conf = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "conf", "log4j2.properties")
    if os.path.exists(log_conf):
        jvm_opts += f" -Dlog4j2.configurationFile=file:{log_conf}"
    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    b = (
        b
        # -- local-mode heap: everything (driver+executors) lives in one
        #    JVM; the 1g default OOMs on wide token-array rows. Applied at
        #    first JVM launch; later sessions in the same process inherit.
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.maxResultSize", "4g")
        # -- throughput GC: G1's GCLocker stalls serialize 32 allocation-
        #    heavy task threads + Arrow native I/O in one local JVM;
        #    ParallelGC measured ~2x faster on the full index build
        .config("spark.driver.extraJavaOptions", jvm_opts)
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # -- determinism
        .config("spark.sql.session.timeZone", "UTC")
        # -- adaptive execution: runtime shuffle coalescing + skew splits
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- Arrow for pandas UDFs (the extraction/tokenize hot path)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # -- scans: zstd token-array/posting tables compress ~10:1, so a
        #    128m split carries >1 GiB of decompressed, CPU-dense work and
        #    strangles scan parallelism at bench scale (measured 3x on the
        #    tf stage). 8m keeps ~1 file per split locally; a cluster-scale
        #    deployment reading TB tables raises this via env.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"))
        # -- vectorized-reader batches: extracted rows carry 1..3-gram
        #    token arrays (KBs/row); 4096-row column vectors blow the heap
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # -- quieter driver
        .config("spark.ui.showConsoleProgress", "false")
    )
    # -- shuffle/spill scratch on the fastest local medium: shuffle
    #    blocks are transient, so tmpfs is the single-box analog of the
    #    local NVMe every cluster node gives its shuffle service; on
    #    this sandbox it takes gVisor's slow disk path out of every
    #    shuffle write AND read. A cluster deployment points this at
    #    its SSD array via SPARK_GRAFT_LOCAL_DIR (or leaves the
    #    platform default by setting it to ""). The tmpfs default is
    #    CAPACITY-GUARDED: spill exists to relieve memory pressure, so
    #    redirecting it to RAM-backed tmpfs on a host where /dev/shm is
    #    small (the common 50%-of-RAM default) would turn big-build
    #    spills into ENOSPC instead of disk I/O — only auto-pick tmpfs
    #    when it has a healthy floor (≥32 GiB free) of headroom; below
    #    that, an operator must opt in explicitly via the env var.
    scratch = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if scratch is None and os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 32 * 2**30:
                scratch = "/dev/shm/spark-graft-local"
        except OSError:
            pass
    if scratch and "SPARK_LOCAL_DIRS" not in os.environ:
        # via the env var, not spark.local.dir conf: the conf route is
        # ignored-with-a-WARN under any cluster manager, the env var is
        # the documented mechanism everywhere
        os.makedirs(scratch, exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = scratch
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
