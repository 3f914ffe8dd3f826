"""SparkSession factory with scale-aware defaults.

Local mode is a stand-in for a multi-executor cluster: all knobs below
(AQE, shuffle-partition sizing, Arrow batching, skew-join) are the ones
that matter at 100 TB, and are set so the same code path is exercised
locally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fgcspark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    cores: parallelism for local mode (defaults to $SPARK_GRAFT_CPUS or '*').
    On a real cluster this builder is a no-op passthrough: master comes
    from spark-submit and the sql confs still apply.
    """
    from pyspark import SparkConf

    # respect spark-submit: if a master is already configured (cluster
    # deploy), don't override it and don't apply local-only knobs
    submitted_master = SparkConf(loadDefaults=True).get("spark.master", None)
    if submitted_master is not None:
        master = submitted_master
    elif cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    is_local = master.startswith("local")
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds pandas-UDF memory per task. Profiled
        # on the spatial core at 32 cores (round 2): 10k batches cost
        # ~1.5-1.7x vs 64k+ (per-batch IPC + kernel-invocation overhead
        # dominates at high worker counts); 64k keeps the heaviest
        # batch (footprint rows with WKT strings) under ~15 MB/worker.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("FGC_ARROW_BATCH", "65536"),
        )
        .config("spark.driver.memory", os.environ.get("FGC_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Local test/bench files are single small parquets; split them
    # finely so scans feed every core. The 2m default applies ONLY in
    # local mode — builder.config beats spark-submit --conf, so forcing
    # it on a cluster would mean tens of millions of tasks at 100 TB
    # (ADVICE r1). FGC_MAX_PARTITION_BYTES always wins when set.
    mpb = os.environ.get("FGC_MAX_PARTITION_BYTES")
    if mpb:
        builder = builder.config("spark.sql.files.maxPartitionBytes", mpb)
    elif is_local:
        builder = builder.config("spark.sql.files.maxPartitionBytes", "2m")
    if is_local:
        builder = builder.config("spark.sql.files.openCostInBytes", "262144")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
