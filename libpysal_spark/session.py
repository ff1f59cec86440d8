"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point and scaled down for local mode:
AQE on (runtime re-plan + skew-join splitting — coincident web geocodes make
hot cells, cf. reference graph/_kernel.py:310-369), shuffle partitions sized
to parallelism, Arrow enabled for the few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "libpysal-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Return (or create) a SparkSession configured for this engine.

    On a real cluster these settings arrive via spark-submit conf; locally we
    mirror them. AQE coalescing means over-provisioning shuffle partitions is
    safe — partitions merge at runtime.
    """
    cores = str(cores or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores) * 2, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        # local mode: driver heap IS the executor heap — size it for real
        # workloads (persisted edge tables, checkpointed iteration state)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    return builder.getOrCreate()
