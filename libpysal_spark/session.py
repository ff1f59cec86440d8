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
        # r6 (guide §3.1 / §9): let the planner pick shuffled-hash joins when
        # the per-partition build side fits — sort-merge pays two full sorts
        # per join that hash joins skip. AQE skew splitting stays on, so a
        # skewed build partition is split rather than OOMing. Env-overridable
        # for A/B and cluster-specific rollback.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        # r6 (guide §4.2 batch sizing analog for JVM aggs): collect_list /
        # first-style object aggregates fall back to SORT-based aggregation
        # after only 128 distinct keys per task by default — the kNN top-k
        # and per-cell tagging aggregates carry 10^4-10^5 keys per task whose
        # buffers are k-bounded structs (a few MB at 65k keys), so the hash
        # path is both faster and memory-safe; past the threshold it still
        # spills via the sort fallback.
        .config(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            os.environ.get("SPARK_GRAFT_OBJ_AGG_KEYS", "65536"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    return builder.getOrCreate()
