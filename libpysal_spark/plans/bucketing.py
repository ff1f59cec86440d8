"""Bucketed weights storage: co-located joins without a shuffle.

At 100 TB the edge table is not rebuilt per query — it is MATERIALIZED once
and joined against attribute tables over and over (lag, describe, every
SpMV). Hash-bucketing the stored table by ``focal`` pre-pays that shuffle:
Spark's bucketed scan exposes the hash partitioning to Catalyst, so
groupBy(focal)/join(focal) plans skip the Exchange on the edge side
entirely (the attribute side still shuffles — it is the small side).

On Iceberg this is a ``bucket(N, focal)`` partition transform +
storage-partitioned joins; on plain Spark tables it is ``bucketBy`` +
``saveAsTable`` (bucket metadata lives in the catalog, which is why this
rides tables, not bare parquet paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph


def write_bucketed(g: Graph, table: str, buckets: int = 32) -> None:
    """Materialize the edge table hash-bucketed (and sorted) by focal."""
    (
        g.edges.write.bucketBy(buckets, "focal")
        .sortBy("focal", "neighbor")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> Graph:
    return Graph(spark.table(table))


def bucketed_lag(spark: SparkSession, table: str, y: DataFrame, value_col: str = "y") -> DataFrame:
    """Spatial lag over a bucketed edge table — the edge side never shuffles:
    the bucketed scan satisfies the aggregation's required distribution."""
    return read_bucketed(spark, table).lag(y, value_col)
