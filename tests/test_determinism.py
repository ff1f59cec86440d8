"""Cluster-size-invariance evidence (north_rule): identical outputs under
different parallelism, partitioning, and shuffle configuration."""

import pytest

from libpysal_spark.operators.distance import distance_band, knn
from libpysal_spark.pages import document_points

SF = "/root/testdata/sf0.001"


def _with_shuffle(spark, n: int):
    spark.conf.set("spark.sql.shuffle.partitions", str(n))


def test_distance_band_partition_invariance(spark):
    pts = document_points(spark, SF)
    _with_shuffle(spark, 4)
    a = distance_band(pts.repartition(3), 30.0).sorted().toPandas()
    _with_shuffle(spark, 32)
    b = distance_band(pts.repartition(17), 30.0).sorted().toPandas()
    _with_shuffle(spark, 8)
    assert a.equals(b)


def test_knn_partition_invariance(spark):
    pts = document_points(spark, SF)
    _with_shuffle(spark, 4)
    a = knn(pts.repartition(2), 5).sorted().toPandas()
    _with_shuffle(spark, 32)
    b = knn(pts.repartition(19), 5).sorted().toPandas()
    _with_shuffle(spark, 8)
    assert a.equals(b)


def test_lag_deterministic_fold_invariance(spark):
    from pyspark.sql import functions as F

    pts = document_points(spark, SF)
    y = pts.select("id", (F.col("x") * 1e-3 + F.col("y")).alias("y"))
    g = distance_band(pts, 30.0).transform("R")
    _with_shuffle(spark, 4)
    a = g.lag(y, deterministic=True).orderBy("id").toPandas()
    _with_shuffle(spark, 32)
    b = g.lag(y, deterministic=True).orderBy("id").toPandas()
    _with_shuffle(spark, 8)
    # bit-identical doubles, not just approximately equal
    assert (a["lag"].to_numpy() == b["lag"].to_numpy()).all()


def test_embedding_near_dup_partition_invariance(spark):
    """The tiled block-pair GEMM plan must emit the identical exact pair set
    under different input partitioning, shuffle sizing, and tile counts."""
    from libpysal_spark.text.ann import cosine_threshold_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _with_shuffle(spark, 4)
    a = cosine_threshold_pairs(emb.repartition(3), 0.35, blocks=5).orderBy(
        "doc_a", "doc_b"
    ).toPandas()
    _with_shuffle(spark, 32)
    b = cosine_threshold_pairs(emb.repartition(13), 0.35, blocks=9).orderBy(
        "doc_a", "doc_b"
    ).toPandas()
    _with_shuffle(spark, 8)
    assert a.equals(b)


def test_partitioned_delaunay_partition_invariance(spark):
    """Halo-verified partitioned Delaunay: identical edge set under different
    parallelism AND different macro-cell grids."""
    from libpysal_spark.operators.delaunay import delaunay

    pts = document_points(spark, SF).filter("id < 300")  # deterministic subset
    _with_shuffle(spark, 4)
    a = delaunay(pts.repartition(2), cells_per_side=3).sorted().toPandas()
    _with_shuffle(spark, 32)
    b = delaunay(pts.repartition(11), cells_per_side=5).sorted().toPandas()
    _with_shuffle(spark, 8)
    assert a.equals(b)
