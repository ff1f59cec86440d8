"""Streaming ingest == batch result (bit-identical), rollups, resume."""

import os

import pytest
from pyspark.sql import functions as F

from libpysal_spark.pages import pages
from libpysal_spark.streaming.ingest import (
    dedup_stream, read_pages_stream, tile_rollup_stream, tiled_pages_stream,
    write_tiled,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def drops_dir(spark, tmp_path_factory):
    """Pages split into 4 parquet 'WARC drops'."""
    d = str(tmp_path_factory.mktemp("drops"))
    p = pages(spark, SF)
    p.withColumn("__b", F.col("doc_id") % 4).repartition("__b").write.partitionBy(
        "__b"
    ).parquet(d + "/tmp")
    # flatten the partition dirs into plain drop files
    src = spark.read.parquet(d + "/tmp")
    for b in range(4):
        src.filter(F.col("__b") == b).drop("__b").coalesce(1).write.mode(
            "append"
        ).parquet(d + "/in")
    return d + "/in"


def test_stream_matches_batch(spark, drops_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = tiled_pages_stream(read_pages_stream(spark, drops_dir))
    q = write_tiled(stream, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out).select("url", "text", "x", "y", "tile_r0", "tile_r1")
    batch = tiled_pages_stream(spark.read.parquet(drops_dir)).select(
        "url", "text", "x", "y", "tile_r0", "tile_r1"
    )
    a = got.orderBy("url").toPandas()
    b = batch.orderBy("url").toPandas()
    assert a.equals(b)  # bit-identical stream vs batch (same expressions)


def test_stream_resume_is_incremental(spark, drops_dir, tmp_path):
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    q = write_tiled(tiled_pages_stream(read_pages_stream(spark, drops_dir)), out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # restart with the same checkpoint: nothing new -> no duplicates
    q2 = write_tiled(tiled_pages_stream(read_pages_stream(spark, drops_dir)), out, ckpt)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == 500


def test_dedup_stream_drops_repeats(spark, drops_dir, tmp_path):
    """Planted duplicate texts across drops: only the first survives."""
    dup_dir = str(tmp_path / "dupdrops")
    src = spark.read.parquet(drops_dir)
    src.write.parquet(dup_dir)
    # re-drop the first 50 docs with new ids (same text -> same hash)
    src.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    ).write.mode("append").parquet(dup_dir)

    # dup ids shift warc_ts by ~2.8h; keep them inside the dedup horizon
    stream = dedup_stream(read_pages_stream(spark, dup_dir), watermark="12 hours")
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckptd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select content_hash from dedup")
    assert out.count() == out.select("content_hash").distinct().count()
    # every distinct text in the source appears exactly once
    n_distinct = src.select(F.md5("text")).distinct().count()
    assert out.count() == n_distinct


def test_stateful_running_totals_resume(spark, drops_dir, tmp_path):
    """applyInPandasWithState: running per-tile totals survive a checkpointed
    restart — the second run over NEW files continues the counts."""
    from libpysal_spark.streaming.ingest import tile_running_totals

    src_dir = str(tmp_path / "statedrops")
    ckpt = str(tmp_path / "ckpts")
    src = spark.read.parquet(drops_dir)
    src.filter(F.col("doc_id") < 300).write.parquet(src_dir)

    out_dir = str(tmp_path / "stateout")

    def run_once():
        stream = tile_running_totals(
            tiled_pages_stream(read_pages_stream(spark, src_dir))
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def latest_total():
        upd = spark.read.parquet(out_dir)
        return (
            upd.groupBy("tile_r0").agg(F.max("pages").alias("pages"))
            .agg(F.sum("pages")).first()[0]
        )

    run_once()
    assert latest_total() == 300
    # drop the remaining docs and RESTART from the same checkpoint
    src.filter(F.col("doc_id") >= 300).write.mode("append").parquet(src_dir)
    run_once()
    assert latest_total() == 500  # state resumed, not recounted


def test_tile_rollup_counts(spark, drops_dir, tmp_path):
    stream = tile_rollup_stream(tiled_pages_stream(read_pages_stream(spark, drops_dir)))
    q = (
        stream.writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select sum(pages) as total from rollup").first().total
    assert got == 500
    per_tile = spark.sql("select count(distinct tile_r0) as t from rollup").first().t
    assert per_tile > 1
