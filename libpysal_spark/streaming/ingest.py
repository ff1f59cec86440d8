"""Structured-Streaming ingest: pages stream → geocode → tile → sink.

The reference is fully batch; the 100 TB deployment is not — Common-Crawl
style corpora arrive as rolling WARC drops. This layer keeps the batch
engine's exact column expressions (geocoder + tiler are the same pure
arithmetic, so stream and batch agree bit-for-bit) and adds:

- ``tiled_pages_stream`` — stateless projection stream (scan-shaped, no
  state store);
- ``write_tiled`` — file sink partitioned by coarse tile with checkpointing
  (exactly-once per file-sink semantics; the streaming analog of the lineage
  manifest);
- ``tile_rollup_stream`` — watermarked windowed per-tile counts (late data
  bounded by the watermark; state store = per-tile running aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libpysal_spark.pages import geocode_exprs
from libpysal_spark.tiling import pack_cell

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, doc_id long"
)


def read_pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of pages parquet drops (one file per micro-batch
    discovery; maxFilesPerTrigger bounds batch size at scale)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def tiled_pages_stream(pages: DataFrame, coarse: float = 100.0, fine: float = 10.0) -> DataFrame:
    """Add (x, y) geocode and two tile resolutions — identical expressions to
    the batch path (pages.geocode_exprs), so stream output is bit-identical
    to a batch run over the same files."""
    x, y = geocode_exprs("doc_id")
    out = pages.withColumn("x", x).withColumn("y", y)
    return (
        out.withColumn("tile_r0", pack_cell(F.floor(F.col("x") / coarse), F.floor(F.col("y") / coarse)))
        .withColumn("tile_r1", pack_cell(F.floor(F.col("x") / fine), F.floor(F.col("y") / fine)))
    )


def write_tiled(tiled: DataFrame, output_dir: str, checkpoint_dir: str):
    """Append sink partitioned by coarse tile; checkpointed for exact resume."""
    return (
        tiled.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("tile_r0")
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(pages: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: keep the first page per content hash.

    The streaming face of text/dedup.exact_duplicates — state is the set of
    hashes seen within the watermark horizon
    (``dropDuplicatesWithinWatermark``), so state size is bounded by the
    dedup window instead of the whole corpus; cross-window dups are the batch
    job's responsibility (the standard lambda split for trillion-row dedup).
    """
    return (
        pages.withColumn("content_hash", F.md5(F.col("text")))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def tile_running_totals(tiled: DataFrame) -> DataFrame:
    """Custom stateful operator: per-tile RUNNING page count + byte total.

    ``applyInPandasWithState`` — the escape hatch for aggregations Spark's
    built-in streaming aggs can't express (here: monotone running totals
    emitted every micro-batch, no window). State per tile = (pages, bytes);
    persisted in the state store, so a checkpointed restart resumes the
    totals exactly — the streaming face of the lineage-resume contract.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (tile,) = key
        cnt, tot = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            cnt += len(pdf)
            tot += int(pdf["text"].str.len().sum())
        state.update((cnt, tot))
        yield pd.DataFrame([(tile, cnt, tot)], columns=["tile_r0", "pages", "text_chars"])

    return (
        tiled.select("tile_r0", "text")
        .groupBy("tile_r0")
        .applyInPandasWithState(
            fn,
            outputStructType="tile_r0 long, pages long, text_chars long",
            stateStructType="pages long, text_chars long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tile_rollup_stream(
    tiled: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-(tile, event-time-window) page counts with a late-data watermark."""
    return (
        tiled.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("tile_r0"))
        .agg(
            F.count("*").alias("pages"),
            # exact distinct is unsupported on streams; HLL sketch is the
            # standard streaming answer (and the 100 TB answer too)
            F.approx_count_distinct("lang").alias("langs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("tile_r0"),
            F.col("pages"),
            F.col("langs"),
        )
    )
