"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data pipelines carry images/audio/video as ``binary`` columns next
to text. This module provides the Spark-side plumbing — schemas, Arrow batch
shapes, partitioning-friendly signatures — with the actual codec calls
STUBBED (no image/audio libraries in this container):

- ``media_metadata``: cheap native-expression metadata (byte length, magic
  sniffing, content hash) — real and fully oracle-checkable;
- ``decode_image`` / ``sample_frames`` / ``extract_audio_features``:
  ``mapInPandas`` operators with production batch shapes. By default they
  raise ``NotImplementedError`` at the codec call site; with
  ``fake=True`` they produce a DETERMINISTIC fake (derived from the bytes)
  so downstream plumbing (schema, joins, ANN over the features) is testable
  end-to-end.

The mapInPandas iterator form keeps peak memory to one Arrow batch of binary
payloads per task — the correct shape for 100 MB media rows at scale (tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for large payloads).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libpysal_spark.tiling import ensure_min_parallelism

MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<htm": "html",
    b"<!DO": "html",
    b"OggS": "ogg",
}


def media_metadata(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Typed metadata over an opaque binary column — native expressions only."""
    p = F.col(payload_col)
    magic = None
    for sig, name in MAGIC.items():
        cond = F.expr(f"substring({payload_col}, 1, {len(sig)})") == F.lit(sig)
        magic = F.when(cond, name) if magic is None else magic.when(cond, name)
    return (
        df.withColumn("media_bytes", F.length(p).cast("long"))
        .withColumn("media_kind", magic.otherwise("unknown"))
        .withColumn("media_hash", F.md5(p))
    )


IMAGE_FEATURE_SCHEMA = (
    "url string, media_bytes long, width int, height int, feature array<float>"
)


def decode_image(
    df: DataFrame, payload_col: str = "html", url_col: str = "url",
    feature_dim: int = 8, fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract an image column (mapInPandas, Arrow-batched).

    Real deployments drop in PIL/torchvision at the marked site; this
    container has no codecs, so fake=False raises NotImplementedError and
    fake=True emits a deterministic stand-in derived from the payload bytes
    (stable across partitionings — safe for tests and plan inspection).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            if not fake:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "plug PIL/torchvision here (fake=True for plumbing tests)"
                )
            rows = []
            for url, b in zip(pdf[url_col], payloads):
                b = bytes(b or b"")
                n = len(b)
                # deterministic fake: dimensions + feature from byte stats
                width = 1 + (n % 1024)
                height = 1 + ((n * 31) % 768)
                feat = [
                    float(sum(b[i::feature_dim][:64]) % 255) / 255.0
                    for i in range(feature_dim)
                ]
                rows.append((url, n, width, height, feat))
            yield pd.DataFrame(
                rows, columns=["url", "media_bytes", "width", "height", "feature"]
            )

    # floor (r6): a single-row-group media file otherwise decodes on ONE
    # core — the classic heavy-UDF case (guide §4/§2.6); at scale the scan
    # has enough splits and the probe is a no-op.
    return ensure_min_parallelism(df.select(url_col, payload_col)).mapInPandas(
        batches, IMAGE_FEATURE_SCHEMA
    )


FRAME_SCHEMA = "url string, frame_idx int, frame_bytes long"


def sample_frames(
    df: DataFrame, payload_col: str = "html", url_col: str = "url",
    every_n: int = 4, fake: bool = False,
) -> DataFrame:
    """Frame-sampling operator shape for video columns (1 row -> N frames).

    Output explodes rows, so the operator must stream — mapInPandas yields
    per-input-batch frames without materializing a video's full frame set.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "video codec not available; plug pyav/ffmpeg here"
                )
            rows = []
            for url, b in zip(pdf[url_col], pdf[payload_col]):
                b = bytes(b or b"")
                n_frames = max(1, len(b) // 257)  # deterministic fake framecount
                for i in range(0, n_frames, every_n):
                    rows.append((url, i, len(b) // max(n_frames, 1)))
            yield pd.DataFrame(rows, columns=["url", "frame_idx", "frame_bytes"])

    return ensure_min_parallelism(df.select(url_col, payload_col)).mapInPandas(
        batches, FRAME_SCHEMA
    )
