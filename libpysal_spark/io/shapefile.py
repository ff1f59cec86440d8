"""Distributed ESRI shapefile reader — .shx-offset partitioned record parse.

Reference: io/iohandlers/pyShpIO.py:78 + the pure-python shapefile core
(cg/shapes + io/util/shapefile) read records SEQUENTIALLY on one machine.
Spark-first version, written from the public spec (ESRI Shapefile Technical
Description, 1998): the tiny .shx sidecar is the RECORD OFFSET INDEX —
8 bytes per record. The driver reads only the .shx (16 bytes + 8/record),
partitions the offset list, and each task seeks directly to its records in
the .shp — embarrassingly parallel record parsing with no full-file scan on
the driver and no sequential dependency. On a cluster the same pattern runs
against any storage with ranged reads (posix, HDFS pread, S3 range GET).

Shape types supported: 1 (Point), 5 (Polygon), 3 (PolyLine) — the types the
reference's weights builders consume. Output matches the engine's polygon
model: one row per ring, ``(id, vertices)`` with closed rings (multi-ring
records emit one row per ring, the same flattening as read_wkt).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession


def _read_shx(path: str) -> list[tuple[int, int]]:
    """[(byte_offset, content_len_words)] per record from the .shx index."""
    data = open(path, "rb").read()
    out = []
    for pos in range(100, len(data), 8):
        off, clen = struct.unpack(">ii", data[pos : pos + 8])
        out.append((off * 2, clen))
    return out


def parse_record(buf: bytes) -> list[list[tuple[float, float]]]:
    """One .shp record content -> list of vertex rings (or a 1-point ring)."""
    st = struct.unpack("<i", buf[0:4])[0]
    if st == 0:
        return []
    if st == 1:  # Point
        x, y = struct.unpack("<2d", buf[4:20])
        return [[(x, y)]]
    if st in (3, 5):  # PolyLine / Polygon: identical layouts
        num_parts, num_points = struct.unpack("<ii", buf[36:44])
        parts = struct.unpack(f"<{num_parts}i", buf[44 : 44 + 4 * num_parts])
        pts_off = 44 + 4 * num_parts
        flat = struct.unpack(
            f"<{num_points * 2}d", buf[pts_off : pts_off + 16 * num_points]
        )
        points = [(flat[2 * i], flat[2 * i + 1]) for i in range(num_points)]
        rings = []
        for pi, start in enumerate(parts):
            end = parts[pi + 1] if pi + 1 < num_parts else num_points
            rings.append(points[start:end])
        return rings
    raise ValueError(f"unsupported shape type {st}")


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """.shp (+ .shx sidecar) -> (id, vertices) polygon/ring DataFrame.

    Ids are 0-based record numbers, as the reference reader assigns.
    """
    import pandas as pd

    shx = path[:-4] + ".shx" if path.endswith(".shp") else path + ".shx"
    index = _read_shx(shx)
    recs = spark.createDataFrame(
        [(i, off, clen) for i, (off, clen) in enumerate(index)],
        "id long, off long, clen long",
    ).repartition(max(1, min(len(index) // 64 + 1, 64)))

    def gen(it):
        fh = open(path, "rb")
        for pdf in it:
            out = []
            for rid, off, clen in zip(pdf["id"], pdf["off"], pdf["clen"]):
                fh.seek(int(off) + 8)  # skip the 8-byte record header
                buf = fh.read(int(clen) * 2)
                for ring in parse_record(buf):
                    out.append(
                        (
                            int(rid),
                            [{"x": float(x), "y": float(y)} for x, y in ring],
                        )
                    )
            yield pd.DataFrame(out, columns=["id", "vertices"])

    return recs.mapInPandas(
        gen, "id long, vertices array<struct<x double, y double>>"
    )
