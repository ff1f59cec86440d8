"""Well-Known Text geometry IO -> the engine's polygon DataFrame form.

Reference: io/iohandlers/wkt.py (WKTReader: one WKT geometry per line, ids =
0-based line positions) + cg/shapes.py polygon semantics. The parser here is
written from the public OGC Simple Features WKT grammar (coordinates are
space-separated ``x y`` pairs, comma-separated within a ring, rings
parenthesized, polygons hold 1+ rings, multipolygons hold 1+ polygons).

Output schema matches operators/contiguity.py's convention:
``(id long, vertices array<struct<x double, y double>>)`` — one row per
RING, rows sharing an id belong to the same (multi)polygon record, rings
closed (first == last vertex).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_NUM = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")


def _ring(text: str) -> list[tuple[float, float]]:
    nums = [float(m) for m in _NUM.findall(text)]
    ring = [(nums[i], nums[i + 1]) for i in range(0, len(nums) - 1, 2)]
    if ring and ring[0] != ring[-1]:
        ring.append(ring[0])  # close (WKT files in the wild vary)
    return ring


def _split_top(text: str) -> list[str]:
    """Split a paren-group body on top-level commas."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return parts


def parse_wkt(line: str) -> list[list[tuple[float, float]]]:
    """One WKT geometry -> list of rings (each a closed (x, y) list).

    POINT/MULTIPOINT/LINESTRING yield degenerate 'rings' (the raw vertex
    list) so callers can still explode vertices; POLYGON yields its rings;
    MULTIPOLYGON concatenates each member polygon's rings (the contiguity
    builders union vertex/edge keys across rows/rings, matching the
    reference's multipolygon explode, graph/_contiguity.py:51-62).
    """
    s = line.strip()
    if not s:
        return []
    head = s.split("(", 1)
    if len(head) < 2:
        return []
    kind = head[0].strip().upper().replace(" Z", "").replace(" M", "")
    body = head[1].rsplit(")", 1)[0]
    if kind.startswith("MULTIPOLYGON"):
        rings = []
        for poly in _split_top(body):
            inner = poly.strip()
            inner = inner[1:-1] if inner.startswith("(") else inner
            for r in _split_top(inner):
                rings.append(_ring(r))
        return [r for r in rings if r]
    if kind.startswith("POLYGON"):
        return [r for r in (_ring(r) for r in _split_top(body)) if r]
    # POINT / MULTIPOINT / LINESTRING: one vertex list, not closed
    nums = [float(m) for m in _NUM.findall(body)]
    return [[(nums[i], nums[i + 1]) for i in range(0, len(nums) - 1, 2)]]


def read_wkt(spark: SparkSession, path: str) -> DataFrame:
    """WKT file (one geometry per line) -> polygon DataFrame.

    Ids are 0-based line positions, as the reference WKTReader assigns
    (io/iohandlers/wkt.py:76-80). Parsing is distributed: the text file is
    read as a DataFrame and rings are extracted in an Arrow-batched iterator
    (mapInPandas), so a 100-TB WKT dump never funnels through the driver.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    # dense 0-based line ids WITHOUT a global single-task sort (ADVICE r4):
    # count rows per file-split partition (one small aggregate), then each
    # partition numbers its own lines from its offset — zipWithIndex-style.
    # Text splits preserve in-file line order and partition ids follow split
    # order, the same guarantee monotonically_increasing_id relies on.
    counts = {
        r.p: r.c
        for r in raw.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    offs = {}
    acc = 0
    for p in sorted(counts):
        offs[p] = acc
        acc += counts[p]
    b_offs = spark.sparkContext.broadcast(offs)

    def gen(it):
        from pyspark import TaskContext

        pos = b_offs.value.get(TaskContext.get().partitionId(), 0)
        for pdf in it:
            out = []
            for txt in pdf["value"]:
                rid = pos
                pos += 1
                for ring in parse_wkt(str(txt)):
                    out.append(
                        (rid, [{"x": float(x), "y": float(y)} for x, y in ring])
                    )
            yield pd.DataFrame(out, columns=["id", "vertices"])

    return raw.mapInPandas(
        gen, "id long, vertices array<struct<x double, y double>>"
    )


def write_wkt(polygons: DataFrame, path: str) -> None:
    """Polygon DataFrame -> WKT file, one POLYGON/MULTIPOLYGON per id.

    Driver-side (mirror of the reference's sequential writer; geometry
    fixture files are metadata-sized — big layers live as parquet)."""
    pdf = polygons.orderBy("id").toPandas()
    by_id: dict[int, list[list[tuple[float, float]]]] = {}
    for rid, verts in zip(pdf["id"], pdf["vertices"]):
        ring = [(float(v["x"]), float(v["y"])) for v in verts]
        by_id.setdefault(int(rid), []).append(ring)

    def fmt_ring(r):
        return "(" + ",".join(f"{x:.15g} {y:.15g}" for x, y in r) + ")"

    # OGC semantics (ADVICE r4): listing several rings inside one POLYGON
    # makes rings 2..k read as HOLES. The engine's ring-list model carries
    # no exterior/hole roles (multi-ring records come from MULTIPOLYGON
    # reads), so multi-ring records are written as a MULTIPOLYGON of
    # single-ring polygons — valid WKT for external consumers and a
    # lossless round-trip through read_wkt's flattening. Hole semantics are
    # not representable in this model (documented limitation).
    with open(path, "w") as f:
        for rid in sorted(by_id):
            rings = by_id[rid]
            if len(rings) == 1:
                f.write("POLYGON (" + fmt_ring(rings[0]) + ")\n")
            else:
                f.write(
                    "MULTIPOLYGON ("
                    + ",".join("(" + fmt_ring(r) + ")" for r in rings)
                    + ")\n"
                )


# ---------------------------------------------------------------------------
# WKB + sqlite geometry tables (reference: io/iohandlers/db.py reads a SQL
# table's GEOMETRY column through sqlalchemy + shapely.wkb; this engine uses
# the stdlib sqlite3 module and a minimal WKB codec written from the public
# OGC WKB spec — Point 1, Polygon 3, MultiPolygon 6, both byte orders)
def parse_wkb(buf: bytes) -> list[list[tuple[float, float]]]:
    """WKB geometry -> list of vertex rings (Point yields one 1-point ring)."""
    import struct

    def geom(b, pos):
        bo = "<" if b[pos] == 1 else ">"
        (raw_gt,) = struct.unpack_from(f"{bo}I", b, pos + 1)
        pos += 5
        # EWKB flag handling (ADVICE r5): the PostGIS SRID flag means 4 SRID
        # bytes follow the type word — skip them (they are NOT a ring
        # count); Z/M flags and ISO Z/M type codes (1001, 2003, 3006, ...)
        # carry per-vertex dimensions this 2-D codec does not decode — raise
        # a clear error instead of misparsing coordinates.
        if raw_gt & 0x20000000:  # EWKB SRID flag
            pos += 4
        if raw_gt & 0xC0000000:  # EWKB Z / M flags
            raise ValueError(
                f"EWKB Z/M geometry (type word 0x{raw_gt:08x}) not supported: "
                "plain 2-D WKB only"
            )
        gt = raw_gt & 0x1FFFFFFF
        if gt >= 1000:  # ISO WKB Z/M/ZM code ranges (1000/2000/3000 offsets)
            raise ValueError(
                f"ISO WKB Z/M geometry type {gt} not supported: plain 2-D WKB only"
            )
        if gt == 1:
            x, y = struct.unpack_from(f"{bo}2d", b, pos)
            return [[(x, y)]], pos + 16
        if gt == 3:
            (nr,) = struct.unpack_from(f"{bo}I", b, pos)
            pos += 4
            rings = []
            for _ in range(nr):
                (np_,) = struct.unpack_from(f"{bo}I", b, pos)
                pos += 4
                flat = struct.unpack_from(f"{bo}{2 * np_}d", b, pos)
                pos += 16 * np_
                rings.append(
                    [(flat[2 * i], flat[2 * i + 1]) for i in range(np_)]
                )
            return rings, pos
        if gt == 6:
            (ng,) = struct.unpack_from(f"{bo}I", b, pos)
            pos += 4
            rings = []
            for _ in range(ng):
                sub, pos = geom(b, pos)
                rings.extend(sub)
            return rings, pos
        raise ValueError(f"unsupported WKB geometry type {gt}")

    rings, _ = geom(buf, 0)
    return rings


def to_wkb(rings: list[list[tuple[float, float]]]) -> bytes:
    """Vertex rings -> WKB (Polygon for 1+ rings, Point for one 1-point ring)."""
    import struct

    if len(rings) == 1 and len(rings[0]) == 1:
        (x, y) = rings[0][0]
        return struct.pack("<BI2d", 1, 1, x, y)
    out = [struct.pack("<BII", 1, 3, len(rings))]
    for r in rings:
        out.append(struct.pack("<I", len(r)))
        out.append(struct.pack(f"<{2 * len(r)}d", *[c for p in r for c in p]))
    return b"".join(out)


def read_sqlite_geometries(
    spark: SparkSession,
    path: str,
    table: str,
    geom_column: str = "GEOMETRY",
    id_column: str | None = None,
) -> DataFrame:
    """sqlite table with a WKB geometry column -> (id, vertices) DataFrame.

    ``id_column=None`` numbers rows 0-based in rowid order (the reference's
    feature order). Metadata-sized DBs parse driver-side; a big layer's rows
    land as a normal distributed DataFrame afterwards.
    """
    import sqlite3

    import pandas as pd  # noqa: F401

    con = sqlite3.connect(path)
    try:
        sel = (
            f'SELECT {id_column}, "{geom_column}" FROM "{table}"'
            if id_column
            else f'SELECT rowid, "{geom_column}" FROM "{table}" ORDER BY rowid'
        )
        rows = []
        for i, (rid, blob) in enumerate(con.execute(sel)):
            out_id = int(rid) if id_column else i
            for ring in parse_wkb(bytes(blob)):
                rows.append(
                    (out_id, [{"x": float(x), "y": float(y)} for x, y in ring])
                )
    finally:
        con.close()
    return spark.createDataFrame(
        rows, "id long, vertices array<struct<x double, y double>>"
    )


def write_sqlite_geometries(
    polygons: DataFrame, path: str, table: str, geom_column: str = "GEOMETRY"
) -> None:
    """(id, vertices) DataFrame -> sqlite table with WKB blobs (multi-ring
    ids become one Polygon with multiple rings)."""
    import sqlite3

    pdf = polygons.orderBy("id").toPandas()
    by_id: dict = {}
    for rid, verts in zip(pdf["id"], pdf["vertices"]):
        by_id.setdefault(int(rid), []).append(
            [(float(v["x"]), float(v["y"])) for v in verts]
        )
    con = sqlite3.connect(path)
    try:
        con.execute(f'DROP TABLE IF EXISTS "{table}"')
        con.execute(
            f'CREATE TABLE "{table}" (id INTEGER PRIMARY KEY, "{geom_column}" BLOB)'
        )
        con.executemany(
            f'INSERT INTO "{table}" VALUES (?, ?)',
            [(rid, to_wkb(rings)) for rid, rings in sorted(by_id.items())],
        )
        con.commit()
    finally:
        con.close()
