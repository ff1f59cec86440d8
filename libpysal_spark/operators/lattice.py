"""Regular-lattice weights: closed-form neighbor emission.

Reference: ``lat2W`` (weights/util.py:143-232) — rook/queen weights on an
nrows x ncols grid with row-major ids. No geometry needed: neighbors are pure
arithmetic on the id, so the whole build is `spark.range` + explode of a
constant offset array + a semi-join against the id domain — zero Python,
one shuffle. Doubles as the deterministic polygon-fixture generator
(FIXTURES.md §2) and as the raster-contiguity core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph

ROOK_OFFS = [(0, 1), (0, -1), (1, 0), (-1, 0)]
QUEEN_OFFS = ROOK_OFFS + [(1, 1), (1, -1), (-1, 1), (-1, -1)]
BISHOP_OFFS = [(1, 1), (1, -1), (-1, 1), (-1, -1)]


def lat2w(spark: SparkSession, nrows: int, ncols: int, criterion: str = "rook") -> Graph:
    """Lattice weights with row-major ids r*ncols + c (weights/util.py:143-232)."""
    offs = {"rook": ROOK_OFFS, "queen": QUEEN_OFFS, "bishop": BISHOP_OFFS}[criterion]
    off_arr = F.array(*[F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc")) for dr, dc in offs])
    cells = spark.range(nrows * ncols).select(
        F.col("id").alias("focal"),
        (F.col("id") / ncols).cast("long").alias("r"),
        (F.col("id") % ncols).alias("c"),
    )
    edges = (
        cells.withColumn("o", F.explode(off_arr))
        .select(
            "focal",
            (F.col("r") + F.col("o.dr")).alias("nr"),
            (F.col("c") + F.col("o.dc")).alias("nc"),
        )
        .filter(
            (F.col("nr") >= 0) & (F.col("nr") < nrows) & (F.col("nc") >= 0) & (F.col("nc") < ncols)
        )
        .select("focal", (F.col("nr") * ncols + F.col("nc")).alias("neighbor"))
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(edges)


def hex_lat2w(spark: SparkSession, nrows: int, ncols: int) -> Graph:
    """Hexagonal-lattice weights (reference: weights/util.py:59-141).

    Construction: regular rook lattice + diagonal links between an ODD-column
    cell and the two cells below it (odd columns are shifted down half a
    cell). Golden: hexLat2W() neighbors[1] == {0, 6, 2, 5, 7}.
    """
    if nrows == 1 or ncols == 1:
        return lat2w(spark, nrows, ncols, "rook")
    base = lat2w(spark, nrows, ncols, "rook").edges.select("focal", "neighbor")
    cells = spark.range(nrows * ncols).select(
        F.col("id").alias("focal"),
        (F.col("id") / ncols).cast("long").alias("r"),
        (F.col("id") % ncols).alias("c"),
    )
    diag_off = F.array(
        F.struct(F.lit(1).alias("dr"), F.lit(-1).alias("dc")),
        F.struct(F.lit(1).alias("dr"), F.lit(1).alias("dc")),
    )
    down = (
        cells.filter(F.col("c") % 2 == 1)
        .withColumn("o", F.explode(diag_off))
        .select(
            "focal",
            (F.col("r") + F.col("o.dr")).alias("nr"),
            (F.col("c") + F.col("o.dc")).alias("nc"),
        )
        .filter(
            (F.col("nr") >= 0) & (F.col("nr") < nrows)
            & (F.col("nc") >= 0) & (F.col("nc") < ncols)
        )
        .select("focal", (F.col("nr") * ncols + F.col("nc")).alias("neighbor"))
    )
    diag = down.unionByName(
        down.select(F.col("neighbor").alias("focal"), F.col("focal").alias("neighbor"))
    )
    edges = base.unionByName(diag).distinct().withColumn("weight", F.lit(1.0))
    return Graph(edges)


def lattice_polygons(spark: SparkSession, positions: DataFrame, size: float = 1.0) -> DataFrame:
    """Square polygon layer from (id, gx, gy) grid positions.

    Squares of side ``size`` at (gx*size, gy*size) — adjacent grid positions
    share full edges of length ``size``. Produces the contiguity-operator
    input contract ``(id, vertices: array<struct<x, y>>)`` with closed rings —
    the Spark analog of ``build_lattice_shapefile`` (reference:
    weights/user.py:102).
    """
    s = float(size)
    gx, gy = F.col("gx").cast("double") * s, F.col("gy").cast("double") * s

    def pt(xe, ye):
        return F.struct(xe.alias("x"), ye.alias("y"))

    ring = F.array(
        pt(gx, gy),
        pt(gx + s, gy),
        pt(gx + s, gy + s),
        pt(gx, gy + s),
        pt(gx, gy),
    )
    return positions.select("id", ring.alias("vertices"))
