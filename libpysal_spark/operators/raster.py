"""Raster contiguity: lattice adjacency over (band, row, col) cells.

Reference: ``da2WSP`` (weights/raster.py:186-400) builds rook/queen weights
over an xarray DataArray with nodata masking and optional k-order neighbors
(via matrix power); its chunked joblib builder (:878-965) is the one place
the reference already thinks in partitions.

Spark design: a raster is a DataFrame of live cells ``(band, row, col,
value)`` (nodata rows filtered — at 100 TB the mask is a parquet predicate
that never leaves the scan). Neighbors are generated closed-form per cell by
exploding a constant offset array, then inner-joined against the live-cell
set — the join discards both out-of-grid and nodata neighbors in one pass.
Node id = the reference's flattened index ``band * (nrows*ncols) + row*ncols
+ col`` (weights/raster.py:265-267 MultiIndex flattening).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph, resolve_isolates
from libpysal_spark.operators.lattice import QUEEN_OFFS, ROOK_OFFS


def raster_contiguity(
    cells: DataFrame,
    nrows: int,
    ncols: int,
    criterion: str = "queen",
    k: int = 1,
    include_nodata: bool = False,
) -> Graph:
    """Contiguity weights over live raster cells.

    ``cells``: (band, row, col) of LIVE cells (caller filters nodata; that is
    the reference's mask semantics). ``k > 1`` composes the k=1 graph with
    ``higher_order(lower_order=True)`` — matrix-power semantics, so nodata
    gaps block k-step paths exactly as in the reference
    (weights/raster.py:232-246).
    """
    if k > 1:
        g1 = raster_contiguity(cells, nrows, ncols, criterion, 1)
        return g1.higher_order(k, lower_order=True)
    offs = QUEEN_OFFS if criterion == "queen" else ROOK_OFFS
    off_arr = F.array(
        *[F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc")) for dr, dc in offs]
    )
    plane = nrows * ncols
    nid = (F.col("band").cast("long") * plane + F.col("row").cast("long") * ncols + F.col("col")).alias("id")
    live = cells.select(nid, "band", "row", "col")
    probes = live.withColumn("o", F.explode(off_arr)).select(
        F.col("id").alias("focal"),
        "band",
        (F.col("row") + F.col("o.dr")).alias("nr"),
        (F.col("col") + F.col("o.dc")).alias("nc"),
    ).filter(
        (F.col("nr") >= 0) & (F.col("nr") < nrows) & (F.col("nc") >= 0) & (F.col("nc") < ncols)
    )
    target = live.select(
        F.col("id").alias("neighbor"),
        F.col("band").alias("nb"),
        F.col("row").alias("nr"),
        F.col("col").alias("nc"),
    )
    edges = (
        probes.join(target, (probes.band == target.nb) & (probes.nr == target.nr) & (probes.nc == target.nc))
        .select("focal", "neighbor")
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(resolve_isolates(edges, live.select("id")))


def generate_array(
    values: DataFrame,
    nrows: int,
    ncols: int,
    nbands: int = 1,
    value_col: str = "value",
    nodata: float = float("nan"),
) -> np.ndarray:
    """Dense (band, row, col) export of flat-indexed values — driver side.

    Reference: graph/base.py:2991-3006 ``generate_da`` (xarray DataArray
    rebuild from the flattened MultiIndex). No xarray in this environment, so
    the export is a plain numpy array; missing (nodata) cells are filled with
    ``nodata``. ``values``: (id, value) with id = band*(nrows*ncols) +
    row*ncols + col — the same flattening as raster_contiguity. Driver-side
    by definition (a dense raster must fit wherever it is consumed).
    """
    out = np.full((nbands, nrows, ncols), nodata, dtype=float)
    plane = nrows * ncols
    for r in values.select("id", value_col).collect():
        b, rest = divmod(int(r["id"]), plane)
        rr, cc = divmod(rest, ncols)
        out[b, rr, cc] = float(r[value_col])
    return out[0] if nbands == 1 else out
