"""Cell graph: weights over occupied grid tiles — the H3-graph analog.

Reference: ``build_h3`` (graph/base.py:1599-1660) + ``_build_from_h3``
(graph/_indices.py:4-58): nodes are hex cells, neighbors are cells within
``grid_ring`` order k, weights binary / 1/ring-distance / inverse.

No h3 library exists in this environment, so the engine's tiling cells
(square grid, tiling.py) play the role of the hex index — same architecture
(cell ids are pure column arithmetic), same API shape. Ring distance on the
square grid is the Chebyshev distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph, resolve_isolates
from libpysal_spark.tiling import pack_cell, with_cells


def occupied_cells(points: DataFrame, size: float) -> DataFrame:
    """(cell, cell_x, cell_y, n_points) distinct occupied tiles."""
    return (
        with_cells(points, size)
        .groupBy("cell", "cell_x", "cell_y")
        .agg(F.count("*").alias("n_points"))
    )


def cell_graph(
    points: DataFrame, size: float, order: int = 1, weight: str = "binary"
) -> Graph:
    """Weights over occupied cells; neighbors = occupied cells within
    Chebyshev ring <= order. weight: 'binary' | 'distance' (ring index) |
    'inverse' (1/ring index) — mirroring graph/base.py:1599-1660.
    """
    cells = occupied_cells(points, size).localCheckpoint(eager=False)  # reused by probes + ids
    offs = F.expr(
        f"flatten(transform(sequence(-{order}, {order}, 1), dx -> "
        f"transform(sequence(-{order}, {order}, 1), dy -> struct(dx, dy))))"
    )
    probes = (
        cells.withColumn("__o", F.explode(offs))
        .filter(~((F.col("__o.dx") == 0) & (F.col("__o.dy") == 0)))
        .select(
            F.col("cell").alias("focal"),
            pack_cell(
                F.col("cell_x") + F.col("__o.dx"), F.col("cell_y") + F.col("__o.dy")
            ).alias("probe"),
            F.greatest(F.abs(F.col("__o.dx")), F.abs(F.col("__o.dy"))).alias("ring"),
        )
    )
    hits = probes.join(
        cells.select(F.col("cell").alias("probe")), "probe", "left_semi"
    ).select("focal", F.col("probe").alias("neighbor"), "ring")
    if weight == "binary":
        w = F.lit(1.0)
    elif weight == "distance":
        w = F.col("ring").cast("double")
    elif weight == "inverse":
        w = F.lit(1.0) / F.col("ring")
    else:
        raise ValueError(weight)
    edges = hits.select("focal", "neighbor", w.alias("weight"))
    out = resolve_isolates(edges, cells.select(F.col("cell").alias("id")))
    return Graph(out)
