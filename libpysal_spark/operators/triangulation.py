"""Proximity graphs: Gabriel and Relative-Neighborhood, as join + anti-join.

Reference semantics (weights/gabriel.py):
- Gabriel (:285-330): keep edge (i, j) iff NO third point k satisfies
  d_ij^2 > d_ik^2 + d_jk^2 (k strictly inside the circle with diameter ij —
  Thales). The reference filters Delaunay edges, but Gabriel ⊆ Delaunay, so
  testing all candidate pairs against all blockers yields the identical graph.
- RNG (:333-370, Toussaint 1980): keep (i, j) iff NO k has
  max(d_ik, d_jk) < d_ij (strict).

Spark design: these are *relational* definitions — a candidate-pair table
anti-joined against a blocker-witness table. Two modes:

- ``candidate_radius=None``: exact brute force (cross join); test scale only.
- ``candidate_radius=R``: grid-pruned. Candidate edges come from the band
  join (d <= R); a blocker for (i, j) must lie inside the diameter circle,
  i.e. within d_ij/2 of the midpoint, so blockers are found by a ring join on
  midpoint cells of size R/2. Exact whenever R >= the longest Gabriel/RNG
  edge (Gabriel/RNG edges are Delaunay edges, which are short in
  quasi-uniform data); callers should verify no surviving edge is within one
  cell of R and widen otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph, resolve_isolates
from libpysal_spark.operators.distance import candidate_pairs
from libpysal_spark.tiling import pack_cell


def _all_pairs(points: DataFrame) -> DataFrame:
    a = points.select(
        F.col("id").alias("focal"), F.col("x").alias("x_f"), F.col("y").alias("y_f")
    )
    b = points.select(
        F.col("id").alias("neighbor"), F.col("x").alias("x_n"), F.col("y").alias("y_n")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("focal") != F.col("neighbor"))
        .withColumn(
            "dist",
            F.sqrt(
                (F.col("x_f") - F.col("x_n")) * (F.col("x_f") - F.col("x_n"))
                + (F.col("y_f") - F.col("y_n")) * (F.col("y_f") - F.col("y_n"))
            ),
        )
    )


def _blockers_brute(pairs: DataFrame, points: DataFrame, predicate) -> DataFrame:
    """Anti-join pairs against witnesses satisfying ``predicate`` (brute force)."""
    k = points.select(
        F.col("id").alias("k"), F.col("x").alias("x_k"), F.col("y").alias("y_k")
    )
    witnesses = (
        pairs.crossJoin(k)
        .filter((F.col("k") != F.col("focal")) & (F.col("k") != F.col("neighbor")))
        .filter(predicate)
        .select("focal", "neighbor")
        .distinct()
    )
    return pairs.join(witnesses, ["focal", "neighbor"], "left_anti")


def _blockers_grid(pairs: DataFrame, points: DataFrame, predicate, radius: float) -> DataFrame:
    """Grid-pruned witness search: witnesses lie within d_ij of both endpoints,
    hence within the ring cover of the pair midpoint at radius d_ij/2 + eps."""
    s = float(radius) / 2.0
    mid = pairs.withColumn("mx", (F.col("x_f") + F.col("x_n")) / 2.0).withColumn(
        "my", (F.col("y_f") + F.col("y_n")) / 2.0
    )
    mid = mid.withColumn("mcx", F.floor(F.col("mx") / F.lit(s))).withColumn(
        "mcy", F.floor(F.col("my") / F.lit(s))
    )
    offs = F.expr(
        "flatten(transform(sequence(-2, 2), dx -> transform(sequence(-2, 2), dy -> struct(dx, dy))))"
    )
    probes = mid.withColumn("__o", F.explode(offs)).withColumn(
        "probe", pack_cell(F.col("mcx") + F.col("__o.dx"), F.col("mcy") + F.col("__o.dy"))
    )
    pts = points.select(
        F.col("id").alias("k"),
        F.col("x").alias("x_k"),
        F.col("y").alias("y_k"),
        pack_cell(F.floor(F.col("x") / F.lit(s)), F.floor(F.col("y") / F.lit(s))).alias("kcell"),
    )
    witnesses = (
        probes.join(pts, probes.probe == pts.kcell)
        .filter((F.col("k") != F.col("focal")) & (F.col("k") != F.col("neighbor")))
        .filter(predicate)
        .select("focal", "neighbor")
        .distinct()
    )
    return pairs.join(witnesses, ["focal", "neighbor"], "left_anti")


def _build(points: DataFrame, predicate_builder, candidate_radius: float | None) -> Graph:
    if candidate_radius is None:
        pairs = _all_pairs(points)
        kept = _blockers_brute(pairs, points, predicate_builder())
    else:
        pairs = candidate_pairs(points, candidate_radius)
        kept = _blockers_grid(pairs, points, predicate_builder(), candidate_radius)
    edges = kept.select("focal", "neighbor").withColumn("weight", F.lit(1.0))
    return Graph(resolve_isolates(edges, points.select("id")))


def _d2(ax, ay, bx, by):
    # multiplication, not pow — bit-identical across engines (see distance._dist)
    dx = F.col(ax) - F.col(bx)
    dy = F.col(ay) - F.col(by)
    return dx * dx + dy * dy


def gabriel(points: DataFrame, candidate_radius: float | None = None) -> Graph:
    """Gabriel graph (reference: weights/gabriel.py:285-330)."""

    def pred():
        dij2 = _d2("x_f", "y_f", "x_n", "y_n")
        dik2 = _d2("x_f", "y_f", "x_k", "y_k")
        djk2 = _d2("x_n", "y_n", "x_k", "y_k")
        return dij2 > (dik2 + djk2)

    return _build(points, pred, candidate_radius)


def relative_neighborhood(points: DataFrame, candidate_radius: float | None = None) -> Graph:
    """Relative neighborhood graph (reference: weights/gabriel.py:333-370)."""

    def pred():
        dij = F.sqrt(_d2("x_f", "y_f", "x_n", "y_n"))
        dik = F.sqrt(_d2("x_f", "y_f", "x_k", "y_k"))
        djk = F.sqrt(_d2("x_n", "y_n", "x_k", "y_k"))
        return F.greatest(dik, djk) < dij

    return _build(points, pred, candidate_radius)
