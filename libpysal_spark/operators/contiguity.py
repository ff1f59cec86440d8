"""Contiguity weights: Queen / Rook via shared-key hash joins, block weights.

Reference semantics:
- Queen — polygons are neighbors iff they share >= 1 vertex; computed by
  inverting a vertex -> {polygon ids} map (reference:
  weights/_contW_lists.py:81-101, graph/_contiguity.py:13-91);
- Rook — share >= 1 full edge; key = sorted vertex pair
  (reference: weights/_contW_lists.py:103-124, graph/_contiguity.py:58-64);
- Block/regime — all pairs within the same label
  (reference: weights/util.py:235-294, graph/_contiguity.py:209-237).

Spark design: the reference's hash-map inversion IS a distributed groupBy —
explode the vertices (or consecutive-vertex edges), then self-join on the
shared key. Two shuffles total (hash by key, hash by focal for isolate
resolution); AQE skew-join handles degenerate hot vertices.

Polygon representation: ``(id, vertices: array<struct<x: double, y: double>>)``
with CLOSED exterior rings (first == last vertex). Holes/multiparts can be
encoded as additional rows sharing the id (vertex/edge keys union naturally,
matching the reference's multipolygon explode at graph/_contiguity.py:51-62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph, resolve_isolates


def _vertex_table(polygons: DataFrame) -> DataFrame:
    """(id, vx, vy) — distinct vertices per polygon."""
    return (
        polygons.select("id", F.explode("vertices").alias("v"))
        .select("id", F.col("v.x").alias("vx"), F.col("v.y").alias("vy"))
        .distinct()
    )


def _edge_table(polygons: DataFrame) -> DataFrame:
    """(id, edge key) — undirected boundary segments per polygon.

    Consecutive vertex pairs from the closed ring, canonicalized by sorting
    the two endpoints (array_sort on structs = lexicographic on fields), so
    both orientations hash to the same key — the reference's
    ``tuple(sorted((v_i, v_{i+1})))`` (weights/_contW_lists.py:103-124).
    """
    segs = polygons.select(
        "id",
        F.explode(
            F.arrays_zip(
                F.slice("vertices", 1, F.size("vertices") - 1).alias("p1"),
                F.slice("vertices", 2, F.size("vertices") - 1).alias("p2"),
            )
        ).alias("s"),
    ).select("id", F.col("s.p1").alias("p1"), F.col("s.p2").alias("p2"))
    # drop zero-length segments, canonicalize direction
    segs = segs.filter(
        (F.col("p1.x") != F.col("p2.x")) | (F.col("p1.y") != F.col("p2.y"))
    ).withColumn("ekey", F.array_sort(F.array("p1", "p2")))
    return segs.select("id", "ekey").distinct()


def _pairs_on_key(keyed: DataFrame, key_cols: list[str]) -> DataFrame:
    """Self-join on the shared key: every pair of distinct ids sharing a key."""
    a = keyed.select(*key_cols, F.col("id").alias("focal"))
    b = keyed.select(*key_cols, F.col("id").alias("neighbor"))
    return (
        a.join(b, key_cols)
        .filter(F.col("focal") != F.col("neighbor"))
        .select("focal", "neighbor")
        .distinct()
    )


def queen(polygons: DataFrame) -> Graph:
    """Queen contiguity (shared vertex), binary weights, isolates as 0-loops."""
    verts = _vertex_table(polygons)
    pairs = _pairs_on_key(verts, ["vx", "vy"])
    edges = pairs.withColumn("weight", F.lit(1.0))
    return Graph(resolve_isolates(edges, polygons.select("id")))


def rook(polygons: DataFrame, perimeter: bool = False) -> Graph:
    """Rook contiguity (shared full edge); ``perimeter=True`` weights by the
    total shared boundary length (reference: graph/_contiguity.py:185-206)."""
    segs = _edge_table(polygons)
    a = segs.select("ekey", F.col("id").alias("focal"))
    b = segs.select("ekey", F.col("id").alias("neighbor"))
    joined = a.join(b, "ekey").filter(F.col("focal") != F.col("neighbor"))
    if perimeter:
        seg_len = F.sqrt(
            (F.col("ekey")[0]["x"] - F.col("ekey")[1]["x"]) ** 2
            + (F.col("ekey")[0]["y"] - F.col("ekey")[1]["y"]) ** 2
        )
        edges = (
            joined.withColumn("__len", seg_len)
            .groupBy("focal", "neighbor")
            .agg(F.sum("__len").alias("weight"))
        )
    else:
        edges = joined.select("focal", "neighbor").distinct().withColumn(
            "weight", F.lit(1.0)
        )
    return Graph(resolve_isolates(edges, polygons.select("id")))


def bishop(polygons: DataFrame) -> Graph:
    """Bishop contiguity = queen minus rook (shared vertex but no shared edge).

    Reference: weights/util.py:1609 context; classic lattice variant.
    """
    q = queen(polygons)
    r = rook(polygons)
    return q.difference(r)


def block_weights(labels: DataFrame, id_col: str = "id", label_col: str = "regime") -> Graph:
    """All pairs sharing a regime label, minus self (weights/util.py:235-294).

    An equi self-join on the label; large regimes are quadratic by definition —
    AQE skew-join splits hot labels (web-scale analog: giant same-host blocks).
    """
    a = labels.select(F.col(label_col).alias("__r"), F.col(id_col).alias("focal"))
    b = labels.select(F.col(label_col).alias("__r"), F.col(id_col).alias("neighbor"))
    pairs = (
        a.join(b, "__r")
        .filter(F.col("focal") != F.col("neighbor"))
        .select("focal", "neighbor")
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(resolve_isolates(pairs, labels.select(F.col(id_col).alias("id"))))
