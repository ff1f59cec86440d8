"""Strict contiguity (T-junctions), hex lattice goldens, cell graph, orders."""

import pytest
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph
from libpysal_spark.operators.cellgraph import cell_graph
from libpysal_spark.operators.contiguity import queen, queen_strict, rook, rook_strict
from libpysal_spark.operators.lattice import hex_lat2w, lat2w


def _nbrs(g: Graph) -> dict:
    n, _ = g.neighbor_dicts()
    return {k: set(v) for k, v in n.items()}


@pytest.fixture(scope="module")
def t_junction(spark):
    """Square [0,2]^2 (id 0) left of two stacked squares [2,4]x[0,2] (1) and
    [2,4]x[2,4] (2): 0 touches 1 along y in [0,2] and touches 2 only at the
    corner point (2,2). Vertex (2,2) belongs to 1 and 2 but NOT to 0 — a
    T-junction: hash contiguity misses all of 0's neighbors."""

    def ring(pts):
        return [{"x": float(x), "y": float(y)} for x, y in pts]

    rows = [
        (0, ring([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)])),
        (1, ring([(2, 0), (4, 0), (4, 2), (2, 2), (2, 0)])),
        (2, ring([(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)])),
    ]
    return spark.createDataFrame(rows, "id long, vertices array<struct<x: double, y: double>>")


def test_strict_vs_hash_t_junction(spark, t_junction):
    # hash path: 0 shares vertices (2,0) and (2,2)? 0's ring has (2,0),(2,2)
    # and 1's ring has both -> hash finds 0-1. But make a REAL T-junction:
    # shift 0 to [0,2]x[0,4] spanning both right squares with no shared vertex
    def ring(pts):
        return [{"x": float(x), "y": float(y)} for x, y in pts]

    rows = [
        (0, ring([(0, 0), (2, 0), (2, 4), (0, 4), (0, 0)])),
        (1, ring([(2, 0), (4, 0), (4, 2), (2, 2), (2, 0)])),
        (2, ring([(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)])),
    ]
    polys = spark.createDataFrame(rows, "id long, vertices array<struct<x: double, y: double>>")
    # vertex-hash rook: 0 and 1 share vertices (2,0) but no full identical edge
    hash_rook = _nbrs(rook(polys))
    assert 1 not in hash_rook[0] or 2 not in hash_rook[0]  # T-junction blind spot
    strict = _nbrs(rook_strict(polys, 4.0))
    assert strict[0] == {1, 2}  # positive-length shared boundary with both
    assert strict[1] == {0, 2}
    qstrict = _nbrs(queen_strict(polys, 4.0))
    assert qstrict[0] == {1, 2}


def test_strict_agrees_with_hash_on_aligned_lattice(spark):
    from libpysal_spark.operators.lattice import lattice_polygons

    pos = spark.range(9).select(
        F.col("id"), (F.col("id") % 3).alias("gx"), (F.col("id") / 3).cast("long").alias("gy")
    )
    polys = lattice_polygons(spark, pos)
    assert rook(polys).equals(rook_strict(polys, 2.0))
    assert queen(polys).equals(queen_strict(polys, 2.0))


def test_hex_lattice_golden(spark):
    # weights/util.py:59 doctest: hexLat2W() neighbors[1] == [0,6,2,5,7]
    wh = _nbrs(hex_lat2w(spark, 5, 5))
    assert wh[1] == {0, 6, 2, 5, 7}
    assert wh[21] == {16, 20, 22}
    # degenerate fallback = linear contiguity
    assert _nbrs(hex_lat2w(spark, 1, 4))[1] == {0, 2}


def test_cell_graph(spark):
    pts = spark.createDataFrame(
        [(i, float(i % 5) * 10, float(i // 5) * 10) for i in range(25)],
        "id long, x double, y double",
    )
    g = cell_graph(pts, 10.0, order=1)
    card = {r.id: r.cardinality for r in g.cardinalities().collect()}
    # 5x5 occupied cells, queen-1 adjacency: corners 3, edges 5, interior 8
    assert sorted(card.values())[:4] == [3, 3, 3, 3]
    assert max(card.values()) == 8
    inv = cell_graph(pts, 10.0, order=2, weight="inverse")
    ws = {r.weight for r in inv.edges.collect() if r.weight > 0}
    assert ws == {1.0, 0.5}


def test_order_table_path(spark):
    g = Graph.from_dicts(spark, {0: [1], 1: [0, 2], 2: [1, 3], 3: [2]})
    got = {(r.focal, r.neighbor): r.order for r in g.order_table(3).collect()}
    assert got[(0, 1)] == 1 and got[(0, 2)] == 2 and got[(0, 3)] == 3
    assert got[(1, 3)] == 2


def test_dense_id_mapping(spark):
    g = Graph.from_dicts(spark, {10: [30], 30: [10, 20], 20: [30]})
    m = {r.old: r.new for r in g.dense_id_mapping().collect()}
    assert m == {10: 0, 20: 1, 30: 2}
