"""Point-in-polygon join semantics (even-odd ray casting, half-open on max edges)."""

import pytest
from pyspark.sql import functions as F

from libpysal_spark.operators.pip import pip_join


@pytest.fixture(scope="module")
def squares(spark):
    # two unit-10 squares and one triangle
    def ring(pts):
        return [{"x": float(x), "y": float(y)} for x, y in pts]

    rows = [
        (0, ring([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])),
        (1, ring([(20, 0), (30, 0), (30, 10), (20, 10), (20, 0)])),
        (2, ring([(40, 0), (50, 0), (45, 10), (40, 0)])),  # triangle
    ]
    return spark.createDataFrame(rows, "id long, vertices array<struct<x: double, y: double>>")


def test_pip_basic(spark, squares):
    pts = spark.createDataFrame(
        [
            (100, 5.0, 5.0),     # inside square 0
            (101, 25.0, 9.9),    # inside square 1
            (102, 15.0, 5.0),    # between squares
            (103, 45.0, 5.0),    # inside triangle
            (104, 41.0, 9.0),    # outside triangle, inside its bbox
            (105, -3.0, 4.0),    # outside everything
        ],
        "id long, x double, y double",
    )
    got = {(r.point_id, r.polygon_id) for r in pip_join(pts, squares, 5.0).collect()}
    assert got == {(100, 0), (101, 1), (103, 2)}


def test_pip_boundary_half_open(spark, squares):
    pts = spark.createDataFrame(
        [
            (200, 0.0, 5.0),    # on left edge -> inside (half-open)
            (201, 10.0, 5.0),   # on right edge -> outside
            (202, 5.0, 0.0),    # on bottom edge -> inside
            (203, 5.0, 10.0),   # on top edge -> outside
        ],
        "id long, x double, y double",
    )
    got = {(r.point_id, r.polygon_id) for r in pip_join(pts, squares, 5.0).collect()}
    assert got == {(200, 0), (202, 0)}


def test_pip_cell_size_invariance(spark, squares):
    pts = spark.createDataFrame(
        [(i, float(i * 1.37 % 55), float(i * 2.19 % 12)) for i in range(300)],
        "id long, x double, y double",
    )
    a = pip_join(pts, squares, 3.0).orderBy("point_id", "polygon_id").toPandas()
    b = pip_join(pts, squares, 25.0).orderBy("point_id", "polygon_id").toPandas()
    assert a.equals(b)
