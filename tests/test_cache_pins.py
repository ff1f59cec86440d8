"""VERDICT r2 #3: Graph-construction caches must not outlive their Graph.

resolve_isolates / cell_graph persist a reused branch; the pin is scoped to
the owning Graph via weakref.finalize, so a long query battery leaves zero
DataFrames pinned once its Graphs are garbage-collected.
"""

import gc

from pyspark.sql import functions as F

from libpysal_spark.operators.cellgraph import cell_graph
from libpysal_spark.operators.contiguity import queen, block_weights
from libpysal_spark.operators.distance import distance_band, kernel_weights
from libpysal_spark.operators.lattice import lattice_polygons
from libpysal_spark.pages import document_points

SF = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_battery_leaves_no_pinned_caches(spark):
    pts = document_points(spark, SF)
    pos = spark.range(16).select(
        F.col("id"), (F.col("id") % 4).alias("gx"), (F.col("id") / 4).cast("long").alias("gy")
    )
    regimes = spark.range(16).select(F.col("id"), (F.col("id") % 3).alias("regime"))

    def battery():
        graphs = [
            distance_band(pts, 20.0),
            kernel_weights(pts, 20.0, "gaussian"),
            queen(lattice_polygons(spark, pos)),
            cell_graph(pts, 10.0),
            block_weights(regimes),
        ]
        for g in graphs:
            g.edges.count()  # materialize → caches actually fill
        return None

    gc.collect()
    baseline = _n_persistent(spark)  # other tests' async-cleaned checkpoints
    battery()
    gc.collect()
    assert _n_persistent(spark) <= baseline


def test_explicit_unpersist_releases_now(spark):
    gc.collect()
    baseline = _n_persistent(spark)
    pts = document_points(spark, SF)
    g = distance_band(pts, 20.0)
    g.edges.count()
    assert _n_persistent(spark) >= baseline + 1
    g.unpersist()
    assert _n_persistent(spark) <= baseline
    # and the Graph still works afterwards (recompute, not failure)
    assert g.edges.count() > 0
