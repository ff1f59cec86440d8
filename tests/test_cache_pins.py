"""r6 cache-lifetime policy for builder-internal reuse caches.

resolve_isolates / fuzzy_contiguity / cell_graph cut their reused branch
with a LAZY local checkpoint. Lifetime follows the JVM plan references: the
blocks live while any derived DataFrame's plan is reachable and are
reclaimed by Spark's context cleaner once the plans are garbage-collected.
(The r2-era Graph-scoped persist pin unpersisted the cache before the first
action in the `Graph(...).edges` pattern — the builder join ran twice; see
OPTIMIZATION_r06.md.)

These tests pin the two halves of the policy: (a) the checkpoint actually
fills during an action (reuse works), and (b) a query battery does not grow
the persisted-RDD set without bound once references are dropped.
"""

import gc
import time

from pyspark.sql import functions as F

from libpysal_spark.operators.cellgraph import cell_graph
from libpysal_spark.operators.contiguity import queen, block_weights
from libpysal_spark.operators.distance import distance_band, kernel_weights
from libpysal_spark.operators.lattice import lattice_polygons
from libpysal_spark.pages import document_points

SF = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _drain(spark, floor, timeout=90):
    """gc (Python + JVM) until the persistent-RDD count drops to ``floor``
    or the timeout passes; returns the final count. The context cleaner is
    asynchronous AND needs job activity to flush the last plan references,
    so the drain interleaves a small real job with the GC cycles — exactly
    the steady-state of a live query session."""
    deadline = time.time() + timeout
    n = _n_persistent(spark)
    while n > floor and time.time() < deadline:
        gc.collect()
        spark.range(200000).select(F.sum("id")).collect()  # churn
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.25)
        n = _n_persistent(spark)
    return n


def test_checkpoint_fills_during_action(spark):
    pts = document_points(spark, SF)
    g = distance_band(pts, 20.0)
    before = _n_persistent(spark)
    assert g.edges.count() > 0
    # the lazy checkpoint materialized during the count: the SECOND consumer
    # (the isolate anti-join inside the same action) read blocks, not a
    # recomputed join — visible as a persisted RDD while `g` is alive
    assert _n_persistent(spark) >= before
    del g


def test_battery_does_not_accumulate_caches(spark):
    pts = document_points(spark, SF)
    pos = spark.range(16).select(
        F.col("id"), (F.col("id") % 4).alias("gx"), (F.col("id") / 4).cast("long").alias("gy")
    )
    regimes = spark.range(16).select(F.col("id"), (F.col("id") % 3).alias("regime"))

    gc.collect()
    baseline = _drain(spark, 0, timeout=30)

    def battery():
        graphs = [
            distance_band(pts, 20.0),
            kernel_weights(pts, 20.0, "gaussian"),
            queen(lattice_polygons(spark, pos)),
            cell_graph(pts, 10.0),
            block_weights(regimes),
        ]
        for g in graphs:
            g.edges.count()  # materialize -> checkpoints actually fill
        return None

    battery()
    # all Graphs/DataFrames dropped -> the context cleaner reclaims every
    # battery checkpoint; nothing stays pinned for the session
    n = _drain(spark, baseline)
    assert n <= baseline
