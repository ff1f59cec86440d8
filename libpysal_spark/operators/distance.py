"""Distance-family weights builders: distance band, kernel, kNN.

Reference semantics:
- DistanceBand — all pairs with d <= threshold, binary or d^alpha weights
  (reference: weights/distance.py:748-1009, graph/_kernel.py:372-379);
- Kernel — K(d/h) over compact-support candidates
  (reference: graph/_kernel.py:38-261, kernels.py:243-310);
- KNN — k nearest neighbors, self excluded
  (reference: weights/distance.py:33-164, graph/_kernel.py:264-369).

Spark design: the KDTree (cg/kdtree.py:33) is replaced by the grid-cell
candidate join (tiling.py). The sparse O(N·avg_neighbors) fast path the
reference special-cases (graph/_kernel.py:117-126) is inherent here — the
candidate join IS the sparse path; a dense pairwise matrix is never
materialized. kNN uses ring expansion: resolve points whose kth neighbor is
provably inside the searched ring (kth_dist <= r*s), widen the ring only for
the rest — a driver-coordinated loop whose unresolved side shrinks
geometrically, so at 1000 executors each round is a small skew-free join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph, resolve_isolates
from libpysal_spark.functions.kernels import kernel_expr
from libpysal_spark.tiling import explode_to_ring, with_cells

POINT_COLS = ("id", "x", "y")


def _dist() -> F.Column:
    # plain multiply (not pow): IEEE mul/add/sqrt are correctly rounded and
    # bit-identical across engines — required for threshold filters and kNN
    # ranking to be reproducible against the SQL oracle and across cluster
    # sizes (north_rule invariance).
    dx = F.col("x_f") - F.col("x_n")
    dy = F.col("y_f") - F.col("y_n")
    return F.sqrt(dx * dx + dy * dy)


def candidate_pairs(points: DataFrame, radius: float, cell_size: float | None = None) -> DataFrame:
    """All ordered pairs (focal != neighbor) within ``radius``, exactly once.

    One side keeps its own cell; the other is exploded to the covering ring —
    each qualifying pair meets on exactly one (probe_cell == cell) key, so no
    post-join dedup. Returns (focal, neighbor, x_f, y_f, x_n, y_n, dist).
    """
    s = float(cell_size or radius)
    # ring count r such that r*s >= radius (ceil)
    r = max(1, int(-(-radius // s)))
    left = with_cells(points.select(*POINT_COLS), s)
    left = explode_to_ring(left, r).select(
        F.col("id").alias("focal"),
        F.col("x").alias("x_f"),
        F.col("y").alias("y_f"),
        F.col("cell_probe"),
    )
    right = with_cells(points.select(*POINT_COLS), s).select(
        F.col("id").alias("neighbor"),
        F.col("x").alias("x_n"),
        F.col("y").alias("y_n"),
        F.col("cell"),
    )
    pairs = left.join(right, left.cell_probe == right.cell).filter(
        F.col("focal") != F.col("neighbor")
    )
    return pairs.withColumn("dist", _dist()).filter(F.col("dist") <= F.lit(float(radius))).drop(
        "cell_probe", "cell"
    )


def distance_band(
    points: DataFrame,
    threshold: float,
    binary: bool = True,
    alpha: float = -1.0,
    cell_size: float | None = None,
) -> Graph:
    """DistanceBand weights (reference: weights/distance.py:748-1009).

    binary: w = 1 for d <= threshold; else w = d**alpha (inverse distance /
    gravity, reference :923-931). Isolates (no neighbor within threshold)
    become zero-weight self-loops, matching the reference's island handling.
    """
    pairs = candidate_pairs(points, threshold, cell_size)
    if binary:
        w = F.lit(1.0)
    else:
        w = F.pow(F.col("dist"), F.lit(float(alpha)))
    edges = pairs.select("focal", "neighbor", w.alias("weight"))
    return Graph(resolve_isolates(edges, points.select("id")))


def kernel_weights(
    points: DataFrame,
    bandwidth: float,
    kernel: str = "gaussian",
    taper: bool = True,
    cell_size: float | None = None,
) -> Graph:
    """Kernel weights with fixed bandwidth (reference: graph/_kernel.py:38-261).

    Candidates come from the compact-support band join (d <= bandwidth when
    taper=True — the reference's sparse fast path, graph/_kernel.py:189-203);
    the kernel itself is a native SQL expression (functions/kernels.py).
    """
    pairs = candidate_pairs(points, bandwidth, cell_size)
    w = kernel_expr(kernel, F.col("dist"), F.lit(float(bandwidth)), taper=taper)
    edges = pairs.select("focal", "neighbor", w.alias("weight"))
    return Graph(resolve_isolates(edges, points.select("id")))


def knn(
    points: DataFrame,
    k: int,
    cell_size: float | None = None,
    initial_ring: int = 1,
    max_rounds: int = 5,
    coincident: str = "clique",
) -> Graph:
    """K nearest neighbors, self excluded, binary weights.

    Reference: weights/distance.py:33-164 / graph/_kernel.py:264-369 (KDTree
    ``query(k=k+1)``). Distributed strategy — ring expansion:

    1. bucket points into grid cells (heuristic size: expected ~2k points per
       (2r+1)^2 block);
    2. join each focal against candidates within Chebyshev ring r; keep top-k
       by (dist, neighbor) — the deterministic tie-break the reference leaves
       to kdtree order (weights/distance.py:71); we pin neighbor-id order for
       cluster-size-invariant output;
    3. a focal is *resolved* when it found >= k candidates with kth distance
       <= r*s (no unseen point can be closer — grid guarantee);
    4. unresolved foci (sparse regions) re-join with doubled ring; after
       ``max_rounds`` the residue is broadcast-cross-joined (it is tiny).

    Duplicate coordinates at web scale (coincident geocodes — the reference's
    coplanar problem, graph/_kernel.py:310-369): dist ties are simply ranked
    through deterministically, which matches the reference's 'clique'-style
    inclusion when k accommodates them.
    """
    pts = points.select(*POINT_COLS)
    n = pts.count()
    if cell_size is None:
        bounds = pts.agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
        ).first()
        area = max((bounds.x1 - bounds.x0) * (bounds.y1 - bounds.y0), 1e-12)
        density = n / area
        # aim: one ring-1 block (9 cells) holds ~ 4k points
        cell_size = max((4.0 * k / (9.0 * density)) ** 0.5, 1e-9)

    spark = points.sparkSession
    resolved_parts: list[DataFrame] = []
    unresolved = with_cells(pts, float(cell_size))
    r = initial_ring
    for _ in range(max_rounds):
        if unresolved.isEmpty():
            break
        right = with_cells(pts, float(cell_size)).select(
            F.col("id").alias("neighbor"),
            F.col("x").alias("x_n"),
            F.col("y").alias("y_n"),
            F.col("cell").alias("cell_r"),
        )
        probes = explode_to_ring(unresolved, r).select(
            F.col("id").alias("focal"),
            F.col("x").alias("x_f"),
            F.col("y").alias("y_f"),
            F.col("cell_probe"),
        )
        cand = (
            probes.join(right, probes.cell_probe == right.cell_r)
            .filter(F.col("focal") != F.col("neighbor"))
            .withColumn("dist", _dist())
        )
        wnd = Window.partitionBy("focal").orderBy("dist", "neighbor")
        topk = (
            cand.withColumn("__rk", F.row_number().over(wnd))
            .filter(F.col("__rk") <= k)
            .select("focal", "neighbor", "dist", "__rk")
        )
        guarantee = float(r) * float(cell_size)
        stats = topk.groupBy("focal").agg(
            F.count("*").alias("__cnt"), F.max("dist").alias("__kth")
        )
        ok = stats.filter((F.col("__cnt") >= k) & (F.col("__kth") <= guarantee)).select("focal")
        resolved_parts.append(topk.join(ok, "focal", "left_semi").select("focal", "neighbor"))
        unresolved = unresolved.join(
            ok.withColumnRenamed("focal", "id"), "id", "left_anti"
        )
        r *= 2

    if not unresolved.isEmpty():
        # residue: brute-force against all points; unresolved side is small →
        # broadcast it and let the full table stream past.
        left = F.broadcast(
            unresolved.select(
                F.col("id").alias("focal"),
                F.col("x").alias("x_f"),
                F.col("y").alias("y_f"),
            )
        )
        right = pts.select(
            F.col("id").alias("neighbor"),
            F.col("x").alias("x_n"),
            F.col("y").alias("y_n"),
        )
        cand = left.crossJoin(right).filter(F.col("focal") != F.col("neighbor")).withColumn(
            "dist", _dist()
        )
        wnd = Window.partitionBy("focal").orderBy("dist", "neighbor")
        resolved_parts.append(
            cand.withColumn("__rk", F.row_number().over(wnd))
            .filter(F.col("__rk") <= k)
            .select("focal", "neighbor")
        )

    if resolved_parts:
        edges = resolved_parts[0]
        for p in resolved_parts[1:]:
            edges = edges.unionByName(p)
    else:
        edges = spark.createDataFrame([], "focal long, neighbor long")
    edges = edges.withColumn("weight", F.lit(1.0))
    return Graph(resolve_isolates(edges, pts.select("id")))


def min_threshold_distance(points: DataFrame) -> float:
    """Max over nodes of 1st-NN distance (reference: weights/util.py:1106-1144)."""
    g = knn(points, 1)
    e = g.edges.filter(~((F.col("focal") == F.col("neighbor")) & (F.col("weight") == 0.0)))
    pf = points.select(F.col("id").alias("focal"), F.col("x").alias("x_f"), F.col("y").alias("y_f"))
    pn = points.select(F.col("id").alias("neighbor"), F.col("x").alias("x_n"), F.col("y").alias("y_n"))
    d = e.join(pf, "focal").join(pn, "neighbor").withColumn("dist", _dist())
    return d.agg(F.max("dist")).first()[0]
