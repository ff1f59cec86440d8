"""Round-2 operators: nonplanar repair, jitter policy, alpha shapes,
clipped Voronoi, driver-side spatial matching."""

import pytest
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph


def _real(g: Graph) -> set:
    return {
        (r.focal, r.neighbor)
        for r in g.edges.collect()
        if not (r.focal == r.neighbor and r.weight == 0.0)
    }


@pytest.fixture(scope="module")
def diamonds(spark):
    # 3x3 lattice of disjoint diamonds (half-diagonal 0.4 at unit spacing)
    pos = spark.range(9).select(
        F.col("id"), (F.col("id") % 3).alias("gx"), (F.col("id") / 3).cast("long").alias("gy")
    )
    r = 0.4
    ring = F.array(
        F.struct(F.col("gx").cast("double").alias("x"), (F.col("gy") - r).cast("double").alias("y")),
        F.struct((F.col("gx") + r).cast("double").alias("x"), F.col("gy").cast("double").alias("y")),
        F.struct(F.col("gx").cast("double").alias("x"), (F.col("gy") + r).cast("double").alias("y")),
        F.struct((F.col("gx") - r).cast("double").alias("x"), F.col("gy").cast("double").alias("y")),
        F.struct(F.col("gx").cast("double").alias("x"), (F.col("gy") - r).cast("double").alias("y")),
    )
    return pos.select("id", ring.alias("vertices"))


def test_nonplanar_neighbors_repairs_islands(spark, diamonds):
    from libpysal_spark.operators.contiguity import fuzzy_contiguity, nonplanar_neighbors

    g = fuzzy_contiguity(diamonds, 1.0)
    assert g.islands().count() == 9  # all disjoint -> all islands
    # extent = 2.8; distance 0.25 -> rook overlap only
    repaired = nonplanar_neighbors(g, diamonds, tolerance=0.25 / 2.8)
    got = _real(repaired)
    want = set()
    for i in range(9):
        gx, gy = i % 3, i // 3
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nx, ny = gx + dx, gy + dy
            if 0 <= nx < 3 and 0 <= ny < 3:
                want.add((i, ny * 3 + nx))
    assert got == want
    assert repaired.islands().count() == 0


def test_jitter_is_deterministic_and_separates_sites(spark):
    from libpysal_spark.operators.distance import jitter_points, knn_jitter, knn

    # 20 points on only 4 distinct sites
    pts = spark.range(20).select(
        "id",
        (F.col("id") % 4).cast("double").alias("x"),
        (F.col("id") % 4).cast("double").alias("y"),
    )
    j1 = {(r.id, r.x, r.y) for r in jitter_points(pts, 0.25, seed=7).collect()}
    j2 = {(r.id, r.x, r.y) for r in jitter_points(pts, 0.25, seed=7).collect()}
    assert j1 == j2  # pure function of (seed, id)
    assert len({(x, y) for _, x, y in j1}) == 20  # coincidences resolved
    g = knn_jitter(pts, 2, magnitude=0.25, seed=7)
    card = {r.id: r.cardinality for r in g.cardinalities().collect()}
    assert all(v == 2 for v in card.values())


def test_alpha_shape_triangle_filtration(spark):
    from libpysal_spark.operators.delaunay import (
        alpha_shape_edges, alpha_shape_triangles, delaunay_triangles,
    )

    # unit square + far outlier: the square's triangles have circumradius
    # ~0.707; triangles touching the outlier are much bigger
    rows = [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 1.0), (4, 10.0, 0.5)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    all_tris = delaunay_triangles(pts)
    assert all_tris.count() >= 3
    kept = alpha_shape_triangles(pts, alpha=1.0).collect()  # circumradius < 1
    # only the square's two triangles survive (either cocircular diagonal)
    assert len(kept) == 2 and all(abs(r.r2 - 0.5) < 1e-12 for r in kept)
    assert all(4 not in (r.a, r.b, r.c) for r in kept)
    boundary = {(r.focal, r.neighbor) for r in alpha_shape_edges(pts, alpha=1.0).collect()}
    # boundary of the square = its 4 sides; the shared diagonal is interior
    assert boundary == {(0, 1), (0, 2), (1, 3), (2, 3)}


def test_voronoi_polygons_interior_cell(spark):
    from libpysal_spark.operators.delaunay import voronoi_polygons

    # unit square corners + center: the center's Voronoi cell is the diamond
    # of the four edge midpoints; the corner cells are unbounded (omitted)
    rows = [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 1.0), (4, 0.5, 0.5)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    cells = {r.id: [(v.x, v.y) for v in r.vertices] for r in voronoi_polygons(pts).collect()}
    assert set(cells) == {4}
    ring = cells[4]
    assert len(ring) == 5 and ring[0] == ring[-1]
    assert set(ring[:-1]) == {(0.5, 0.0), (1.0, 0.5), (0.5, 1.0), (0.0, 0.5)}

    def shoelace(r):
        return abs(sum(r[i][0] * r[i + 1][1] - r[i + 1][0] * r[i][1]
                       for i in range(len(r) - 1))) / 2

    assert abs(shoelace(ring) - 0.5) < 1e-12

    # clip='extent': ALL five cells, partitioning the unit bbox exactly —
    # corner cells are the right triangles {x+y<=0.5}-style, area 0.125 each
    clipped = {
        r.id: [(v.x, v.y) for v in r.vertices]
        for r in voronoi_polygons(pts, clip="extent").collect()
    }
    assert set(clipped) == {0, 1, 2, 3, 4}
    areas = {i: shoelace(ring) for i, ring in clipped.items()}
    assert abs(areas[4] - 0.5) < 1e-9
    for c in (0, 1, 2, 3):
        assert abs(areas[c] - 0.125) < 1e-9
    assert abs(sum(areas.values()) - 1.0) < 1e-9


def test_voronoi_clipped_subset_and_interior_preserved(spark):
    from libpysal_spark.operators.delaunay import voronoi_weights

    rows = [(i, float((i * 37) % 97), float((i * 61) % 89)) for i in range(40)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    unclipped = _real(voronoi_weights(pts))
    clipped = _real(voronoi_weights(pts, clip="extent"))
    assert clipped <= unclipped
    assert len(clipped) > 0.5 * len(unclipped)  # interior adjacency survives


def _shoelace(r):
    return abs(sum(r[i][0] * r[i + 1][1] - r[i + 1][0] * r[i][1]
                   for i in range(len(r) - 1))) / 2


def test_voronoi_hull_clip_partitions_hull(spark):
    """VERDICT r3 #3: clip='convex_hull' — all n cells present, Σareas ==
    hull area (the cells partition the hull exactly)."""
    from libpysal_spark.operators.delaunay import (
        global_hull_ring,
        voronoi_polygons,
    )

    rows = [(i, float((i * 37) % 97), float((i * 61) % 89)) for i in range(40)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    cells = {
        r.id: [(v.x, v.y) for v in r.vertices]
        for r in voronoi_polygons(pts, clip="convex_hull").collect()
    }
    assert set(cells) == set(range(40))
    hull_area = _shoelace(global_hull_ring(pts))
    total = sum(_shoelace(ring) for ring in cells.values())
    assert abs(total - hull_area) < 1e-6 * hull_area


def test_voronoi_polygon_clip_convex_region(spark):
    """Arbitrary convex clip polygon: cells partition the region; non-convex
    clip raises (documented Sutherland–Hodgman scope)."""
    import pytest as _pytest

    from libpysal_spark.operators.delaunay import voronoi_polygons

    rows = [(i, float((i * 37) % 97), float((i * 61) % 89)) for i in range(40)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    quad = [(20.0, 20.0), (70.0, 25.0), (65.0, 70.0), (25.0, 65.0)]
    cells = [
        [(v.x, v.y) for v in r.vertices]
        for r in voronoi_polygons(pts, clip=quad).collect()
    ]
    total = sum(_shoelace(ring) for ring in cells)
    assert abs(total - _shoelace(quad + quad[:1])) < 1e-6 * total
    with _pytest.raises(NotImplementedError, match="convex"):
        voronoi_polygons(
            pts, clip=[(0.0, 0.0), (10.0, 0.0), (5.0, 2.0), (10.0, 10.0), (0.0, 10.0)]
        ).collect()


def test_voronoi_weights_hull_clip(spark):
    """Hull-clipped Voronoi weights: kept edges ⊆ extent-clipped (hull ⊆
    bbox), and most interior adjacency survives."""
    from libpysal_spark.operators.delaunay import voronoi_weights

    rows = [(i, float((i * 37) % 97), float((i * 61) % 89)) for i in range(40)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    extent = _real(voronoi_weights(pts, clip="extent"))
    hull = _real(voronoi_weights(pts, clip="convex_hull"))
    assert hull <= extent
    assert len(hull) > 0.5 * len(extent)


def test_spatial_matching_small_n(spark):
    from libpysal_spark.operators.matching import spatial_matching

    # two tight pairs far apart -> optimal cover pairs them up
    rows = [(0, 0.0, 0.0), (1, 0.1, 0.0), (2, 50.0, 0.0), (3, 50.1, 0.0)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    got = _real(spatial_matching(pts))
    assert got == {(0, 1), (1, 0), (2, 3), (3, 2)}
    # odd cluster: 3 points in a line -> edge cover shares the middle point
    rows = [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 2.1, 0.0), (3, 80.0, 0.0), (4, 80.5, 0.0)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    got = _real(spatial_matching(pts))
    assert (3, 4) in got and (0, 1) in got
    assert (2, 1) in got  # 2 covered via its cheapest edge
    # n_matches=2 is implemented since r4 (exact B&B) — degree invariant
    g2 = _real(spatial_matching(pts, n_matches=2))
    deg = {}
    for a, b in g2:
        deg[a] = deg.get(a, 0) + 1
    assert all(deg[i] >= 2 for i in range(5))


def test_arc_distance_band_matches_brute(spark):
    import math

    from libpysal_spark.functions.sphere import arc_distance_band, to_xyz, arcdist_to_chord

    rows = [
        (i, float((i * 37) % 360) - 180.0, float((i * 61) % 170) - 85.0)
        for i in range(120)
    ] + [(900, 10.0, 88.5), (901, -170.0, 88.7)]  # near-pole pair (lon far, arc close)
    pts = spark.createDataFrame(rows, "id long, lon double, lat double")
    threshold = 1500.0  # km
    got = {
        (r.focal, r.neighbor)
        for r in arc_distance_band(pts, threshold).edges.collect()
        if not (r.focal == r.neighbor and r.weight == 0.0)
    }
    # brute oracle on the driver
    import numpy as np

    ids = np.array([r[0] for r in rows])
    lam = np.radians([r[1] for r in rows])
    phi = np.radians([r[2] for r in rows])
    xyz = np.stack([np.cos(phi) * np.cos(lam), np.cos(phi) * np.sin(lam), np.sin(phi)], 1)
    chord_t = arcdist_to_chord(threshold)
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if i != j and np.linalg.norm(xyz[i] - xyz[j]) <= chord_t:
                want.add((int(ids[i]), int(ids[j])))
    assert got == want
    assert (900, 901) in got  # polar pair found despite huge lon delta


def test_delaunay_triangles_partitioned_matches_exact(spark):
    from libpysal_spark.operators.delaunay import delaunay_triangles

    rows = [(i, float((i * 37) % 97), float((i * 61) % 89)) for i in range(60)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    exact = {(r.a, r.b, r.c) for r in delaunay_triangles(pts, cells_per_side=1).collect()}
    parts = {(r.a, r.b, r.c) for r in delaunay_triangles(pts, cells_per_side=2).collect()}
    assert parts == exact


def test_geointerpolate_and_geogrid_goldens(spark):
    """Reference doctest values (cg/sphere.py:502-640, public doctests)."""
    from libpysal_spark.functions.sphere import geogrid, geointerpolate_cols

    df = spark.createDataFrame(
        [(-87.893517, 41.981417, -87.519295, 41.657498, 0.1)],
        "lon0 double, lat0 double, lon1 double, lat1 double, t double",
    )
    lon, lat = geointerpolate_cols(
        F.col("lon0"), F.col("lat0"), F.col("lon1"), F.col("lat1"), F.col("t")
    )
    r = df.select(lon.alias("lon"), lat.alias("lat")).first()
    assert abs(r.lon - -87.85592403438788) < 1e-9
    assert abs(r.lat - 41.949079912574796) < 1e-9

    # geogrid doctest: pup/pdown given lat-lon with lonx=False
    g = geogrid(spark, (42.023768, -87.946389), (41.644415, -87.524102), 3, lonx=False)
    got = {(r.row, r.col): (r.lat, r.lon) for r in g.collect()}
    assert len(got) == 16
    assert abs(got[(0, 0)][0] - 42.023768) < 1e-9
    assert abs(got[(0, 1)][0] - 42.02393997819538) < 1e-9
    assert abs(got[(0, 1)][1] - -87.80562679358316) < 1e-9
    assert abs(got[(2, 2)][0] - 41.77103781320412) < 1e-9
    assert abs(got[(2, 2)][1] - -87.66486420765956) < 1e-9
    assert abs(got[(3, 3)][0] - 41.644415) < 1e-9


def test_dissolve_boundary_cancels_interior_walls(spark):
    from libpysal_spark.operators.lattice import lattice_polygons
    from libpysal_spark.operators.overlay import dissolve_stats

    pos = spark.range(4).select(
        F.col("id"), (F.col("id") % 2).alias("gx"), (F.col("id") / 2).cast("long").alias("gy")
    )
    polys = lattice_polygons(spark, pos)
    labels = pos.select("id", F.lit(0).alias("label"))
    out = dissolve_stats(polys, labels).first()
    # 2x2 block of unit squares -> one 2x2 square, perimeter 8
    assert out.n_parts == 4 and abs(out.perimeter - 8.0) < 1e-12


def test_overlay_rectangle_areas(spark):
    from libpysal_spark.operators.overlay import overlay

    def rect(id_, x0, y0, w, h):
        return (id_, [
            {"x": x0, "y": y0}, {"x": x0 + w, "y": y0},
            {"x": x0 + w, "y": y0 + h}, {"x": x0, "y": y0 + h},
            {"x": x0, "y": y0},
        ])

    schema = "id long, vertices array<struct<x double, y double>>"
    a = spark.createDataFrame([rect(0, 0.0, 0.0, 2.0, 2.0)], schema)
    b = spark.createDataFrame(
        [rect(10, 1.0, 1.0, 2.0, 2.0), rect(11, 5.0, 5.0, 1.0, 1.0)], schema
    )
    got = {(r.a_id, r.b_id): r.area for r in overlay(a, b, cell_size=2.0).collect()}
    assert got == {(0, 10): 1.0}  # unit overlap square; disjoint rect absent


def test_lag_multicolumn(spark):
    g = Graph.from_dicts(spark, {0: [1, 2], 1: [0], 2: [0]})
    y = spark.createDataFrame(
        [(0, 1.0, 10.0), (1, 2.0, 20.0), (2, 3.0, 30.0)], "id long, a double, b double"
    )
    out = {r.id: (r.lag_a, r.lag_b) for r in g.lag(y, ["a", "b"]).collect()}
    assert out[0] == (5.0, 50.0) and out[1] == (1.0, 10.0)


def test_generate_array_roundtrip(spark):
    from libpysal_spark.operators.raster import generate_array

    vals = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (3, 4.0)], "id long, value double"
    )
    arr = generate_array(vals, 2, 2)
    assert arr.shape == (2, 2)
    assert arr[0][0] == 1.0 and arr[0][1] == 2.0 and arr[1][1] == 4.0
    import numpy as np

    assert np.isnan(arr[1][0])


def test_delaunay_triangles_match_edges(spark):
    from libpysal_spark.operators.delaunay import delaunay, delaunay_triangles

    rows = [(i, float((i * 37) % 97), float((i * 61) % 89)) for i in range(30)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    tri_edges = set()
    for r in delaunay_triangles(pts).collect():
        for u, v in ((r.a, r.b), (r.b, r.c), (r.a, r.c)):
            tri_edges.add((min(u, v), max(u, v)))
    graph_edges = {(f, n) for f, n in _real(delaunay(pts)) if f < n}
    assert tri_edges == graph_edges


def test_spatial_matching_k2_exact_vs_enumeration(spark):
    """VERDICT r3 #10: n_matches=2 b-edge cover is EXACT — brute-force
    enumeration over all edge subsets of feasible sizes on a 6-point fixture
    confirms both the degree invariant and cost minimality."""
    from itertools import combinations

    import numpy as np

    from libpysal_spark.operators.matching import spatial_matching

    rows = [(i, float((i * 37) % 11), float((i * 61) % 13)) for i in range(6)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    g = spatial_matching(pts, n_matches=2)
    und = {
        (r.focal, r.neighbor)
        for r in g.edges.collect()
        if r.focal < r.neighbor
    }
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert all(deg.get(i, 0) >= 2 for i in range(6))

    xy = np.array([[r[1], r[2]] for r in rows])
    dm = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    cost = sum(dm[a, b] for a, b in und)

    all_edges = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    best = float("inf")
    for sz in range(6, 13):  # k*n/2=6 .. n*k=12 edges
        for sub in combinations(all_edges, sz):
            dd = [0] * 6
            for a, b in sub:
                dd[a] += 1
                dd[b] += 1
            if all(v >= 2 for v in dd):
                c = sum(dm[a, b] for a, b in sub)
                if c < best:
                    best = c
    assert abs(cost - best) < 1e-9


def test_spatial_matching_k2_caps_and_validation(spark):
    from libpysal_spark.operators.matching import spatial_matching

    pts = spark.createDataFrame(
        [(i, float(i), 0.0) for i in range(20)], "id long, x double, y double"
    )
    with pytest.raises(ValueError, match="capped"):
        spatial_matching(pts, n_matches=2)
    small = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 1.0, 0.0)], "id long, x double, y double"
    )
    with pytest.raises(ValueError, match="n_matches"):
        spatial_matching(small, n_matches=2)


def test_voronoi_alpha_clip_decomposition(spark):
    """clip='alpha_shape' analog: the alpha complex's triangles partition
    the shape, so Σ per-cell clipped areas == Σ triangle areas exactly."""
    from libpysal_spark.operators.delaunay import (
        alpha_shape_triangles,
        voronoi_alpha_clip_areas,
    )

    rows = [(i, float((i * 37) % 97), float((i * 61) % 89)) for i in range(60)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    alpha = 0.05  # keeps triangles with circumradius < 20
    tris = alpha_shape_triangles(pts, alpha).collect()
    assert len(tris) > 10
    tri_area = sum(
        abs(
            (r.bx - r.ax) * (r.cy - r.ay) - (r.cx - r.ax) * (r.by - r.ay)
        ) / 2.0
        for r in tris
    )
    out = voronoi_alpha_clip_areas(pts, alpha).collect()
    total = sum(r.area for r in out)
    assert abs(total - tri_area) < 1e-6 * tri_area
    # cells exist for most sites; none exceed their unclipped voronoi area
    from libpysal_spark.operators.delaunay import voronoi_polygons

    full = {
        r.id: [(v.x, v.y) for v in r.vertices]
        for r in voronoi_polygons(pts, clip="extent").collect()
    }
    for r in out:
        assert r.area <= _shoelace(full[r.id]) + 1e-9


def test_nodes_in_range_matches_dijkstra(spark):
    """Distributed threshold-bounded shortest paths == driver Dijkstra on a
    directed weighted fixture (pandana nodes_in_range semantics: origin at
    cost 0, threshold inclusive, directed edges)."""
    import heapq

    import numpy as np

    from libpysal_spark.operators import network as N

    rng = np.random.RandomState(5)
    n = 40
    edges = []
    for i in range(n):
        edges.append((i, (i + 1) % n, 1.0 + (i % 4) * 0.25))
        edges.append((i, (i * 3 + 1) % n, 2.0 + (i % 3) * 0.5))
    e_df = spark.createDataFrame(edges, "src long, dst long, cost double")
    origins = [0, 7, 13]
    o_df = spark.createDataFrame([(i,) for i in origins], "id long")
    T = 5.0
    got = {
        (r.origin, r.destination): r.cost
        for r in N.nodes_in_range(e_df, o_df, T).collect()
    }
    assert N.last_route_info["converged"]

    adj = {}
    for s, d, c in edges:
        adj.setdefault(s, []).append((d, c))
    want = {}
    for o in origins:
        dist = {o: 0.0}
        pq = [(0.0, o)]
        while pq:
            d0, u = heapq.heappop(pq)
            if d0 > dist.get(u, float("inf")):
                continue
            for v, c in adj.get(u, []):
                nd = d0 + c
                if nd <= T and nd < dist.get(v, float("inf")):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        for k, v in dist.items():
            want[(o, k)] = v
    assert got == want
