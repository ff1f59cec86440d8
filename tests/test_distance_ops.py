"""Distance-family builders vs brute-force numpy oracles on synthetic points."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from libpysal_spark.operators.distance import candidate_pairs, distance_band, knn
from libpysal_spark.operators.triangulation import gabriel, relative_neighborhood
from libpysal_spark.pages import document_points

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pts(spark):
    df = document_points(spark, SF).cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def pts_np(pts):
    pdf = pts.toPandas().sort_values("id").reset_index(drop=True)
    return pdf["id"].to_numpy(), pdf[["x", "y"]].to_numpy()


def _distm(xy):
    d = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    return d


def test_distance_band_matches_bruteforce(pts, pts_np):
    ids, xy = pts_np
    d = _distm(xy)
    t = 40.0
    got = {
        (r.focal, r.neighbor)
        for r in distance_band(pts, t).edges.collect()
        if not (r.focal == r.neighbor and r.weight == 0.0)
    }
    ii, jj = np.where(d <= t)
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(ii, jj)}
    assert got == want


def test_distance_band_cell_size_invariance(pts):
    """Same result whatever the tiling cell size — the index is not semantic."""
    a = distance_band(pts, 30.0, cell_size=30.0).sorted().toPandas()
    b = distance_band(pts, 30.0, cell_size=7.0).sorted().toPandas()
    assert a.equals(b)


@pytest.mark.parametrize("k", [1, 5, 12])
def test_knn_matches_bruteforce(pts, pts_np, k):
    ids, xy = pts_np
    d = _distm(xy)
    g = knn(pts, k)
    got = {}
    for r in g.edges.collect():
        if r.focal == r.neighbor and r.weight == 0.0:
            continue
        got.setdefault(r.focal, set()).add(r.neighbor)
    for i, rid in enumerate(ids):
        order = np.lexsort((ids, d[i]))
        want = set(int(v) for v in ids[order[:k]])
        assert got[int(rid)] == want, f"focal {rid}"


def test_knn_tiny_cells_force_ring_expansion(spark):
    """Cell size far too small: ring expansion + fallback must still be exact."""
    rows = [(i, float(i * 7 % 50), float(i * 13 % 50)) for i in range(40)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    pdf = pts.toPandas().sort_values("id").reset_index(drop=True)
    xy = pdf[["x", "y"]].to_numpy()
    d = _distm(xy)
    g = knn(pts, 3, cell_size=0.5, max_rounds=2)
    got = {}
    for r in g.edges.collect():
        got.setdefault(r.focal, set()).add(r.neighbor)
    ids = pdf["id"].to_numpy()
    for i, rid in enumerate(ids):
        order = np.lexsort((ids, d[i]))
        assert got[int(rid)] == set(int(v) for v in ids[order[:3]])


def test_candidate_pairs_no_duplicates(pts):
    pairs = candidate_pairs(pts, 25.0)
    n = pairs.count()
    nd = pairs.select("focal", "neighbor").distinct().count()
    assert n == nd


def _brute_gabriel(ids, xy):
    n = len(ids)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    out = set()
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            blocked = any(
                k not in (i, j) and d2[i, j] > d2[i, k] + d2[j, k] for k in range(n)
            )
            if not blocked:
                out.add((int(ids[i]), int(ids[j])))
    return out


def test_gabriel_bruteforce(spark):
    rows = [(i, float((i * 37) % 97), float((i * 61) % 89)) for i in range(30)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    ids = np.array([r[0] for r in rows])
    xy = np.array([[r[1], r[2]] for r in rows])
    got = {
        (r.focal, r.neighbor)
        for r in gabriel(pts).edges.collect()
        if not (r.focal == r.neighbor and r.weight == 0.0)
    }
    assert got == _brute_gabriel(ids, xy)


def test_triangulation_modes_agree(spark):
    """Default (Delaunay-candidate) mode == exact brute mode, both graphs."""
    rows = [(i, float((i * 37) % 97), float((i * 61) % 89)) for i in range(40)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    for op in (gabriel, relative_neighborhood):
        fast = {(r.focal, r.neighbor, r.weight) for r in op(pts).edges.collect()}
        brute = {
            (r.focal, r.neighbor, r.weight)
            for r in op(pts, method="brute").edges.collect()
        }
        assert fast == brute


def test_rng_subset_of_gabriel(spark):
    rows = [(i, float((i * 37) % 97), float((i * 61) % 89)) for i in range(30)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    gab = {
        (r.focal, r.neighbor)
        for r in gabriel(pts).edges.collect()
        if not (r.focal == r.neighbor and r.weight == 0.0)
    }
    rng = {
        (r.focal, r.neighbor)
        for r in relative_neighborhood(pts).edges.collect()
        if not (r.focal == r.neighbor and r.weight == 0.0)
    }
    assert rng <= gab  # RNG ⊆ Gabriel (Toussaint 1980)
    assert len(rng) > 0
