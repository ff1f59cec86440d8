"""Property-based invariants over random small graphs (hypothesis).

The reference's test strategy (SURVEY §5) leans on algebraic identities;
these hold for ANY graph, so we fuzz them on random edge sets. Examples are
bounded (Spark job per example) — breadth comes from the identities, not
example count.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph


def _edge_sets(draw, n_nodes=6):
    pairs = st.lists(
        st.tuples(
            st.integers(0, n_nodes - 1), st.integers(0, n_nodes - 1)
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=12,
        unique=True,
    )
    return draw(pairs)


edge_lists = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=12,
    unique=True,
)


def _graph(spark, edges, nodes=6):
    d = {i: [] for i in range(nodes)}
    for a, b in edges:
        d[a].append(b)
    return Graph.from_dicts(spark, d)


def _links(g: Graph) -> frozenset:
    return frozenset(
        (r.focal, r.neighbor)
        for r in g.edges.collect()
        if not (r.focal == r.neighbor and r.weight == 0.0)
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(e1=edge_lists, e2=edge_lists)
def test_set_algebra_identities(spark, e1, e2):
    a, b = _graph(spark, e1), _graph(spark, e2)
    u, i = _links(a.union(b)), _links(a.intersection(b))
    d, sd = _links(a.difference(b)), _links(a.symmetric_difference(b))
    la, lb = _links(a), _links(b)
    assert u == la | lb
    assert i == la & lb
    assert d == la - lb
    assert sd == la ^ lb
    assert i <= u and d <= u and sd <= u


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(e1=edge_lists)
def test_transform_r_rows_sum_to_one(spark, e1):
    g = _graph(spark, e1)
    sums = (
        g.transform("R")
        .edges.filter(~((F.col("focal") == F.col("neighbor")) & (F.col("weight") == 0.0)))
        .groupBy("focal")
        .agg(F.sum("weight").alias("s"))
        .collect()
    )
    assert all(abs(r.s - 1.0) < 1e-12 for r in sums)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(e1=edge_lists)
def test_symmetrize_is_symmetric_and_contains_original(spark, e1):
    g = _graph(spark, e1)
    s = g.symmetrize("max")
    links = _links(s)
    assert all((b, a) in links for a, b in links)
    assert _links(g) <= links


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(e1=edge_lists)
def test_filter_adjlist_halves_symmetric_lists(spark, e1):
    g = _graph(spark, e1).symmetrize("max")
    full = _links(g)
    kept = {(r.focal, r.neighbor) for r in g.filter_adjlist().collect()}
    # one direction per undirected pair, and mirrors reconstruct the set
    assert len(kept) * 2 == len(full)
    assert {(b, a) for a, b in kept} | kept == full


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.integers(0, 40),  # coarse integer coords: collisions + cell-edge
            st.integers(0, 40),  # cases appear often
        ),
        min_size=2,
        max_size=25,
        unique=True,
    ),
    radius=st.sampled_from([3.0, 7.0, 12.5]),
    cell=st.sampled_from([None, 2.0, 5.0]),
)
def test_candidate_pairs_equals_brute_force(spark, pts, radius, cell):
    """The half-ring + mirror candidate join must emit EXACTLY the ordered
    pairs within the radius — for any point set, radius, and cell size
    (including cells bigger and smaller than the radius)."""
    from libpysal_spark.operators.distance import candidate_pairs

    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id long, x double, y double",
    )
    got = {
        (r.focal, r.neighbor)
        for r in candidate_pairs(df, radius, cell_size=cell).collect()
    }
    import math

    want = {
        (i, j)
        for i, (xi, yi) in enumerate(pts)
        for j, (xj, yj) in enumerate(pts)
        if i != j and math.hypot(xi - xj, yi - yj) <= radius
    }
    assert got == want
