"""Spatial matching — driver-side exact small-n solver.

Reference: graph/_matching.py:11-175 ``_spatial_matching`` / graph/base.py:
1364-1425 ``build_matching``: minimize Σ d_ij·m_ij subject to every node
having at least ``n_matches`` matched partners, m symmetric binary — a MIP
the reference hands to pulp.

A global LP/MIP is out of distributed scope (SURVEY §2.2): the constraint
matrix couples every pair, so there is no shuffle-local decomposition. What
ships instead is the promised DRIVER-SIDE fallback for the n_matches=1 case,
which is the minimum-weight EDGE COVER problem and admits an exact
polynomial/DP solution without an LP solver:

    cover* = argmin Σ d(e)  s.t. every node incident to >= 1 chosen edge

Classic reduction (public, e.g. Schrijver, Combinatorial Optimization §19):
let c(i) = min_j d(i, j). Choosing matching M on reduced weights
w'(i,j) = d(i,j) - c(i) - c(j) (only profitable when w' < 0) and giving every
unmatched node its cheapest edge yields an optimal edge cover. The matching
itself is found exactly by bitmask DP (O(2^n·n)), so the solver is capped at
n <= 22 — the honest "small-n" scope.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libpysal_spark.graph import Graph, resolve_isolates

MAX_N = 22


def _min_weight_matching(w: np.ndarray) -> list[tuple[int, int]]:
    """Exact min-weight (not necessarily perfect) matching, bitmask DP.

    Only negative-weight pairings can improve the empty matching, so the DP
    considers 'skip node' at cost 0.
    """
    n = w.shape[0]
    NONE = -1
    # iterate subsets in increasing order; f(S) = min cost on nodes in S
    f = np.full(1 << n, np.inf)
    back = np.full((1 << n, 2), NONE, dtype=np.int64)
    f[0] = 0.0
    for S in range(1, 1 << n):
        i = (S & -S).bit_length() - 1  # lowest set bit
        # skip i
        rest = S & ~(1 << i)
        if f[rest] < f[S]:
            f[S] = f[rest]
            back[S] = (i, NONE)
        # pair i with j
        for j in range(i + 1, n):
            if not (S >> j) & 1:
                continue
            r2 = rest & ~(1 << j)
            cand = f[r2] + w[i, j]
            if cand < f[S]:
                f[S] = cand
                back[S] = (i, j)
    # reconstruct
    pairs = []
    S = (1 << n) - 1
    while S:
        i, j = int(back[S][0]), int(back[S][1])
        if j != NONE:
            pairs.append((i, j))
            S &= ~((1 << i) | (1 << j))
        else:
            S &= ~(1 << i)
    return pairs


MAX_N_K = 16  # branch-and-bound cap for the k>1 b-edge-cover solver


def _min_cost_b_cover(d: np.ndarray, k: int) -> set[tuple[int, int]]:
    """Exact minimum-weight b-edge cover (every node degree >= k), exhaustive
    branch-and-bound over weight-sorted edges.

    The reference hands this ILP to pulp/CBC (graph/_matching.py:106-147);
    bipartite min-cost-flow relaxations are only half-integral on odd
    structures, so exactness here comes from B&B with an admissible bound:
    LB(state) = cost so far + 1/2 · Σ_v (sum of the r(v) cheapest REMAINING
    incident edges) — each un-met degree slot needs an edge and an edge
    serves at most two slots. Deterministic (ties by edge index).
    """
    n = d.shape[0]
    es = sorted(
        (float(d[i, j]), i, j) for i in range(n) for j in range(i + 1, n)
    )
    m = len(es)
    # per-node incident edge indices in global (ascending-weight) order
    inc = [[] for _ in range(n)]
    for idx, (w, i, j) in enumerate(es):
        inc[i].append(idx)
        inc[j].append(idx)

    # greedy upper bound: every node grabs its k cheapest incident edges
    chosen0: set[int] = set()
    for v in range(n):
        for idx in inc[v][:k]:
            chosen0.add(idx)
    best_cost = sum(es[idx][0] for idx in chosen0)
    best_set = set(chosen0)

    r0 = [k] * n

    def lb(pos: int, r: list[int]) -> float:
        s = 0.0
        for v in range(n):
            if r[v] <= 0:
                continue
            need = r[v]
            for idx in inc[v]:
                if idx >= pos:
                    s += es[idx][0]
                    need -= 1
                    if need == 0:
                        break
            if need > 0:
                return float("inf")  # infeasible from here
        return s / 2.0

    def dfs(pos: int, cost: float, r: list[int]):
        nonlocal best_cost, best_set
        if all(x <= 0 for x in r):
            if cost < best_cost:
                best_cost = cost
                best_set = set(cur)
            return
        if pos >= m or cost + lb(pos, r) >= best_cost:
            return
        w, i, j = es[pos]
        # taking a dead edge (neither endpoint needs it) never helps
        if r[i] > 0 or r[j] > 0:
            cur.add(pos)
            r[i] -= 1
            r[j] -= 1
            dfs(pos + 1, cost + w, r)
            r[i] += 1
            r[j] += 1
            cur.discard(pos)
        dfs(pos + 1, cost, r)

    cur: set[int] = set()
    dfs(0, 0.0, r0)
    return {(es[idx][1], es[idx][2]) for idx in best_set}


def spatial_matching(points: DataFrame, n_matches: int = 1) -> Graph:
    """Exact minimum-total-distance matching graph (driver-side, small n).

    ``n_matches=1`` (min-weight edge cover) via the reduced-weight matching
    DP (n <= 22); ``n_matches=k > 1`` (min-weight b-edge cover — the
    reference's pulp MIP, graph/_matching.py:11-175) via exact
    branch-and-bound (n <= 16, VERDICT r3 #10). Both driver-side by contract:
    the constraint matrix couples every pair, so there is no shuffle-local
    decomposition (SURVEY §2.2).

    Returns a Graph with the symmetric matched edges (weight 1.0).
    """
    rows = points.select("id", "x", "y").orderBy("id").collect()
    n = len(rows)
    cap = MAX_N if n_matches == 1 else MAX_N_K
    if n > cap:
        raise ValueError(
            f"driver-side matching capped at n <= {cap} for n_matches={n_matches}, got {n}"
        )
    if n < 2:
        raise ValueError("matching needs at least two points")
    if n_matches > 1 and n_matches >= n:
        raise ValueError("n_matches must be < n")
    ids = [r.id for r in rows]
    xy = np.array([[r.x, r.y] for r in rows], dtype=float)
    d = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)

    edges: set[tuple[int, int]] = set()
    if n_matches == 1:
        cheapest = d.min(axis=1)
        nearest = d.argmin(axis=1)
        wred = d - cheapest[:, None] - cheapest[None, :]
        matched = _min_weight_matching(wred)
        covered = set()
        for i, j in matched:
            edges.add((min(i, j), max(i, j)))
            covered.add(i)
            covered.add(j)
        for i in range(n):
            if i not in covered:
                j = int(nearest[i])
                edges.add((min(i, j), max(i, j)))
    else:
        edges = _min_cost_b_cover(d, n_matches)

    spark = points.sparkSession
    rows_out = []
    for i, j in sorted(edges):
        rows_out.append((ids[i], ids[j], 1.0))
        rows_out.append((ids[j], ids[i], 1.0))
    e = spark.createDataFrame(rows_out, "focal long, neighbor long, weight double")
    return Graph(resolve_isolates(e, points.select("id")))
