"""Batched 2-D polygon clipping — numpy Sutherland–Hodgman over Arrow batches.

VERDICT r4 #3: the overlay / Voronoi clip kernels ran pure-python
Sutherland–Hodgman per candidate PAIR inside mapInPandas batches — correct
shape (no shuffle, Arrow-batched) but the inner loop dominated the three
slowest queries. This module clips the WHOLE batch at once: one numpy pass
per clip edge over a (batch, max_width, 2) array, compacting emitted
vertices with a stable argsort. Semantics are identical to the scalar
``overlay._clip_ring`` (clip ring must be convex; subject arbitrary),
pinned by tests/test_more_ops.py::test_batch_clip_matches_scalar.

Reference context: cg/standalone.py polygon clipping duties (SURVEY §2.6);
the algorithm is the public Sutherland–Hodgman (1974).
"""

from __future__ import annotations

import numpy as np


def rings_from_arrow(col) -> list[np.ndarray]:
    """pandas Series of list<struct<x,y>> cells → list of (n_i, 2) arrays."""
    return [
        np.array([(v["x"], v["y"]) for v in ring], dtype=float).reshape(-1, 2)
        for ring in col
    ]


def _open_rings(rings) -> list[np.ndarray]:
    out = []
    for r in rings:
        a = np.asarray(r, dtype=float).reshape(-1, 2)
        if len(a) > 1 and a[0, 0] == a[-1, 0] and a[0, 1] == a[-1, 1]:
            a = a[:-1]
        out.append(a)
    return out


def _pack(rings: list[np.ndarray]):
    """List of (n_i, 2) arrays → padded (B, W, 2) array + (B,) lengths."""
    B = len(rings)
    lens = np.fromiter((len(r) for r in rings), dtype=np.int64, count=B)
    W = int(lens.max()) if B and lens.max() > 0 else 1
    P = np.zeros((B, W, 2), dtype=float)
    M = np.arange(W)[None, :] < lens[:, None]
    if B and lens.sum():
        P[M] = np.concatenate([r for r in rings if len(r)])
    return P, lens


def _orient_ccw(P: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Reverse the valid prefix of rows whose signed area is negative."""
    B, W, _ = P.shape
    idx = np.arange(W)[None, :]
    M = idx < lens[:, None]
    nxt = (idx + 1) % np.maximum(lens[:, None], 1)
    Q = np.take_along_axis(P, np.broadcast_to(nxt[:, :, None], P.shape), axis=1)
    a2 = ((P[:, :, 0] * Q[:, :, 1] - Q[:, :, 0] * P[:, :, 1]) * M).sum(1)
    rev = a2 < 0
    if rev.any():
        rev_idx = np.where(M, np.maximum(lens[:, None] - 1, 0) - idx, idx)
        Prev = np.take_along_axis(
            P, np.broadcast_to(rev_idx[:, :, None], P.shape), axis=1
        )
        P = np.where(rev[:, None, None], Prev, P)
    return P


def _shoelace(P: np.ndarray, lens: np.ndarray) -> np.ndarray:
    B, W, _ = P.shape
    idx = np.arange(W)[None, :]
    M = idx < lens[:, None]
    nxt = (idx + 1) % np.maximum(lens[:, None], 1)
    Q = np.take_along_axis(P, np.broadcast_to(nxt[:, :, None], P.shape), axis=1)
    return np.abs(((P[:, :, 0] * Q[:, :, 1] - Q[:, :, 0] * P[:, :, 1]) * M).sum(1)) / 2.0


def batch_clip(subjects, clips):
    """Clip each subject ring by its (convex) clip ring, whole-batch numpy.

    ``subjects``: list of (n_i, 2) arrays (open or closed rings).
    ``clips``: list of (m_i, 2) arrays, or ONE (m, 2) array applied to every
    subject (broadcast without replication).
    Returns ``(P, lens)``: padded (B, W, 2) vertex array and per-row result
    lengths (0 = empty intersection); rows are open CCW-or-input-order rings.
    """
    subjects = _open_rings(subjects)
    P, lens = _pack(subjects)
    B = len(subjects)
    uniform = isinstance(clips, np.ndarray) and clips.ndim == 2
    if uniform:
        cl = _open_rings([clips])
        C1, clens1 = _pack(cl)
        C1 = _orient_ccw(C1, clens1)
        C = np.broadcast_to(C1, (B, C1.shape[1], 2))
        clens = np.full(B, clens1[0], dtype=np.int64)
    else:
        C, clens = _pack(_open_rings(clips))
        C = _orient_ccw(C, clens)
    lens = lens.copy()
    max_m = int(clens.max()) if B else 0
    rowsI = np.arange(B)
    for e in range(max_m):
        W = P.shape[1]
        # per-row clip edge; rows whose clip is shorter get a degenerate
        # a == b edge, for which every side test is 0 ("inside") — identity
        ae = np.where(e < clens, e, 0)
        be = np.where(e < clens, (ae + 1) % np.maximum(clens, 1), 0)
        a = C[rowsI, ae]
        b = C[rowsI, be]
        b = np.where((e < clens)[:, None], b, a)
        idx = np.arange(W)[None, :]
        Mv = idx < lens[:, None]
        nxt = (idx + 1) % np.maximum(lens[:, None], 1)
        Q = np.take_along_axis(P, np.broadcast_to(nxt[:, :, None], P.shape), axis=1)
        ab = b - a
        sp = ab[:, 0:1] * (P[:, :, 1] - a[:, 1:2]) - ab[:, 1:2] * (P[:, :, 0] - a[:, 0:1])
        sq = ab[:, 0:1] * (Q[:, :, 1] - a[:, 1:2]) - ab[:, 1:2] * (Q[:, :, 0] - a[:, 0:1])
        pin = sp >= 0
        qin = sq >= 0
        emit_p = pin & Mv
        emit_x = (pin != qin) & Mv
        den = sp - sq
        t = np.where(emit_x, sp / np.where(den == 0.0, 1.0, den), 0.0)
        X = P + t[:, :, None] * (Q - P)
        out = np.empty((B, 2 * W, 2), dtype=float)
        out[:, 0::2] = P
        out[:, 1::2] = X
        ov = np.zeros((B, 2 * W), dtype=bool)
        ov[:, 0::2] = emit_p
        ov[:, 1::2] = emit_x
        order = np.argsort(~ov, axis=1, kind="stable")
        P = np.take_along_axis(out, np.broadcast_to(order[:, :, None], out.shape), axis=1)
        lens = ov.sum(1)
        newW = max(int(lens.max()) if B else 1, 1)
        P = P[:, :newW]
    # the scalar semantics keep degenerate 1-2 vertex INTERMEDIATE rings
    # alive (they can re-expand to zero-area >=3 rings); only the final
    # result drops sub-triangle output
    lens = lens.copy()
    lens[lens < 3] = 0
    return P, lens


def batch_clip_areas(subjects, clips) -> np.ndarray:
    """(B,) intersection areas (0.0 where empty)."""
    P, lens = batch_clip(subjects, clips)
    return _shoelace(P, lens)
