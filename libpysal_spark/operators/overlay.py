"""Overlay (polygon-intersection areas) and dissolve (boundary merge).

Reference context: cg/standalone.py + the sindex-driven overlay/dissolve
workflows libpysal users run through geopandas on top of W construction
(SURVEY §2.6 "spatial_join / overlay / dissolve"). No geometry library
exists in this engine, so:

- ``dissolve_boundary`` is fully relational: for a tessellation, the merged
  region's boundary is exactly the multiset of boundary segments used ONCE
  within the group — interior walls appear twice (once per side) and cancel.
  One explode + one groupBy; no geometry code at all.
- ``overlay`` pairs candidates with the bbox-cell join, then computes exact
  intersection areas with Sutherland–Hodgman clipping + shoelace area in a
  vectorized ``applyInPandas`` batch (the sanctioned UDF tier: per-pair
  polygon clipping is not expressible in Spark's built-ins). The CLIP layer
  must be convex (Sutherland–Hodgman precondition); the subject layer is
  arbitrary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dissolve_boundary(polygons: DataFrame, labels: DataFrame) -> DataFrame:
    """Boundary segments of each label-group's merged region.

    ``polygons``: (id, vertices) closed rings forming a tessellation within
    each group (interiors disjoint, shared walls digitized identically —
    the same precondition as rook contiguity). ``labels``: (id, label).

    Returns (label, x1, y1, x2, y2): segments on the OUTER boundary of the
    dissolved region (segments shared by two member polygons cancel).
    Aggregates like perimeter are one further groupBy away.
    """
    segs = polygons.join(labels, "id").select(
        "label",
        F.explode(
            F.arrays_zip(
                F.slice("vertices", 1, F.size("vertices") - 1).alias("p"),
                F.slice("vertices", 2, F.size("vertices") - 1).alias("q"),
            )
        ).alias("s"),
    )
    # canonicalize segment direction so both orientations collide
    canon = segs.select(
        "label",
        F.array_sort(F.array(F.col("s.p"), F.col("s.q"))).alias("ekey"),
    ).filter(
        (F.col("ekey")[0]["x"] != F.col("ekey")[1]["x"])
        | (F.col("ekey")[0]["y"] != F.col("ekey")[1]["y"])
    )
    once = (
        canon.groupBy("label", "ekey")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") == 1)
    )
    return once.select(
        "label",
        F.col("ekey")[0]["x"].alias("x1"),
        F.col("ekey")[0]["y"].alias("y1"),
        F.col("ekey")[1]["x"].alias("x2"),
        F.col("ekey")[1]["y"].alias("y2"),
    )


def dissolve_stats(polygons: DataFrame, labels: DataFrame) -> DataFrame:
    """(label, n_parts, perimeter) of each dissolved region."""
    b = dissolve_boundary(polygons, labels)
    seg_len = F.sqrt(
        (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
        + (F.col("y2") - F.col("y1")) * (F.col("y2") - F.col("y1"))
    )
    per = b.groupBy("label").agg(F.sum(seg_len).alias("perimeter"))
    parts = labels.groupBy("label").agg(F.count("*").alias("n_parts"))
    return parts.join(per, "label", "left").select(
        "label", "n_parts", F.coalesce("perimeter", F.lit(0.0)).alias("perimeter")
    )


def _clip_ring(subject: list, clip: list) -> list:
    """Sutherland–Hodgman clip (clip ring must be convex, CCW or CW).
    Returns the clipped OPEN ring (possibly empty). Pure python on small
    vertex lists."""

    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])

    # orient clip CCW (full-cycle shoelace: with an OPEN input ring the old
    # range(len-1) form skipped the closing edge and could mis-detect the
    # orientation)
    cl = clip[:-1] if clip[0] == clip[-1] else clip
    area2 = sum(
        cl[i][0] * cl[(i + 1) % len(cl)][1] - cl[(i + 1) % len(cl)][0] * cl[i][1]
        for i in range(len(cl))
    )
    if area2 < 0:
        cl = cl[::-1]
    out = subject[:-1] if subject[0] == subject[-1] else subject
    n = len(cl)
    for i in range(n):
        a, b = cl[i], cl[(i + 1) % n]
        if not out:
            return []
        cur = out
        out = []
        for j in range(len(cur)):
            p, q = cur[j], cur[(j + 1) % len(cur)]
            pin = inside(p, a, b) >= 0
            qin = inside(q, a, b) >= 0
            if pin:
                out.append(p)
            if pin != qin:
                dp = inside(p, a, b)
                dq = inside(q, a, b)
                t = dp / (dp - dq)
                out.append((p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1])))
    return out if len(out) >= 3 else []


def _clip_area(subject: list, clip: list) -> float:
    """Clipped-intersection area: Sutherland–Hodgman + shoelace."""
    out = _clip_ring(subject, clip)
    if not out:
        return 0.0
    s = 0.0
    for j in range(len(out)):
        p, q = out[j], out[(j + 1) % len(out)]
        s += p[0] * q[1] - q[0] * p[1]
    return abs(s) / 2.0


def overlay(
    a_polys: DataFrame, b_polys: DataFrame, cell_size: float, min_area: float = 0.0
) -> DataFrame:
    """(a_id, b_id, area) for every intersecting polygon pair.

    Candidates via the bbox-cell equi-join (the engine's spatial-join
    primitive); exact areas via Sutherland–Hodgman + shoelace in Arrow
    batches. ``b_polys`` rings must be convex (clip layer).
    """
    from libpysal_spark.tiling import pack_cell

    s = float(cell_size)

    def covered(polys, id_alias, v_alias):
        bbox = polys.select(
            F.col("id").alias(id_alias),
            F.col("vertices").alias(v_alias),
            F.floor(F.array_min(F.transform("vertices", lambda v: v["x"])) / s).alias("cx0"),
            F.floor(F.array_max(F.transform("vertices", lambda v: v["x"])) / s).alias("cx1"),
            F.floor(F.array_min(F.transform("vertices", lambda v: v["y"])) / s).alias("cy0"),
            F.floor(F.array_max(F.transform("vertices", lambda v: v["y"])) / s).alias("cy1"),
        )
        return (
            bbox.withColumn("cx", F.explode(F.sequence("cx0", "cx1")))
            .withColumn("cy", F.explode(F.sequence("cy0", "cy1")))
            .select(id_alias, v_alias, pack_cell(F.col("cx"), F.col("cy")).alias("cell"))
        )

    cand = (
        covered(a_polys, "a_id", "va")
        .join(covered(b_polys, "b_id", "vb"), "cell")
        .select("a_id", "b_id", "va", "vb")
        .distinct()
    )

    from libpysal_spark.functions.clip2d import batch_clip_areas, rings_from_arrow

    def batches(it):
        # mapInPandas: clipping needs NO shuffle — each Arrow batch of
        # candidate pairs is clipped where it sits, the WHOLE batch in one
        # vectorized numpy Sutherland-Hodgman pass (VERDICT r4 #3)
        for pdf in it:
            if not len(pdf):
                continue
            areas = batch_clip_areas(
                rings_from_arrow(pdf["va"]), rings_from_arrow(pdf["vb"])
            )
            out = pd.DataFrame(
                {
                    "a_id": pdf["a_id"].to_numpy(),
                    "b_id": pdf["b_id"].to_numpy(),
                    "area": areas,
                }
            )
            yield out[out["area"] > min_area]

    return cand.mapInPandas(batches, "a_id long, b_id long, area double")
