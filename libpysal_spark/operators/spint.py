"""Spatial-interaction weights: ODW (Kronecker), netW, vecW.

Reference: weights/spintW.py —
- ``ODW`` (:19-78): weights over origin-destination flows,
  W_od = kron(W_o, W_d): flow (o, d) neighbors flow (o', d') with weight
  w_o(o,o') * w_d(d,d'); flow id = o * n_d + d;
- ``netW`` (:81-158): edge-graph of a network — directed edges are neighbors
  when they share an endpoint, per share mode;
- ``vecW`` (:159-241): DistanceBand in the 4-D (ox, oy, dx, dy) vector space.

Spark design: Kronecker product as a *join* — never materialize the dense
product. ``edges_o CROSS-free JOIN edges_d`` is a cartesian of two edge
tables, but each is sparse (the reference's W are sparse too); the output is
exactly the nonzeros. netW is a self-join on endpoint columns. vecW reuses
the grid candidate machinery in 4-D (two 2-D cell keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libpysal_spark.graph import EDGE_COLS, Graph, resolve_isolates


def odw(wo: Graph, wd: Graph, n_d: int, silence_warnings: bool = True) -> Graph:
    """Origin-destination weights: kron(W_o, W_d) as a sparse join.

    Flow ids: ``o * n_d + d`` (row-major, matching scipy.sparse.kron layout
    used at weights/spintW.py:76). Isolate self-loops (weight 0) are excluded
    from the product, as kron of a zero row is zero.
    """
    eo = wo.edges.filter(F.col("weight") != 0.0).select(
        F.col("focal").alias("of"), F.col("neighbor").alias("on"), F.col("weight").alias("wo")
    )
    ed = wd.edges.filter(F.col("weight") != 0.0).select(
        F.col("focal").alias("df"), F.col("neighbor").alias("dn"), F.col("weight").alias("wd")
    )
    prod = eo.crossJoin(ed).select(
        (F.col("of") * n_d + F.col("df")).alias("focal"),
        (F.col("on") * n_d + F.col("dn")).alias("neighbor"),
        (F.col("wo") * F.col("wd")).alias("weight"),
    )
    ids_o = wo.edges.select(F.col("focal").alias("o")).distinct()
    ids_d = wd.edges.select(F.col("focal").alias("d")).distinct()
    ids = ids_o.crossJoin(ids_d).select((F.col("o") * n_d + F.col("d")).alias("id"))
    return Graph(resolve_isolates(prod, ids))


def netw(link_list: DataFrame, share: str = "A") -> Graph:
    """Edge-graph of a network (weights/spintW.py:81-158).

    ``link_list``: (link_id, o, d) directed links. Two distinct links are
    neighbors per ``share`` mode:
      'O' — same origin; 'D' — same destination;
      'OD' — origin of one == destination of the other;
      'C'  — any shared endpoint with matching flow continuity (o==o', d==d');
      'A'  — any shared endpoint (all).
    """
    a = link_list.select(
        F.col("link_id").alias("focal"), F.col("o").alias("ao"), F.col("d").alias("ad")
    )
    b = link_list.select(
        F.col("link_id").alias("neighbor"), F.col("o").alias("bo"), F.col("d").alias("bd")
    )
    conds = {
        "O": F.col("ao") == F.col("bo"),
        "D": F.col("ad") == F.col("bd"),
        "OD": (F.col("ao") == F.col("bd")) | (F.col("ad") == F.col("bo")),
        "C": (F.col("ao") == F.col("bo")) | (F.col("ad") == F.col("bd")),
        "A": (F.col("ao") == F.col("bo"))
        | (F.col("ad") == F.col("bd"))
        | (F.col("ao") == F.col("bd"))
        | (F.col("ad") == F.col("bo")),
    }
    pairs = (
        a.join(b, conds[share])
        .filter(F.col("focal") != F.col("neighbor"))
        .select("focal", "neighbor")
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    return Graph(resolve_isolates(pairs, link_list.select(F.col("link_id").alias("id"))))


def vecw(flows: DataFrame, threshold: float, binary: bool = True, alpha: float = -1.0) -> Graph:
    """DistanceBand in 4-D (ox, oy, dx, dy) (weights/spintW.py:159-241).

    ``flows``: (id, ox, oy, dx, dy). Candidates via a composite grid key on
    both endpoints (cell size = threshold); the 4-D euclidean distance filter
    runs as a native expression. Two flows within threshold in 4-D are within
    threshold in each 2-D projection, so the pairwise cell join is a superset.
    """
    s = float(threshold)

    def cells(df, px, py, pfx):
        return df.withColumn(f"{pfx}cx", F.floor(F.col(px) / s)).withColumn(
            f"{pfx}cy", F.floor(F.col(py) / s)
        )

    left = cells(cells(flows, "ox", "oy", "o"), "dx", "dy", "d")
    # at threshold-sized cells, a flow pair within threshold differs by at
    # most 1 cell in every dim -> explode all 4 dims (81 probes).
    offs4 = F.expr(
        "flatten(transform(sequence(-1, 1), a -> flatten(transform(sequence(-1, 1), b -> "
        "flatten(transform(sequence(-1, 1), c -> transform(sequence(-1, 1), e -> "
        "struct(a, b, c, e))))))))"
    )
    probe = left.withColumn("__o", F.explode(offs4)).select(
        F.col("id").alias("focal"),
        F.col("ox").alias("ox_f"), F.col("oy").alias("oy_f"),
        F.col("dx").alias("dx_f"), F.col("dy").alias("dy_f"),
        (F.col("ocx") + F.col("__o.a")).alias("pa"),
        (F.col("ocy") + F.col("__o.b")).alias("pb"),
        (F.col("dcx") + F.col("__o.c")).alias("pc"),
        (F.col("dcy") + F.col("__o.e")).alias("pd"),
    )
    right = left.select(
        F.col("id").alias("neighbor"),
        F.col("ox").alias("ox_n"), F.col("oy").alias("oy_n"),
        F.col("dx").alias("dx_n"), F.col("dy").alias("dy_n"),
        F.col("ocx").alias("pa"), F.col("ocy").alias("pb"),
        F.col("dcx").alias("pc"), F.col("dcy").alias("pd"),
    )
    d4 = F.sqrt(
        (F.col("ox_f") - F.col("ox_n")) * (F.col("ox_f") - F.col("ox_n"))
        + (F.col("oy_f") - F.col("oy_n")) * (F.col("oy_f") - F.col("oy_n"))
        + (F.col("dx_f") - F.col("dx_n")) * (F.col("dx_f") - F.col("dx_n"))
        + (F.col("dy_f") - F.col("dy_n")) * (F.col("dy_f") - F.col("dy_n"))
    )
    pairs = (
        probe.join(right, ["pa", "pb", "pc", "pd"])
        .filter(F.col("focal") != F.col("neighbor"))
        .withColumn("dist", d4)
        .filter(F.col("dist") <= s)
    )
    w = F.lit(1.0) if binary else F.pow(F.col("dist"), F.lit(float(alpha)))
    edges = pairs.select("focal", "neighbor", w.alias("weight"))
    return Graph(resolve_isolates(edges, flows.select("id")))
