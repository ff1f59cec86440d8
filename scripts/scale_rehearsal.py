"""10x scale rehearsal (VERDICT r3 #1): run the heavy builders on an
sf1-equivalent synthetic fixture and record wall / rows / rows-per-sec plus
the internals the plans rely on (knn ring rounds + residue, delaunay halo +
retries, shuffle-partition balance).

The fixture is generated with the ENGINE'S OWN deterministic geocoder
(pages.geocode_exprs over spark.range — the identical id->point formula the
graded queries use), at 10x the sf0.1 row counts. Density is held constant
by scaling distance thresholds by 1/sqrt(10): web-scale growth means more
area covered, not a denser planet — and constant density is what keeps the
per-cell candidate counts (the actual task sizes) fixed as rows grow, which
is the property being rehearsed.

Embeddings are hash-derived unit vectors (deterministic, no RNG), 10x the
sf0.1 corpus at the same dim.

Usage: python scripts/scale_rehearsal.py [--mult 10]
Writes scale_rehearsal.json in the repo root; BENCH.md cites it.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from libpysal_spark import get_spark
from libpysal_spark.pages import geocode_exprs

MULT = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "10"))
SQ = math.sqrt(MULT)
# comma-separated subset of result names to run (VERDICT r4 #7: the 100x
# pass exercises distance_band/knn/components only — delaunay and the exact
# near-dup GEMM have their own dedicated scale evidence)
ONLY = {
    s for s in os.environ.get("SPARK_GRAFT_SCALE_ONLY", "").split(",") if s
}

# sf0.1 row counts (TESTDATA.md) x MULT
N_ORDERS = 150_000 * MULT
N_CUSTOMER = 15_000 * MULT
N_EMB = 2_000 * MULT
N_DELAUNAY = 100_000  # 100x the graded supplier table — the partitioned path
EMB_DIM = 64


def synth_points(spark, n: int):
    x, y = geocode_exprs("id")
    return spark.range(n, numPartitions=64).select("id", x.alias("x"), y.alias("y"))


def synth_embeddings(spark, n: int):
    """Deterministic pseudo-embeddings: components from multiplicative
    hashing in [-1, 1) (same arithmetic family as the geocoder); cosine
    normalizes, so no explicit normalization needed."""
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
        lambda i: (
            ((F.col("id") * 2654435761 + i * 40503 + (F.col("id") + i) * 2246822519)
             % 1000003) / 500001.5 - 1.0
        ).cast("float"),
    )
    return spark.range(n, numPartitions=32).select(
        F.col("id").alias("vec_id"), comp.alias("embedding")
    )


def partition_balance(df) -> dict:
    """Rows per output partition of the final stage — skew evidence."""
    c = df.groupBy(F.spark_partition_id().alias("p")).count()
    r = c.agg(
        F.max("count").alias("mx"), F.avg("count").alias("avg"),
        F.count("*").alias("parts"),
    ).first()
    return {
        "partitions": int(r.parts),
        "max_rows": int(r.mx),
        "mean_rows": int(r.avg),
        "max_over_mean": round(r.mx / r.avg, 2) if r.avg else None,
    }


def main():
    spark = get_spark(app_name="scale-rehearsal", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"mult": MULT, "results": {}}

    def run(name, fn, info=None):
        if ONLY and name not in ONLY:
            return
        t0 = time.time()
        rows = fn()
        dt = round(time.time() - t0, 2)
        rec = {"wall_sec": dt, "out_rows": rows,
               "rows_per_sec": round(rows / dt, 1) if dt else None}
        if info:
            rec.update(info())
        out["results"][name] = rec
        print(name, json.dumps(rec), flush=True)

    orders = synth_points(spark, N_ORDERS).localCheckpoint()
    customer = synth_points(spark, N_CUSTOMER).localCheckpoint()

    from libpysal_spark.operators import distance as DIST
    from libpysal_spark.operators.distance import distance_band, knn

    band_t = 12.0 / SQ  # constant expected degree vs sf0.1
    _band_g = {}

    def _band():
        g = distance_band(orders, band_t)
        n = g.edges.count()
        _band_g["g"] = g
        return n

    run("distance_band_build", _band, lambda: {"threshold": round(band_t, 4)})
    # skew evidence measured OUTSIDE the timed region (it recomputes the join)
    if "g" in _band_g:
        out["results"]["distance_band_build"]["balance"] = partition_balance(
            _band_g["g"].edges
        )
        _band_g["g"].unpersist()

    def _knn():
        g = knn(orders, 10)
        n = g.edges.count()
        g.unpersist()
        return n

    run("knn10_build", _knn, lambda: dict(DIST.last_knn_info))

    from libpysal_spark.operators import delaunay as DY

    dpts = (
        synth_points(spark, N_DELAUNAY).localCheckpoint()
        if not ONLY or "delaunay_partitioned_100k_cells8" in ONLY
        else None
    )

    def _delaunay():
        return DY.delaunay(dpts, cells_per_side=8).edges.count()

    run("delaunay_partitioned_100k_cells8", _delaunay,
        lambda: dict(DY.last_build_info))

    from libpysal_spark.text.ann import cosine_threshold_pairs

    emb = (
        synth_embeddings(spark, N_EMB).localCheckpoint()
        if not ONLY or "embedding_near_dup" in ONLY
        else None
    )

    def _neardup():
        return cosine_threshold_pairs(emb, 0.35, blocks=24).count()

    run("embedding_near_dup", _neardup, lambda: {"n_vectors": N_EMB, "blocks": 24})

    from libpysal_spark import graph as GRAPH

    def _components():
        g = distance_band(customer, 20.0 / SQ)
        n = g.component_labels().select("component").distinct().count()
        g.unpersist()
        return n

    run(
        "connected_components",
        _components,
        lambda: dict(getattr(GRAPH, "last_components_info", {})),
    )

    fname = (
        "scale_rehearsal.json" if MULT == 10 else f"scale_rehearsal_{MULT}x.json"
    )
    with open(os.path.join(REPO, fname), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
