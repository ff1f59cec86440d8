"""spark-submit entry point: build a spatial-weights edge table, resumably.

The north_star deployment shape: the engine ships as ordinary spark-submit
jobs over the packaged library —

    spark-submit --py-files libpysal_spark.zip jobs/build_weights.py \
        --points s3://bucket/points.parquet --out s3://bucket/edges \
        --op band --threshold 12.0 --transform R --buckets 256

Locally the same file runs under plain ``python`` (master defaults to
local[*]); under spark-submit the cluster master/conf win because the session
builder sets NO master here.

The write is partitioned by a content-derived bucket of the focal id and
carries the per-partition lineage manifest (plans/lineage.py): re-running
the identical job resumes — committed partitions are pruned before any
compute, partially-written ones are replaced, never duplicated.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build(spark: SparkSession, args: argparse.Namespace):
    from libpysal_spark.operators.distance import distance_band, kernel_weights, knn

    pts = spark.read.parquet(args.points).select("id", "x", "y")
    if args.op == "band":
        g = distance_band(pts, args.threshold, cell_size=args.cell_size)
    elif args.op == "knn":
        g = knn(pts, args.k, cell_size=args.cell_size)
    elif args.op == "kernel":
        g = kernel_weights(pts, args.threshold, args.kernel, cell_size=args.cell_size)
    else:
        raise SystemExit(f"unknown --op {args.op}")
    if args.transform != "O":
        g = g.transform(args.transform)
    return g


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True, help="parquet with (id, x, y)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--op", choices=["band", "knn", "kernel"], default="band")
    ap.add_argument("--threshold", type=float, default=12.0)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--kernel", default="gaussian")
    ap.add_argument("--cell-size", type=float, default=None)
    ap.add_argument("--transform", choices=["O", "R", "B", "D", "V"], default="O")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--mode", choices=["resume", "overwrite"], default="resume")
    args = ap.parse_args(argv)

    # no .master() here: spark-submit's cluster conf wins; plain python runs local
    spark = SparkSession.builder.appName(f"build-weights-{args.op}").getOrCreate()
    from libpysal_spark.plans.lineage import load_manifest, write_with_lineage

    before = len(load_manifest(args.out)["partitions"])
    g = build(spark, args)
    edges = g.edges.withColumn(
        "bucket", F.pmod(F.xxhash64("focal"), F.lit(args.buckets))
    )
    manifest = write_with_lineage(edges, args.out, "bucket", mode=args.mode)
    summary = {
        "op": args.op,
        "out": args.out,
        "partitions_total": len(manifest["partitions"]),
        "partitions_written": len(manifest["partitions"]) - (0 if args.mode == "overwrite" else before),
        "rows": sum(p["rows"] for p in manifest["partitions"].values()),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
