"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. Query side is broadcast
  (queries << corpus); dot products are `aggregate(zip_with(...))` — native
  higher-order functions, JVM-side, no Python;
- cell-bucketed (LSH) variant for scale: sign-random-projection buckets from
  *deterministic* pseudo-planes derived by portable hashing, so bucket
  assignment is reproducible across engines and cluster sizes.

At 100 TB the corpus side streams from parquet; the only shuffle is the final
per-query top-k (a tiny groupBy over num_queries * k rows when k-reduction is
pushed into partial aggregation via window-over-candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a: str, b: str) -> F.Column:
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query_id, neighbor_id, cosine, rank).

    Ties broken by neighbor id after rounding to 6 dp — deterministic across
    engines and cluster sizes. Self-matches excluded.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_cosine("__qv", "__cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def srp_buckets(
    vectors: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """(vec_id, bucket) sign-random-projection LSH bucket.

    Plane p's component for dimension d is a deterministic pseudo-uniform in
    [-1, 1): derived from multiplicative hashing of (seed, p, d). Fully
    reproducible, no RNG state, no Python.
    """
    dim = F.size(F.col(vec_col))
    planes = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), dim - 1),
                lambda v, d: v.cast("double")
                * (
                    ((p * F.lit(1000003) + d * F.lit(7919) + F.lit(seed)) * F.lit(2654435761) % F.lit(1000000)).cast("double")
                    / F.lit(500000.0)
                    - F.lit(1.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    # 2^i via double pow is exact for i < 53 — avoids column-shift limitations
    bucket = F.aggregate(
        F.zip_with(
            planes,
            F.sequence(F.lit(0), F.lit(num_planes - 1)),
            lambda proj, i: F.when(proj > 0, F.pow(F.lit(2.0), i).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return vectors.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search.

    The 100-TB shape: coarse-quantize the corpus once into per-centroid
    inverted lists (equi-joinable by centroid id), then each query probes only
    its ``n_probe`` nearest lists — the scan per query drops from |corpus| to
    ~|corpus|·n_probe/n_centroids, and the only joins are broadcast (the
    centroid table) and an equi-join on the centroid id (shuffle-partitioned,
    skew-safe when centroids are balanced).

    ``centroids`` defaults to the ``n_centroids`` lowest-id corpus vectors —
    a deterministic coarse quantizer that keeps the operator reproducible and
    SQL-oracle-checkable; production would plug a sampled k-means here (the
    list/probe machinery — the distributed part — is identical).
    """
    if centroids is None:
        centroids = corpus.orderBy(id_col).limit(n_centroids)
    cent = F.broadcast(
        centroids.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("__ct"))
    )

    def nearest(df: DataFrame, role: str, n: int) -> DataFrame:
        scored = (
            df.select(F.col(id_col).alias(role), F.col(vec_col).alias("__v"))
            .crossJoin(cent)
            .withColumn("__sim", F.round(_cosine("__v", "__ct"), 6))
        )
        w = Window.partitionBy(role).orderBy(F.col("__sim").desc(), F.col("cid"))
        return (
            scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n)
            .select(role, "cid")
        )

    lists = nearest(corpus, "neighbor_id", 1)  # each corpus vector in ONE list
    probes = nearest(queries, "query_id", n_probe)
    cand = (
        probes.join(lists, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = cand.join(q, "query_id").join(c, "neighbor_id").withColumn(
        "cosine", F.round(_cosine("__qv", "__cv"), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table SRP LSH.

    Classic L-table construction (Indyk-Motwani): each table hashes with its
    own ``num_planes`` hyperplanes; candidates are the union over tables of
    same-bucket pairs, then scored exactly and top-k'd. Recall grows as
    1 - (1 - p^b)^L. One shuffle per table on the (table, bucket) key; the
    exact rescoring only touches candidates, never the full corpus.
    """

    def tagged(df: DataFrame, role: str) -> DataFrame:
        parts = []
        for t in range(num_tables):
            b = srp_buckets(df, num_planes, id_col, vec_col, seed=7 + 101 * t)
            parts.append(b.withColumn("tbl", F.lit(t)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.withColumnRenamed("vec_id", role)

    cb = tagged(corpus, "neighbor_id")
    qb = tagged(queries, "query_id")
    cand = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = cand.join(q, "query_id").join(c, "neighbor_id").withColumn(
        "cosine", F.round(_cosine("__qv", "__cv"), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
