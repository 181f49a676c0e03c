"""Similarity search over the embeddings table.

* ``topk_bruteforce`` — exact cosine top-k: the correctness baseline. The
  query side is tiny and broadcast; candidates stream through a codegen'd
  zip_with/aggregate dot product (no Python). At 100 TB the same plan shape
  holds: broadcast queries × partitioned candidates, partial top-k per
  partition via the window's sort, AQE-coalesced.
* ``topk_lsh`` — sign-random-projection LSH: bucket = sign bits of the first
  SIGN_BITS dimensions (axis-aligned hyperplanes — deterministic and
  SQL-expressible, so the oracle can verify the whole path). Candidates are
  same-bucket only: the shuffle is an equality join on the bucket key, never
  a cross product. Swapping in learned/random hyperplanes or an IVF coarse
  quantizer changes only the bucket expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SIGN_BITS = 6  # 64 buckets
TOPK = 5
LSH_TOPK = 3
N_QUERIES = 8
N_QUERIES_LSH = 32
IVF_CENTROIDS = 16  # vec_id 0..15 serve as deterministic coarse centroids
IVF_NPROBE = 2
IVF_TOPK = 3
N_QUERIES_IVF = 24


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _vecs(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


def sign_bucket_expr(v: Column, bits: int = SIGN_BITS) -> Column:
    """Concatenated sign bits of the first `bits` dims (1 if ≥ 0 else 0)."""
    parts = [F.when(F.element_at(v, i + 1) >= 0, "1").otherwise("0") for i in range(bits)]
    return F.concat(*parts)


def topk_bruteforce(embeddings: DataFrame, k: int = TOPK, n_queries: int = N_QUERIES) -> DataFrame:
    e = _vecs(embeddings)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_expr(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("score"))
    )


def _assign_cells(e: DataFrame, centroids: DataFrame, nprobe: int, id_col: str) -> DataFrame:
    """Per vector: its nprobe nearest centroid cells (by cosine), rank-stable."""
    scored = e.crossJoin(F.broadcast(centroids)).select(
        id_col, "v", F.col("cid"), cosine_expr(F.col("v"), F.col("cv")).alias("csim")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= nprobe)
        .select(id_col, "v", "cid")
    )


def topk_ivf(
    embeddings: DataFrame,
    k: int = IVF_TOPK,
    n_queries: int = N_QUERIES_IVF,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF-style ANN: a deterministic coarse quantizer (the first
    IVF_CENTROIDS vectors stand in for k-means centroids — same cells every
    run, so the oracle can replay the whole path), candidates assigned to
    their single nearest cell, queries probing their nprobe nearest cells.
    At scale: centroids broadcast, candidates shuffle once on cell id, each
    probe is an equality join — the classic IVF pruning shape."""
    e = _vecs(embeddings)
    centroids = e.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    cand = _assign_cells(e, centroids, 1, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), "cid"
    )
    q = _assign_cells(
        e.filter(F.col("vec_id") < n_queries).withColumnRenamed("vec_id", "query_id"),
        centroids,
        nprobe,
        "query_id",
    ).select("query_id", F.col("v").alias("qv"), "cid")
    scored = (
        cand.join(q, on="cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("nv")).alias("cos"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("score"))
    )


def topk_lsh(embeddings: DataFrame, k: int = LSH_TOPK, n_queries: int = N_QUERIES_LSH) -> DataFrame:
    e = _vecs(embeddings).withColumn("bucket", sign_bucket_expr(F.col("v")))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("bucket")
    )
    scored = (
        e.join(F.broadcast(q), on="bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_expr(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("score"))
    )
