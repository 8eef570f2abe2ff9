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
        .withColumn("sim", F.round(_dot(F.col("q_vec"), F.col("c_vec")), 4) + F.lit(0.0))
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _band_bucket(vec_col: str, n_planes: int, band: int) -> Column:
    """Sign-LSH bucket id for one band: bit j = sign of coordinate
    j*stride + band*2 (axis-aligned hyperplanes — deterministic,
    oracle-friendly; random rotations would be the production choice).
    Distinct bands read disjoint coordinate sets, so they are independent
    hash tables in the classic multi-probe LSH sense."""
    v = F.col(vec_col)
    stride = 64 // n_planes
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        bit = F.when(
            F.element_at(v, j * stride + band * 2 + 1) >= 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    band: int = 0,
) -> DataFrame:
    """Single-band sign-LSH bucketing. Returns (vec_id, bucket)."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"), _band_bucket(vec_col, n_planes, band).alias("bucket")
    )


def lsh_bucket_stats(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """Bucket occupancy — the quantity that determines ANN join cost."""
    return (
        lsh_buckets(embeddings, n_planes)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


def _centroids(
    embeddings: DataFrame, n_centroids: int, id_col: str, vec_col: str
) -> DataFrame:
    """Deterministic centroid relation: the ``n_centroids`` smallest-id
    vectors. Tiny — always broadcast by callers."""
    return embeddings.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("c_vec")
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) coarse quantization: assign every vector to its
    nearest centroid. Centroids are the vectors with the ``n_centroids``
    smallest ids — deterministic and oracle-friendly; production would run
    k-means (see ``kmeans_centroids``), which only changes WHERE the
    centroid relation comes from, not this plan. Plan shape: broadcast the
    (tiny) centroid set against the corpus scan, score all pairs, then take
    the argmin per vector as a packed-long MIN HASH AGGREGATE — partial
    (map-side combine) + final, no sort, no window: the only shuffle is the
    combined one-row-per-vector partials. This is the 100 TB shape; a
    row_number() window here would sort-shuffle the full N x n_centroids
    scored relation.

    Returns (vec_id, centroid_id, dist) where dist = 1 - cosine (rounded for
    cross-engine determinism; ``+ 0.0`` normalizes IEEE ``-0.0`` so hashes
    agree across engines; ties break on centroid_id ASC via the packed
    encoding's lexicographic order).

    ``centroids``: optional (centroid_id, c_vec) relation overriding the
    smallest-id convention — e.g. the output of ``kmeans_centroids``."""
    cents = (
        centroids
        if centroids is not None
        else _centroids(embeddings, n_centroids, id_col, vec_col)
    )
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).join(F.broadcast(cents)).withColumn(
        "dist", F.round(F.lit(1.0) - _dot(F.col("vec"), F.col("c_vec")), 4) + F.lit(0.0)
    )
    return _argmin_centroid(scored)


def _argmin_centroid(scored: DataFrame) -> DataFrame:
    """Per-vec_id argmin over (dist, centroid_id) as a HASH aggregate.

    (dist, centroid_id) packed into ONE orderable long so min() compiles to
    HashAggregate (a struct-min falls back to SortAggregate — per-partition
    sorts of the x n_centroids scored relation). dist has 4 decimals, so
    d4 = dist*10^4 is integral; enc = d4 * 2^20 + centroid_id preserves
    (dist ASC, centroid_id ASC) lexicographic order. Decode is exact:
    d4/10000.0 is the correctly-rounded double of the same 4-dp decimal
    F.round produced."""
    _M = 1 << 20
    d4 = F.round(F.col("dist") * 10000, 0).cast("long")
    enc = d4 * _M + F.col("centroid_id").cast("long")
    agg = scored.groupBy("vec_id").agg(F.min(enc).alias("enc"))
    cid = F.pmod(F.col("enc"), F.lit(_M))
    d4_back = ((F.col("enc") - cid) / F.lit(_M)).cast("long")
    return agg.select(
        "vec_id",
        cid.cast("long").alias("centroid_id"),
        (d4_back.cast("double") / F.lit(10000.0) + F.lit(0.0)).alias("dist"),
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    dim: int = 64,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding corpus, entirely as
    DataFrame aggregates — the production replacement for the smallest-id
    centroid convention (feed the result to ``ivf_assign``/``ivf_topk`` via
    ``centroids=``).

    Determinism (so a DuckDB oracle can replay it bit-identically):
    - vectors are QUANTIZED to integers (round(x * scale)) once up front;
      every centroid update is an exact INTEGER sum (order-insensitive,
      overflow-free: |q| <= 2*scale, n <= corpus) divided once — so centroid
      coordinates are identical doubles regardless of partitioning;
    - assignment reuses the rounded-dist packed-long argmin (ties ->
      centroid_id ASC);
    - seeding = the ``n_centroids`` smallest-id vectors (k-means++ would add
      data-dependent randomness the oracle can't replay cheaply).

    Plan shape per iteration: one broadcast join (tiny centroid set) + one
    packed-long argmin hash-aggregate + one per-cluster integer-sum
    hash-aggregate (``dim`` sum columns over the un-exploded quantized
    vectors — no coordinate explode). Empty clusters drop (their centroid
    disappears), exactly as a plain Lloyd iteration does."""
    q = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") * scale, 0).cast("long")
        ).alias("qvec"),
    )
    v = q.select(
        "vec_id",
        F.transform("qvec", lambda x: x.cast("double") / scale).alias("vec"),
    )
    cents = v.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("vec").alias("c_vec")
    )
    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    for _ in range(n_iters):
        # cosine (1 - dot) for normalized full vectors; squared L2 for
        # un-normalized subspaces (the PQ sub-quantizer case)
        raw = (
            F.lit(1.0) - _dot(F.col("vec"), F.col("c_vec"))
            if metric == "cosine"
            else _l2sq(F.col("vec"), F.col("c_vec"))
        )
        scored = v.join(F.broadcast(cents)).withColumn(
            "dist", F.round(raw, 4) + F.lit(0.0)
        )
        assigned = _argmin_centroid(scored).select("vec_id", "centroid_id")
        sums = (
            assigned.join(q, "vec_id")
            .groupBy("centroid_id")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("qvec", j + 1)).alias(f"_s{j}")
                    for j in range(dim)
                ],
            )
        )
        cents = sums.select(
            "centroid_id",
            F.array(
                *[F.col(f"_s{j}") / (F.col("n") * scale) for j in range(dim)]
            ).alias("c_vec"),
        )
        # materialize the TINY centroid relation (<= n_centroids rows) on the
        # driver between iterations — without this every downstream broadcast
        # of `cents` re-executes the whole preceding Lloyd chain (the corpus
        # scan times 2 per iteration); with it the final plan sees centroids
        # as a literal local relation. Bounded bookkeeping, like the
        # runner's offset collect.
        rows = cents.collect()
        cents = cents.sparkSession.createDataFrame(
            rows, "centroid_id long, c_vec array<double>"
        )
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: score a query only against vectors whose
    centroid is among the query's ``n_probe`` nearest centroids.

    The 100 TB shape: the corpus is scored ONCE against the tiny broadcast
    centroid set (the ivf_assign pass, typically precomputed and stored as a
    partition column); the query set probes n_probe/n_centroids of the
    corpus via an equi-join on centroid_id — an O(N·Q·probe-fraction)
    bucket join instead of the exact path's O(N·Q) cross product."""
    from pyspark.sql import Window as W

    assign = ivf_assign(embeddings, n_centroids, id_col, vec_col, centroids=centroids)
    cents = (
        centroids
        if centroids is not None
        else _centroids(embeddings, n_centroids, id_col, vec_col)
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_scored = q.join(F.broadcast(cents)).withColumn(
        "dist", F.round(F.lit(1.0) - _dot(F.col("q_vec"), F.col("c_vec")), 4) + F.lit(0.0)
    )
    wq = W.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("centroid_id").asc())
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "q_vec", "centroid_id")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).join(assign.select(F.col("vec_id").alias("neighbor_id"), "centroid_id"), "neighbor_id")
    scored = (
        probes.join(corpus, "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(_dot(F.col("q_vec"), F.col("c_vec")), 4) + F.lit(0.0))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via MULTI-BAND sign-LSH.

    B independent bands (disjoint plane sets) each bucket every vector; a
    pair is a candidate if it collides in ANY band; candidates are deduped
    (DISTINCT on the pair) before the one scoring pass. Versus a single
    band this (a) multiplies recall — a near-dup pair only needs sign
    agreement in one of B tables — and (b) multiplies shuffle parallelism
    to B * 2^P groups while SHRINKING per-bucket quadratic cost (per-band
    buckets are the same size, but the join key space is B x larger, so
    skewed buckets split across bands instead of serializing on 256 keys).
    This is the same band-bucket-join shape the MinHash-LSH text path uses.
    """
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    banded = e.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_bucket("vec", n_planes, b).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    x, y = banded.alias("x"), banded.alias("y")
    candidates = (
        x.join(y, ["band", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    a = e.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    b_ = e.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        candidates.join(a, "id_a")
        .join(b_, "id_b")
        .withColumn("sim", F.round(_dot(F.col("vec_a"), F.col("vec_b")), 4))
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ) — the billion-vector ANN memory/compute path:
# each vector compresses to m sub-codes (here 4 x 4-bit-ish codes over 16-dim
# subvectors); query scoring is ASYMMETRIC DISTANCE (ADC): per query build an
# m x k lookup table of subvector distances against the codebooks, then a
# database vector's distance is the SUM of m table lookups — no float vector
# is touched at scan time.
# ---------------------------------------------------------------------------


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 over two float arrays — sequential fold, double precision
    (deterministic, matches an in-order SQL evaluation)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(subvector j, code_id, codeword) codebook relation — m * n_codes rows,
    always broadcast by callers.

    Codewords follow the engine's deterministic smallest-id convention (the
    n_codes smallest-id vectors' j-th subvector slices — oracle-friendly,
    same convention as ivf_assign); production swaps in per-subvector
    k-means, which changes WHERE this relation comes from, not any plan
    downstream."""
    sub = dim // m
    slices = [
        F.struct(
            F.lit(j).alias("sub_j"),
            F.col(id_col).cast("long").alias("code_id"),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("codeword"),
        )
        for j in range(m)
    ]
    return (
        embeddings.where(F.col(id_col) < n_codes)
        .select(F.explode(F.array(*slices)).alias("s"))
        .select("s.sub_j", "s.code_id", "s.codeword")
    )


def pq_codebooks_kmeans(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """TRAINED codebooks: per-subvector deterministic L2 k-means (the real
    PQ sub-quantizer). m sequential Lloyd runs over dim/m-dim slices, each
    with the bounded (<= n_codes rows) driver materialization
    kmeans_centroids already does; the result is the same broadcastable
    (sub_j, code_id, codeword) relation as pq_codebooks."""
    sub = dim // m
    parts = []
    for j in range(m):
        sliced = embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("embedding"),
        )
        cents = kmeans_centroids(
            sliced, n_centroids=n_codes, n_iters=n_iters, dim=sub, metric="l2"
        )
        parts.append(
            cents.select(
                F.lit(j).alias("sub_j"),
                F.col("centroid_id").alias("code_id"),
                F.col("c_vec").alias("codeword"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as m sub-codes: per subvector, nearest codeword
    by squared L2. Plan: ONE pass — corpus x broadcast codebooks (m*n_codes
    rows), per-(vec, subvector) argmin as the packed-long MIN hash aggregate
    (no sort/window on the corpus side, same shape as ivf_assign), then the
    m codes collect into an ordered array at one-row-per-vector grain.

    Returns (vec_id, codes array<long>). At 100 TB the codes relation is the
    ONLY thing retained per vector: m longs instead of dim floats (the PQ
    memory story)."""
    sub = dim // m
    scored = (
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
        .join(F.broadcast(codebooks))
        .withColumn(
            "dist",
            F.round(
                _l2sq(
                    F.element_at(
                        F.array(*[F.slice(F.col("vec"), j * sub + 1, sub) for j in range(m)]),
                        F.col("sub_j") + 1,
                    ),
                    F.col("codeword"),
                ),
                4,
            )
            + F.lit(0.0),
        )
    )
    _M = 1 << 20
    d4 = F.round(F.col("dist") * 10000, 0).cast("long")
    enc = d4 * _M + F.col("code_id")
    per_sub = (
        scored.groupBy("vec_id", "sub_j")
        .agg(F.min(enc).alias("enc"))
        .select("vec_id", "sub_j", F.pmod(F.col("enc"), F.lit(_M)).alias("code"))
    )
    return per_sub.groupBy("vec_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("sub_j", "code"))), lambda x: x["code"]
        ).alias("codes")
    )


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ asymmetric-distance top-k: per query an m x n_codes distance
    lookup table (tiny — broadcast), database vectors scored by SUMMING m
    integer table lookups.

    Plan: codes explode to (vec, sub_j, code) — m x corpus, joined to the
    broadcast LUT on (query x sub_j x code); the per-(query, vec) SUM
    partial-combines map-side (a vector's m rows are co-located by
    construction) so the shuffle is one row per (query, vec); top-k per
    query is a window over the query-partitioned relation (|queries| side).
    Distances sum as INTEGER ten-thousandths — order-insensitive, so the
    aggregate is deterministic across any partitioning.

    Returns (query_id, neighbor_id, rank, adc_dist)."""
    from pyspark.sql import Window as W

    sub = dim // m
    cb = codebooks if codebooks is not None else pq_codebooks(
        embeddings, m=m, n_codes=n_codes, dim=dim, id_col=id_col, vec_col=vec_col
    )
    enc = codes if codes is not None else pq_encode(
        embeddings, cb, m=m, dim=dim, id_col=id_col, vec_col=vec_col
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    lut = (
        q.join(F.broadcast(cb))
        .withColumn(
            "d4",
            F.round(
                F.round(
                    _l2sq(
                        F.element_at(
                            F.array(*[F.slice(F.col("q_vec"), j * sub + 1, sub) for j in range(m)]),
                            F.col("sub_j") + 1,
                        ),
                        F.col("codeword"),
                    ),
                    4,
                )
                * 10000,
                0,
            ).cast("long"),
        )
        .select("query_id", "sub_j", F.col("code_id").alias("code"), "d4")
    )
    exploded = enc.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode(F.col("codes")).alias("sub_j", "code"),
    )
    scored = (
        exploded.join(F.broadcast(lut), ["sub_j", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d4").alias("d4_sum"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_dist", F.col("d4_sum").cast("double") / F.lit(10000.0) + F.lit(0.0))
    )
    w = W.partitionBy("query_id").orderBy(F.col("d4_sum").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """The composed billion-vector shape — IVF coarse probe + PQ
    asymmetric-distance scoring (what FAISS calls IVFx,PQy): a query touches
    only the n_probe/n_centroids slice of the corpus, and inside that slice
    scores CODES (m longs/vector) against its broadcast lookup table — no
    float corpus vector is read at query time at all.

    Plan: assign + encode are corpus-side passes (precomputed and stored at
    scale — pass them in via ``codes=``/``centroids=``); the query path is
    probe-selection on the broadcast centroid set, an equi-join on
    centroid_id, the (sub_j, code) LUT join, and one integer-sum aggregate.
    Returns (query_id, neighbor_id, rank, adc_dist)."""
    from pyspark.sql import Window as W

    cents = (
        centroids
        if centroids is not None
        else _centroids(embeddings, n_centroids, id_col, vec_col)
    )
    assign = ivf_assign(embeddings, n_centroids, id_col, vec_col, centroids=cents)
    cb = codebooks if codebooks is not None else pq_codebooks(
        embeddings, m=m, n_codes=n_codes, dim=dim, id_col=id_col, vec_col=vec_col
    )
    enc = codes if codes is not None else pq_encode(
        embeddings, cb, m=m, dim=dim, id_col=id_col, vec_col=vec_col
    )
    sub = dim // m
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_scored = q.join(F.broadcast(cents)).withColumn(
        "dist", F.round(F.lit(1.0) - _dot(F.col("q_vec"), F.col("c_vec")), 4) + F.lit(0.0)
    )
    wq = W.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("centroid_id").asc())
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "centroid_id")
    )
    # candidate list: vectors in the probed inverted lists
    cand = probes.join(
        assign.select(F.col("vec_id").alias("neighbor_id"), "centroid_id"),
        "centroid_id",
    ).where(F.col("neighbor_id") != F.col("query_id")).select("query_id", "neighbor_id")
    lut = (
        q.join(F.broadcast(cb))
        .withColumn(
            "d4",
            F.round(
                F.round(
                    _l2sq(
                        F.element_at(
                            F.array(*[F.slice(F.col("q_vec"), j * sub + 1, sub) for j in range(m)]),
                            F.col("sub_j") + 1,
                        ),
                        F.col("codeword"),
                    ),
                    4,
                )
                * 10000,
                0,
            ).cast("long"),
        )
        .select("query_id", "sub_j", F.col("code_id").alias("code"), "d4")
    )
    exploded = enc.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode(F.col("codes")).alias("sub_j", "code"),
    )
    scored = (
        cand.join(exploded, "neighbor_id")
        .join(F.broadcast(lut), ["query_id", "sub_j", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d4").alias("d4_sum"))
        .withColumn("adc_dist", F.col("d4_sum").cast("double") / F.lit(10000.0) + F.lit(0.0))
    )
    w = W.partitionBy("query_id").orderBy(F.col("d4_sum").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization — the third retrieval memory tier (float32 ->
# PQ codes is ~32x compression with coarse distances; SQ8 is the standard
# middle ground: per-dimension affine uint8 codes, 4x compression, near-exact
# distances — what FAISS calls SQ8 / IndexScalarQuantizer).
# ---------------------------------------------------------------------------


def sq_bounds(
    embeddings: DataFrame, dim: int = 64, vec_col: str = "embedding"
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) training pass as ONE aggregate row: 2*dim
    partially-combined min/max expressions over the corpus scan — no
    explode, no extra shuffle, a bounded 2*dim-value driver materialization
    (the same contract as the k-means centroid rows). The bounds then ride
    into encode/score as broadcast literals."""
    row = embeddings.agg(
        *[
            F.min(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"mn{i}")
            for i in range(dim)
        ],
        *[
            F.max(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"mx{i}")
            for i in range(dim)
        ],
    ).collect()[0]
    return [(row[f"mn{i}"], row[f"mx{i}"]) for i in range(dim)]


def sq_encode(
    embeddings: DataFrame,
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """uint8 codes: c_i = floor((x_i - mn_i) / (mx_i - mn_i) * 255 + 0.5)
    (degenerate dimensions encode 0). Map-only Catalyst pass — one int per
    dimension retained instead of a float32: the 4x memory cut that makes a
    100 TB corpus scannable from codes. The arithmetic mirrors the oracle's
    op order exactly so codes hash-match bit-for-bit."""
    mns = F.array(*[F.lit(float(mn)) for mn, _ in bounds])
    spans = F.array(*[F.lit(float(mx - mn)) for mn, mx in bounds])
    xd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    codes = F.zip_with(
        F.zip_with(xd, mns, lambda x, m: x - m),
        spans,
        lambda d, sp: F.when(
            sp > 0, F.floor(d / sp * 255 + F.lit(0.5)).cast("int")
        ).otherwise(F.lit(0)),
    )
    return embeddings.select(F.col(id_col).alias("vec_id"), codes.alias("codes"))


def sq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bounds: list[tuple[float, float]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric SQ top-k: the query stays float, the corpus is scored
    from its uint8 codes decoded on the fly against broadcast bounds —
    dec_i = mn_i + (c_i * span_i) / 255, score = in-order dot fold (the
    cosine_topk determinism contract). At scale the corpus side reads ONLY
    the codes relation (4x smaller scan, no float vectors); precompute and
    pass ``bounds=``/``codes=`` to skip the training pass.

    Returns (query_id, neighbor_id, rank, score)."""
    from pyspark.sql import Window as W

    if bounds is None:
        dim = len(embeddings.select(vec_col).first()[0])
        bounds = sq_bounds(embeddings, dim=dim, vec_col=vec_col)
    b = bounds
    enc = codes if codes is not None else sq_encode(embeddings, b, id_col, vec_col)
    mns = F.array(*[F.lit(float(mn)) for mn, _ in b])
    spans = F.array(*[F.lit(float(mx - mn)) for mn, mx in b])
    dec = F.zip_with(
        F.zip_with(F.col("codes"), spans, lambda c, sp: (c * sp) / 255),
        mns,
        lambda a, m: a + m,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("q_vec"),
    )
    scored = (
        enc.withColumnRenamed("vec_id", "neighbor_id")
        .join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dec", dec)
        .withColumn(
            "score",
            F.round(
                F.aggregate(
                    F.zip_with(F.col("q_vec"), F.col("dec"), lambda a, c: a * c),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                4,
            )
            + F.lit(0.0),
        )
        .select("query_id", "neighbor_id", "score")
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def ivf_sq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    bounds: list[tuple[float, float]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse probe + SQ8 scoring inside the probed lists (the FAISS
    IVFx,SQ8 shape): a query touches only n_probe/n_centroids of the corpus
    and scores it from uint8 codes decoded against broadcast bounds —
    near-exact similarity (unlike PQ's lossy subvector codes) from a
    4x-smaller scan, no float corpus vector read at query time.

    Plan: probe-selection on the broadcast centroid set, centroid_id
    equi-join to the inverted lists, codes equi-join, per-row in-order dot
    fold, query-partitioned window top-k. assign/encode are corpus passes —
    precompute and pass ``centroids=``/``bounds=``/``codes=`` at scale.
    Returns (query_id, neighbor_id, rank, score)."""
    from pyspark.sql import Window as W

    cents = (
        centroids
        if centroids is not None
        else _centroids(embeddings, n_centroids, id_col, vec_col)
    )
    assign = ivf_assign(embeddings, n_centroids, id_col, vec_col, centroids=cents)
    if bounds is None:
        dim = len(embeddings.select(vec_col).first()[0])
        bounds = sq_bounds(embeddings, dim=dim, vec_col=vec_col)
    enc = codes if codes is not None else sq_encode(embeddings, bounds, id_col, vec_col)
    mns = F.array(*[F.lit(float(mn)) for mn, _ in bounds])
    spans = F.array(*[F.lit(float(mx - mn)) for mn, mx in bounds])
    dec = F.zip_with(
        F.zip_with(F.col("codes"), spans, lambda c, sp: (c * sp) / 255),
        mns,
        lambda a, m: a + m,
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_scored = q.join(F.broadcast(cents)).withColumn(
        "dist", F.round(F.lit(1.0) - _dot(F.col("q_vec"), F.col("c_vec")), 4) + F.lit(0.0)
    )
    wq = W.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("centroid_id").asc())
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "centroid_id")
    )
    cand = probes.join(
        assign.select(F.col("vec_id").alias("neighbor_id"), "centroid_id"),
        "centroid_id",
    ).where(F.col("neighbor_id") != F.col("query_id")).select("query_id", "neighbor_id")

    qd = q.select(
        "query_id",
        F.transform(F.col("q_vec"), lambda v: v.cast("double")).alias("qd"),
    )
    scored = (
        cand.join(enc.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(qd), "query_id")
        .withColumn("dec", dec)
        .withColumn(
            "score",
            F.round(
                F.aggregate(
                    F.zip_with(F.col("qd"), F.col("dec"), lambda a, c: a * c),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                4,
            )
            + F.lit(0.0),
        )
        .select("query_id", "neighbor_id", "score")
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


# ---------------------------------------------------------------------------
# Exact re-rank — the refine stage every production ANN deployment puts after
# a lossy candidate generator (FAISS IndexRefineFlat): the quantized index
# proposes R >> k candidates cheaply, the float vectors are consulted ONLY
# for those R rows, and the final top-k is exact over the candidate set.
# This is what turns PQ's coarse distances into retrieval quality.
# ---------------------------------------------------------------------------


def rerank_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k over an ANN candidate relation (query_id, neighbor_id).

    Plan: the candidate set is |queries| x R rows — broadcast it into the
    corpus scan, so the only corpus-side work is a map-side semi-join that
    projects the touched float vectors; the exact in-order dot folds then run
    on |q| x R rows, never the corpus. At 100 TB the quantized index bounds
    how much float data is ever read: R vectors per query, independent of N.

    Returns (query_id, neighbor_id, rank, sim) — same contract as
    ``cosine_topk``, deterministic tie-break (sim DESC, neighbor_id ASC)."""
    from pyspark.sql import Window as W

    cand = candidates.select("query_id", "neighbor_id")
    nvec = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = (
        nvec.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("sim", F.round(_dot(F.col("q_vec"), F.col("n_vec")), 4) + F.lit(0.0))
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def pq_rerank_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int = 20,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ candidate generation + exact refine (FAISS ``PQy,RFlat``): ADC
    proposes the top ``rerank`` candidates from integer code scoring, then
    ``rerank_topk`` consults the float vectors for exactly those rows.

    The two stages keep their own scale shapes — the ADC stage never reads a
    float corpus vector, the refine stage reads ``rerank`` vectors per query
    — so the composition restores exact-ranking quality at quantized-scan
    cost."""
    cand = pq_adc_topk(
        embeddings,
        queries,
        k=rerank,
        m=m,
        n_codes=n_codes,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        codebooks=codebooks,
        codes=codes,
    ).select("query_id", "neighbor_id")
    return rerank_topk(embeddings, queries, cand, k=k, id_col=id_col, vec_col=vec_col)


def ivf_pq_rerank_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int = 20,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """The complete production retrieval stack (FAISS ``IVFx,PQy`` + refine):
    coarse probe bounds WHICH corpus slice is touched (n_probe/n_centroids),
    PQ codes bound WHAT is read inside it (m longs/vector, broadcast LUT
    scoring), and the refine stage bounds the float reads to ``rerank``
    vectors per query. Each tier's cost is independent of corpus size except
    through the probed-list length — the billion-vector query shape.

    Returns (query_id, neighbor_id, rank, sim) with exact similarity."""
    cand = ivf_pq_topk(
        embeddings,
        queries,
        k=rerank,
        n_centroids=n_centroids,
        n_probe=n_probe,
        m=m,
        n_codes=n_codes,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        centroids=centroids,
        codebooks=codebooks,
        codes=codes,
    ).select("query_id", "neighbor_id")
    return rerank_topk(embeddings, queries, cand, k=k, id_col=id_col, vec_col=vec_col)
