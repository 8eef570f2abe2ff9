"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash.

All built on the deterministic md5-derived hash (functions.text.hash64) so
each has a bit-identical DuckDB oracle; all formulated as set-oriented
DataFrame plans that survive a 100 TB corpus:

- exact:   one hash aggregation on md5(text) — map-side combine collapses
           duplicate-heavy corpora before the shuffle.
- jaccard: shingle-explode + equi-join on shingle. Quadratic in per-shingle
           document frequency — at scale ALWAYS drop stop-shingles (high-DF)
           first; provided via ``max_df``.
- minhash: 16 min-hashes banded 4x4; candidates = pairs sharing a band
           bucket. The band join touches only same-bucket pairs, which is
           the scale path (vs all-pairs jaccard).
- simhash: 32/64-bit majority-vote fingerprint per doc; near-dups share all
           but <=k bits.
- simhash_near_dups: the hamming-distance retrieval that completes the
           SimHash family — banded multi-index (split the fingerprint into
           b > k chunks; any pair within hamming k shares at least one
           identical chunk by pigeonhole), equi-join on (band, chunk), then
           verify candidates with bit_count(xor) <= k. Same band-bucket join
           shape as MinHash-LSH: never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import hash64, shingles_df, tokens


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (content md5, representative = min doc_id,
    n_copies) for groups with more than one member."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.min("doc_id").alias("representative"), F.count("*").alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def normalize_text(col: F.Column) -> F.Column:
    """Canonical text form for near-exact dedup: lowercase, strip
    punctuation, collapse whitespace runs, trim. Pure Catalyst expressions
    (map-only, scan speed)."""
    t = F.lower(col)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def normalized_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Near-exact duplicate groups under text normalization — catches
    case/punctuation/whitespace variants exact_dedup misses. Same one-hash-
    aggregation shape as exact_dedup (map-side combine collapses dup-heavy
    corpora before the shuffle)."""
    return (
        docs.groupBy(F.md5(normalize_text(F.col(text_col))).alias("norm_md5"))
        .agg(F.min("doc_id").alias("representative"), F.count("*").alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    k: int = 5,
    max_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs by character-k-gram Jaccard similarity.

    ``max_df`` drops shingles appearing in more than max_df docs
    (stop-shingles) — mandatory at scale: a shingle shared by D docs
    contributes D^2 join rows, so the scale-safe cap is the DEFAULT and
    all-pairs behavior is explicit opt-out (``max_df=None``). Dropping a
    stop-shingle slightly lowers both intersection and union of affected
    pairs; near-dup recall at usual thresholds is unaffected (true near-dups
    share many informative shingles).
    """
    sh = shingles_df(docs, k=k)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count_distinct("doc_id").alias("df"))
        sh = sh.join(df_counts.where(F.col("df") <= max_df), "shingle", "left_semi")
    # materialize the filtered shingle relation once: it feeds BOTH self-join
    # sides and the per-doc size aggregate, and without this the explode +
    # stop-shingle semi-join re-executed three times inside one plan
    # (measured 9s -> ~4s at sf0.1)
    sh = sh.localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    out = (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("jaccard", F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4))
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "jaccard")


def minhash_signatures(docs: DataFrame, num_hashes: int = 16, k: int = 5) -> DataFrame:
    """(doc_id, i, minhash_i): min over shingles of hash64(i # shingle).

    Plan shape: ``num_hashes`` min-aggregate COLUMNS over the un-exploded
    shingle rows (ONE shuffle at shingle grain with map-side combine), then
    an unpivot at the tiny one-row-per-doc grain. The naive
    explode(sequence(0, H-1)) shape multiplies the shingle relation — the
    dominant relation at corpus scale — by H before the shuffle; this shape
    keeps shuffle bytes independent of num_hashes."""
    sh = shingles_df(docs, k=k)
    aggs = [
        F.min(hash64(F.concat(F.lit(f"{i}#"), F.col("shingle")))).alias(f"_mh{i}")
        for i in range(num_hashes)
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs)
    stack_args = ", ".join(f"{i}, _mh{i}" for i in range(num_hashes))
    return sigs.select(
        "doc_id", F.expr(f"stack({num_hashes}, {stack_args}) as (i, mh)")
    )


def minhash_lsh_candidates(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, k: int = 5
) -> DataFrame:
    """LSH candidate pairs: docs sharing >=1 band bucket.

    Band signature = order-weighted sum of the band's minhashes mod a prime
    (a deterministic combiner both engines compute identically; collisions
    only ever MERGE buckets, never split, so candidate recall is preserved).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, k)
    band_sig = sig.groupBy(
        "doc_id", (F.col("i") / rows).cast("int").alias("band")
    ).agg(
        F.sum((F.col("mh") % 1000000007) * (F.pmod(F.col("i"), F.lit(rows)) + 1)).alias("band_sig")
    )
    a = band_sig.alias("a")
    b = band_sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


def dup_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Near-duplicate CLUSTER formation: connected components over a
    near-dup pair relation -> (doc_id, cluster_id) with cluster_id = the
    smallest doc_id in the component (the canonical representative a dedup
    pipeline keeps).

    Formulation: iterative min-label propagation as DataFrame joins — each
    round every node takes min(own label, neighbors' labels); converged when
    no label changes. Near-dup components are TINY (duplicate families, not
    a web graph), so rounds ~ component diameter ~ 2-4; each round is one
    equi-join + one hash aggregate, label relation localCheckpoint'ed so
    lineage stays flat. At true graph scale the same loop upgrades to the
    large-star/small-star contraction (alternating min-joins with the same
    join shape); the driver-side convergence count is one scalar per round.
    """
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    # materialize the symmetric edge list ONCE: the pair relation is
    # typically the expensive LSH/banding candidate join, and without the
    # checkpoint every propagation round (and every convergence count)
    # re-executed that whole upstream pipeline — measured 87s -> ~8s for
    # the minhash-fed cluster query at sf0.1
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges.b == labels.doc)
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the previous label through the round so convergence is a
        # count over the checkpointed result — not a third join per round
        new = (
            labels.join(neigh, labels.doc == neigh.a, "left")
            .select(
                "doc",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
                F.col("label").alias("_old"),
            )
            .localCheckpoint()
        )
        changed = new.where(F.col("label") != F.col("_old")).count()
        labels = new.drop("_old")
        if changed == 0:
            break
    else:
        # a component with diameter > max_iters would silently return labels
        # that are not yet the component minimum — refuse instead of
        # diverging from the transitive-closure semantics
        raise RuntimeError(
            f"dup_clusters did not converge after {max_iters} rounds "
            f"({changed} labels still changing); raise max_iters (rounds "
            "scale with component diameter) or pre-contract the pair graph"
        )
    return labels.select(
        F.col("doc").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """SimHash fingerprint: per token-hash bit, majority vote over tokens
    (tie -> 0); fingerprint = sum of winning bits.

    Plan shape: token-grain rows aggregate ONCE with ``bits`` packed sum
    columns (vote_i = ±1 from bit i of the token hash) — no per-bit row
    explosion (a 32x data blowup in the naive shape) and a single shuffle
    with map-side combine."""
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("tok")
    ).select("doc_id", hash64(F.col("tok")).alias("h"))
    aggs = [
        F.sum(F.expr(f"(shiftright(h, {i}) & 1) * 2 - 1")).alias(f"_v{i}")
        for i in range(bits)
    ]
    votes = tok.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        # shiftleft keeps bit 63 in-range (1 << 63 as a Python int overflows
        # a signed-long literal), so bits=64 stays supported.
        fp = fp + F.when(
            F.col(f"_v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", fp.alias("simhash"))


# position cap shared with the DuckDB oracles (generate_series(1, 2000)) —
# the word-gram twin of functions.text.MAX_SHINGLE_POS: bounds per-doc
# fan-out (prefix sampling for very long docs) and keeps engine/oracle
# semantics identical by construction.
MAX_WORD_NGRAM_POS = 2000


def word_ngrams(docs: DataFrame, n: int = 13, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, gram) relation of space-joined word n-grams (distinct per doc).

    Pure Catalyst (split + transform over an index sequence) — the explode
    is the only row multiplier, same shape as the char-shingle relation."""
    toks = tokens(F.col(text_col))
    idx = F.sequence(
        F.lit(0), F.least(F.size(toks) - n, F.lit(MAX_WORD_NGRAM_POS - 1))
    )
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(F.col(id_col), F.explode(grams).alias("gram"))


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """Train-test contamination: documents sharing >= 1 word n-gram with a
    benchmark/eval document — the standard LM decontamination rule (13-gram
    overlap, as published for GPT-3/PaLM-style training pipelines).

    Returns (doc_id, n_shared_grams, n_bench_docs) for CONTAMINATED docs
    only. ``benchmark`` needs (bench_id, text).

    100 TB shape: the benchmark side is tiny (eval suites are MBs) —
    broadcast it, so the corpus-side gram relation streams through a
    broadcast hash join with no corpus shuffle; the per-doc count aggregate
    is the only shuffle, at contaminated-doc grain (rare).
    """
    dg = word_ngrams(docs, n=n, text_col=text_col)
    bg = word_ngrams(
        benchmark.select(F.col("bench_id").alias("doc_id"), text_col), n=n,
        text_col=text_col,
    ).select(F.col("doc_id").alias("bench_id"), "gram").distinct()
    hits = dg.join(F.broadcast(bg), "gram")
    return hits.groupBy("doc_id").agg(
        F.count_distinct("gram").alias("n_shared_grams"),
        F.count_distinct("bench_id").alias("n_bench_docs"),
    )


def duplicated_gram_fraction(
    docs: DataFrame,
    n: int = 13,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document fraction of word n-grams that also occur in other
    documents — the cross-document span-duplication signal behind exact
    substring dedup in LM training pipelines: a document whose grams are
    mostly shared is boilerplate or near-copied content even when no single
    pairwise near-dup match fires. Returns (doc_id, n_grams, n_dup_grams,
    dup_frac) for documents with at least one n-gram.

    100 TB shape: per-gram document frequency is ONE hash aggregate with
    map-side combine; the duplicated-gram set joins back as a LEFT SEMI join
    (no fan-out by df, hot boilerplate grams cost one probe per occurrence);
    the per-doc counts are keyed aggregations. No all-pairs joins anywhere.
    """
    grams = word_ngrams(docs, n=n, text_col=text_col, id_col=id_col)
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .select("gram")
    )
    tot = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    dup = (
        grams.join(dup_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_grams"))
    )
    n_dup = F.coalesce(F.col("n_dup_grams"), F.lit(0).cast("long"))
    return tot.join(dup, id_col, "left").select(
        id_col,
        "n_grams",
        n_dup.alias("n_dup_grams"),
        F.round(n_dup / F.col("n_grams"), 4).alias("dup_frac"),
    )


def deterministic_sample(
    docs: DataFrame,
    rate: float | None = None,
    key_col: str = "doc_id",
    strata_rates: dict | None = None,
    strata_col: str | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Reproducible hash sampling — the training-mixture primitive: keep a
    row iff pmod(hash64(salt # key), 1e6) < rate * 1e6.

    No RNG state, no seed plumbing: the SAME rows are kept on any cluster,
    any partitioning, any retry — which is what makes dataset mixtures
    reproducible and incremental (raising the rate strictly grows the
    sample). ``strata_rates`` + ``strata_col`` give per-stratum rates (e.g.
    per language / quality bucket); strata absent from the dict keep
    rate 0. Map-only filter — pushed to the scan, no shuffle."""
    h = F.pmod(hash64(F.concat(F.lit(f"{salt}#"), F.col(key_col).cast("string"))), F.lit(1_000_000))
    if strata_rates is not None:
        if strata_col is None:
            raise ValueError("strata_rates requires strata_col")
        keep = F.lit(False)
        for stratum, r in strata_rates.items():
            keep = keep | (
                (F.col(strata_col) == stratum) & (h < int(r * 1_000_000))
            )
    else:
        if rate is None:
            raise ValueError("pass rate= or strata_rates=")
        keep = h < int(rate * 1_000_000)
    return docs.where(keep)


def simhash_near_dups(
    docs: DataFrame,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-duplicate retrieval: (doc_a, doc_b, hamming) pairs with
    hamming(fp_a, fp_b) <= max_hamming.

    Banded multi-index (the classic simhash dedup structure, e.g. Manku et
    al. WWW'07): split the ``bits``-bit fingerprint into ``bands`` chunks of
    bits/bands bits. Any pair within hamming distance k < bands differs in at
    most k chunks, so by pigeonhole it shares >= 1 chunk verbatim — an
    equi-join on (band, chunk) finds EVERY such pair (exact recall, no
    all-pairs scan), and ``bit_count(xor)`` verifies candidates exactly.

    100 TB shape: the join key space per band is 2^(bits/bands) buckets —
    with bits=64, bands=4 that is 2^16 buckets/band, and expected bucket
    occupancy N/65536, so candidate volume stays near-linear until corpora
    where a wider fingerprint (or more bands + a second verify tier) is the
    upgrade. The fingerprint relation is one row per doc (tiny next to the
    token relation that produced it); the chunk explode is bands× that — not
    a corpus-scale blowup.
    """
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) for "
            "exact recall (pigeonhole guarantee)"
        )
    if bits % bands:
        raise ValueError(f"bits ({bits}) must divide evenly into {bands} bands")
    w = bits // bands
    mask = (1 << w) - 1 if w < 64 else -1
    fp = simhash(docs, bits=bits, text_col=text_col)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * w)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
