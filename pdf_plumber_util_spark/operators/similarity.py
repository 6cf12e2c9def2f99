"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the correctness baseline; the scale path
buckets vectors by SimHash-style random hyperplanes (deterministic seeded
projections) so candidate generation is a bucket join instead of a full
cross product. Dot products run JVM-side via zip_with + aggregate
(sequential fold -> bit-identical to the DuckDB list_dot_product oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def with_norm(emb: DataFrame, col: str = "embedding") -> DataFrame:
    v = F.transform(F.col(col), lambda x: x.cast("double"))
    return emb.withColumn("_v", v).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: for each query vec_id, the k nearest other
    vectors. Deterministic tie-break (sim desc, vec_id asc)."""
    base = with_norm(emb)
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"),
    )
    cand = base.select("vec_id", "_v", "_norm")
    # queries are a tiny set -> broadcast, no shuffle of the big side
    joined = cand.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    sim = joined.select(
        "query_id",
        "vec_id",
        (_dot(F.col("_qv"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine")
    )


def plane_sign(p: int, d: int) -> float:
    """The shared hyperplane-component formula: plane p's component for
    dimension d is +1.0 when the first hex nibble of md5("plane:p:d") is
    even, else -1.0. Pure function of (p, d): no driver randomness,
    cluster-size invariant, and md5 (unlike round-3's xxhash64) is
    computable by the DuckDB oracle — which is what lets s2 carry a
    direct value oracle instead of a rows-only check."""
    import hashlib

    nib = int(hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()[0], 16)
    return 1.0 if nib % 2 == 0 else -1.0


def _plane_bit(p: int, n_dims: int | None):
    """'1'/'0' Column for sign(v . plane_p) over the ``_v`` column.

    Two physical paths, identical values (pinned by pytest):
      * n_dims given (the production path): the whole plane matrix is
        precomputed driver-side (n_planes * n_dims tiny floats) and rides
        the plan as array literals — the per-row work is pure dot
        products, ZERO hashing. n_dims must equal the embedding length
        (a mismatch yields NULL buckets, not silent truncation).
      * n_dims=None: the sign is derived in-plan per element with the
        same md5 formula — dimension-agnostic, for inputs of unknown or
        mixed width.
    """
    if n_dims is not None:
        plane = F.array(*[F.lit(plane_sign(p, d)) for d in range(n_dims)])
        comp = F.zip_with(F.col("_v"), plane, lambda x, s: x * s)
    else:
        dims = F.sequence(F.lit(0), F.size("_v") - 1)
        comp = F.zip_with(
            F.col("_v"),
            dims,
            lambda x, d: x
            * F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.lit("plane"), F.lit(str(p)),
                                d.cast("string"),
                            )
                        ),
                        1, 1,
                    ),
                    16, 10,
                ).cast("int")
                % 2
                == 0,
                1.0,
            ).otherwise(-1.0),
        )
    s = F.aggregate(comp, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))


def hyperplane_buckets(emb: DataFrame, n_planes: int = 8,
                       n_dims: int | None = None) -> DataFrame:
    """LSH bucketing by deterministic pseudo-random hyperplanes
    (plane_sign above). Bucket = bit string of sign(v . plane_p);
    see _plane_bit for the two physical paths."""
    base = with_norm(emb)
    # n_planes=0 -> one global bucket: the bucketed search degenerates to
    # exhaustive and must equal cosine_topk exactly (the value pin used by
    # the s2b oracle, mirroring the s3 nprobe==n_cells trick)
    bucket = (
        F.concat(*[_plane_bit(p, n_dims) for p in range(n_planes)])
        if n_planes
        else F.lit("")
    )
    return base.select("vec_id", bucket.alias("bucket"), "_v", "_norm")


def hyperplane_buckets_tables(emb: DataFrame, n_planes: int = 6,
                              n_tables: int = 8,
                              n_dims: int | None = None) -> DataFrame:
    """Multi-table (OR-amplified) hyperplane LSH: table t's bucket is the
    sign bits of planes t*n_planes .. (t+1)*n_planes - 1 (same plane_sign
    formula as hyperplane_buckets, just a wider plane range). A vector
    lands in ``n_tables`` buckets; a candidate pair needs to agree in ANY
    table — the standard recall amplifier: one n-bit table catches a
    near neighbor with prob p^n, L tables with 1-(1-p^n)^L.

    Output: (vec_id, table_idx, bucket, _v, _norm) — one row per table.
    Scale shape: all n_tables * n_planes sign bits come from ONE map-side
    projection (the explode emits n_tables small struct copies per row,
    no recompute); downstream joins are (table_idx, bucket) equi-joins.
    """
    if n_tables < 1:
        raise ValueError("n_tables must be >= 1")
    base = with_norm(emb)
    tables = F.array(*[
        F.struct(
            F.lit(t).cast("long").alias("table_idx"),
            (
                F.concat(*[
                    _plane_bit(p, n_dims)
                    for p in range(t * n_planes, (t + 1) * n_planes)
                ])
                if n_planes
                else F.lit("")
            ).alias("bucket"),
        )
        for t in range(n_tables)
    ])
    return base.select(
        "vec_id", F.explode(tables).alias("_tb"), "_v", "_norm"
    ).select(
        "vec_id", F.col("_tb.table_idx").alias("table_idx"),
        F.col("_tb.bucket").alias("bucket"), "_v", "_norm",
    )


def bucketed_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                  n_planes: int = 6, n_dims: int | None = None,
                  n_tables: int = 1) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket(s).
    At 100 TB this turns O(N*Q) into a co-partitioned bucket join.
    ``n_tables > 1`` unions candidates across OR-amplified hash tables
    (hyperplane_buckets_tables) — higher recall, n_tables-proportional
    candidate cost; recall is pinned by the s5_ann_recall contract query
    so tuning can't silently degrade it."""
    if n_tables > 1:
        bt = hyperplane_buckets_tables(emb, n_planes, n_tables, n_dims=n_dims)
        qt = bt.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("query_id"),
            "table_idx", "bucket",
            F.col("_v").alias("_qv"),
            F.col("_norm").alias("_qnorm"),
        )
        joined = (
            bt.join(F.broadcast(qt), ["table_idx", "bucket"])
            .filter(F.col("vec_id") != F.col("query_id"))
            # a pair agreeing in several tables is still ONE candidate;
            # every surviving row carries identical vectors, so the kept
            # row is value-irrelevant
            .dropDuplicates(["query_id", "vec_id"])
        )
    else:
        b = hyperplane_buckets(emb, n_planes, n_dims=n_dims)
        q = b.filter(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("query_id"),
            F.col("bucket"),
            F.col("_v").alias("_qv"),
            F.col("_norm").alias("_qnorm"),
        )
        joined = b.join(F.broadcast(q), "bucket").filter(
            F.col("vec_id") != F.col("query_id")
        )
    sim = joined.select(
        "query_id",
        "vec_id",
        (_dot(F.col("_qv"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine")
    )


def ivf_centroids(emb: DataFrame, n_cells: int = 16, n_iter: int = 1) -> DataFrame:
    """IVF coarse quantizer, deterministic and cluster-size invariant.

    Seeding: the n_cells vectors with the smallest xxhash64(vec_id) act as
    initial centroids (a pseudo-random sample needing no driver RNG), then
    ``n_iter`` Lloyd refinements: assign every vector to its argmax-cosine
    centroid and recompute centroids as element-wise member means
    (posexplode -> groupBy(cell, dim) -> avg -> re-assemble). Each
    refinement is one broadcast join + one dimension-level aggregation —
    no iteration-count blowup, no .collect() of vectors.

    Returns (cell, _cv, _cnorm): centroid id, vector, norm.
    """
    base = with_norm(emb).select("vec_id", "_v", "_norm")
    seeds = base.withColumn(
        "_h", F.xxhash64(F.col("vec_id").cast("string"))
    ).orderBy("_h").limit(n_cells)
    # tiny (n_cells rows): a global row_number here is fine
    cents = seeds.withColumn(
        "cell", F.row_number().over(Window.orderBy("_h")) - 1
    ).select("cell", F.col("_v").alias("_cv"), F.col("_norm").alias("_cnorm"))

    for _ in range(n_iter):
        assigned = ivf_assign(base, cents)
        dim = assigned.select(
            "cell", F.posexplode("_v").alias("dim", "val")
        ).groupBy("cell", "dim").agg(F.avg("val").alias("mean"))
        cents = (
            dim.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mean"))),
                    lambda s: s["mean"],
                ).alias("_cv")
            )
            .withColumn("_cnorm", F.sqrt(_dot(F.col("_cv"), F.col("_cv"))))
        )
    return cents


def ivf_assign(vectors: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign every (vec_id, _v, _norm) row to its argmax-cosine centroid
    cell (ties -> lowest cell id). Centroids are broadcast; the big side
    never shuffles."""
    joined = vectors.join(F.broadcast(cents))
    scored = joined.select(
        "vec_id", "_v", "_norm", "cell",
        (_dot(F.col("_v"), F.col("_cv")) / (F.col("_norm") * F.col("_cnorm"))).alias("_sim"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("cell", "_v", "_norm"),
                F.struct(F.col("_sim"), -F.col("cell")),
            ).alias("_best")
        )
        .select("vec_id", F.col("_best.cell").alias("cell"),
                F.col("_best._v").alias("_v"), F.col("_best._norm").alias("_norm"))
    )


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
             n_cells: int = 16, nprobe: int = 4, n_iter: int = 1) -> DataFrame:
    """IVF-flat ANN: restrict each query's candidates to its ``nprobe``
    nearest centroid cells, then exact cosine + top-k inside them.

    At 100 TB the inverted lists are the partitioning: candidates come
    from an equi-join on ``cell`` against a broadcast (query, cell) probe
    table — O(N * nprobe / n_cells) dot products instead of O(N * Q).
    With ``nprobe == n_cells`` the search is exhaustive and equals
    cosine_topk exactly (pinned by test + the s3 oracle query).
    """
    base = with_norm(emb).select("vec_id", "_v", "_norm")
    cents = ivf_centroids(emb, n_cells, n_iter)
    inv = ivf_assign(base, cents)  # inverted lists: vec_id -> cell

    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"),
    )
    qcells = q.join(F.broadcast(cents)).select(
        "query_id", "_qv", "_qnorm", "cell",
        (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qnorm") * F.col("_cnorm"))).alias("_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    probes = qcells.withColumn("_r", F.row_number().over(wq)).filter(
        F.col("_r") <= nprobe
    ).select("query_id", "_qv", "_qnorm", "cell")

    cand = inv.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = cand.select(
        "query_id", "vec_id",
        (_dot(F.col("_qv"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "cosine")
    )


def embedding_neardup(emb: DataFrame, threshold: float = 0.9,
                      max_vec_id: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b) with a < b and
    cosine(a, b) >= threshold.

    Correctness baseline is the exact all-pairs product over a bounded id
    range (the oracle-checkable path). The 100 TB path replaces the
    self-join with `hyperplane_buckets` candidate generation (same exact
    cosine verify afterwards) — see `embedding_neardup_lsh`.
    """
    base = with_norm(emb)
    if max_vec_id is not None:
        base = base.filter(F.col("vec_id") < max_vec_id)
    a = base.select(F.col("vec_id").alias("vec_a"), F.col("_v").alias("_va"),
                    F.col("_norm").alias("_na"))
    b = base.select(F.col("vec_id").alias("vec_b"), F.col("_v").alias("_vb"),
                    F.col("_norm").alias("_nb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    sim = pairs.select(
        "vec_a", "vec_b",
        (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias("cosine"),
    )
    return sim.filter(F.col("cosine") >= threshold)


def embedding_neardup_lsh(emb: DataFrame, threshold: float = 0.9,
                          n_planes: int = 6, n_tables: int = 1,
                          n_dims: int | None = None) -> DataFrame:
    """Scale path for embedding-cosine near-dup: candidates only within
    an LSH bucket (co-partitioned equi-join on bucket — no cross
    product), then exact cosine verify. ``n_tables > 1`` ORs candidates
    across amplified hash tables (hyperplane_buckets_tables): a pair
    agreeing in ANY table is a candidate — recall 1-(1-p^n_planes)^
    n_tables, deduplicated to ONE candidate on (vec_a, vec_b) before the
    map-side cosine verify, so the verify cost never multiplies by
    n_tables. Since round 4 the md5-parity plane_sign makes the whole
    path value-oracle-able in DuckDB (d14)."""
    if n_tables > 1:
        b = hyperplane_buckets_tables(emb, n_planes, n_tables, n_dims=n_dims)
        keys = ["table_idx", "bucket"]
    else:
        b = hyperplane_buckets(emb, n_planes, n_dims=n_dims)
        keys = ["bucket"]
    l = b.select(*keys, F.col("vec_id").alias("vec_a"),
                 F.col("_v").alias("_va"), F.col("_norm").alias("_na"))
    r = b.select(*keys, F.col("vec_id").alias("vec_b"),
                 F.col("_v").alias("_vb"), F.col("_norm").alias("_nb"))
    pairs = l.join(r, keys).filter(F.col("vec_a") < F.col("vec_b"))
    if n_tables > 1:
        # all rows of a pair carry identical vectors: the kept row is
        # value-free
        pairs = pairs.dropDuplicates(["vec_a", "vec_b"])
    sim = pairs.select(
        "vec_a", "vec_b",
        (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias("cosine"),
    )
    return sim.filter(F.col("cosine") >= threshold)


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              round_dp: int = 4) -> DataFrame:
    """BM25 lexical top-k (Robertson/Sparck Jones; the classic keyword
    retrieval twin of the cosine/ANN family): score every doc against a
    fixed term list with corpus-trained statistics and return the k
    best.

      idf(t)   = ln((N - df_t + 0.5)/(df_t + 0.5) + 1)   [BM25+, >= 0]
      score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Determinism: terms contribute in SORTED order as one explicit
    expression chain (the DuckDB oracle sums the same chain), scores are
    rounded, and the top-k orders by (score DESC, doc_id) on the rounded
    value — so the returned SET is engine-stable even with ties at the
    cutoff.

    Shape at scale: per-term tf is a map-side array filter over the
    token split (no explode, no per-term join); N/avgdl/df_t is ONE
    tiny aggregate row broadcast back; the top-k is TakeOrdered (per-
    partition heaps, never a global sort). For ad-hoc user queries an
    inverted index would win, but for the pipeline use (fixed audit
    probes over a corpus pass) one scan is the right plan.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    ts = sorted(set(t.lower() for t in terms))
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                                r"\s+", " ")),
        " ",
    )
    dl = F.size(toks).cast("long")
    # NB: the term must be captured via a closure factory, not a default
    # arg — pyspark reads a 2-parameter lambda as the (element, index)
    # form and would bind the term name to the BIGINT index
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    tf_cols = {t: F.size(F.filter(toks, _eq(t))).cast("long") for t in ts}
    base = docs.select(
        "doc_id", dl.alias("_dl"),
        *[tf_cols[t].alias(f"_tf_{i}") for i, t in enumerate(ts)],
    )
    stats = base.agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_dl").alias("_sum_dl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(ts))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n")
    score = F.lit(0.0)
    for i in range(len(ts)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df_{i}") + 0.5)
            / (F.col(f"_df_{i}") + 0.5)
            + 1.0
        )
        tf = F.col(f"_tf_{i}").cast("double")
        score = score + idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("_dl") / avgdl)
        )
    out = scored.select(
        "doc_id", F.col("_dl").alias("doc_len"),
        F.round(score, round_dp).alias("score"),
    )
    return out.orderBy(F.desc("score"), "doc_id").limit(k)


def semdedup(emb: DataFrame, eps: float = 0.9, n_planes: int = 6,
             n_tables: int = 8, n_dims: int | None = None,
             max_cc_iter: int = 15) -> DataFrame:
    """SemDeDup-style embedding-level semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540 — public method): partition the embedding space,
    find within-partition pairs with cosine >= ``eps``, and keep ONE
    survivor per connected near-dup group.

    Two deliberate departures from the paper, both for determinism:
    the space partitioner is the multi-table md5-parity hyperplane LSH
    (``hyperplane_buckets_tables``) instead of k-means — same role
    (restrict the pair search), but bit-reproducible and replayable by
    the DuckDB oracle, and OR-amplified so a near-dup pair split by one
    partitioning is caught by another (k-means SemDeDup misses pairs
    that straddle a cluster boundary); the survivor is the component's
    MINIMUM vec_id via connected_components (O(log n) edge-table
    rounds) rather than the farthest-from-centroid choice, which has no
    stable definition without the centroids.

    Returns every vec_id with (canonical_id, is_duplicate) — the same
    contract as near_dup_pipeline, so downstream keep/drop wiring is
    shared.

    Shape at scale: pair generation is the d14 bucketed equi-join (no
    cross product, pair-deduped before the cosine verify), CC shuffles
    only the near-dup EDGE table, and the final label join-back is
    vec_id-keyed. Vectors never shuffle after the map-side bucket
    projection.
    """
    from .dedup import connected_components

    pairs = embedding_neardup_lsh(
        emb, threshold=eps, n_planes=n_planes, n_tables=n_tables,
        n_dims=n_dims,
    )
    comp = connected_components(
        pairs.select("vec_a", "vec_b"), max_iter=max_cc_iter,
        a_col="vec_a", b_col="vec_b",
    )
    labels = (
        emb.select("vec_id")
        .join(
            comp.select(
                F.col("node").alias("vec_id"),
                F.col("component").alias("_c"),
            ),
            "vec_id",
            "left",
        )
        .select("vec_id", F.coalesce("_c", "vec_id").alias("canonical_id"))
    )
    return labels.select(
        "vec_id", "canonical_id",
        (F.col("canonical_id") < F.col("vec_id")).alias("is_duplicate"),
    )
