"""Similarity search over embedding columns (array<float>).

Two paths, same operator surface:
  * ``cosine_topk`` — exact brute force: query×corpus join, windowed top-k.
    The baseline, and correct at any scale where #queries × corpus fits a
    shuffle (queries are broadcast — the corpus is never replicated).
  * ``lsh_topk`` — random-hyperplane LSH: bucket both sides on sign
    signatures, equi-join buckets, rerank exactly within candidates. The
    100 TB path: corpus pairs drop from N×Q to collisions only. Hyperplanes
    are derived deterministically from md5 arithmetic (reproducible across
    runs/engines, no RNG state to ship).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etl_edi_data_scrapper_spark.functions.dedup import dot_expr, norm_expr


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine per query (broadcast queries × corpus scan +
    partitioned window — ties broken by corpus id for determinism)."""
    qs = F.broadcast(
        queries.select(F.col(q_id), F.col(q_vec))
        .withColumn("__nq", norm_expr(F.col(q_vec)))
    )
    joined = (
        corpus.select(F.col(c_id), F.col(c_vec))
        .withColumn("__nc", norm_expr(F.col(c_vec)))  # once per corpus row
        .crossJoin(qs)
    )
    sim = (dot_expr(F.col(q_vec), F.col(c_vec)) / (F.col("__nq") * F.col("__nc"))).alias("cosine")
    w = W.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id))
    return (
        joined.select(q_id, c_id, sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(
    vec: Column, n_planes: int, dim: int, plane_offset: int = 0
) -> Column:
    """Sign signature under `n_planes` deterministic pseudo-random
    hyperplanes. Plane weights are md5-derived: w[p][d] = hexval(md5('p:d'))
    - 7.5 — fixed, engine-reproducible, no RNG.

    ``plane_offset`` shifts the plane index range (planes
    [offset, offset + n_planes)) so independent TABLES of the same width
    draw disjoint plane sets — the multi-table LSH recall lever used by
    `clustering.cross_shard_bridge_pairs`.

    Returns a string key '0|1|...' usable directly as an LSH bucket id.
    """
    import hashlib

    bits = []
    for p in range(plane_offset, plane_offset + n_planes):
        weights = [
            float(int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16)) - 7.5
            for d in range(dim)
        ]
        # array-literal zip_with keeps the expression tree small (one node
        # per plane, not per dimension — 64-term chained sums choke codegen)
        dot = F.aggregate(
            F.zip_with(vec, F.lit(weights), lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat_ws("", *bits)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: equi-join on hyperplane bucket, exact rerank inside.

    Recall < 1.0 by construction (bucket boundaries). ``multiprobe=True``
    additionally probes every one-bit-flipped bucket per query (n_planes+1
    probes): the QUERY side explodes (broadcast, tiny), the corpus stays in
    exactly one bucket — so candidate pairs stay unique and corpus cost is
    unchanged. Recall rises steeply; candidate volume grows ~(n_planes+1)/2^n
    of the corpus per query.
    """
    qb = queries.select(
        F.col(q_id),
        F.col(q_vec),
        hyperplane_signature(F.col(q_vec), n_planes, dim).alias("bucket"),
    ).withColumn("__nq", norm_expr(F.col(q_vec)))
    if multiprobe:
        variants = [F.col("bucket")] + [
            F.concat(
                F.substring("bucket", 1, p),
                F.when(F.substring("bucket", p + 1, 1) == "1", "0").otherwise("1"),
                F.substring("bucket", p + 2, n_planes - p - 1),
            )
            for p in range(n_planes)
        ]
        qb = qb.withColumn("bucket", F.explode(F.array(*variants)))
    qb = F.broadcast(qb)
    cb = corpus.select(
        F.col(c_id), F.col(c_vec), hyperplane_signature(F.col(c_vec), n_planes, dim).alias("bucket")
    ).withColumn("__nc", norm_expr(F.col(c_vec)))
    sim = (dot_expr(F.col(q_vec), F.col(c_vec)) / (F.col("__nq") * F.col("__nc"))).alias("cosine")
    w = W.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id))
    return (
        cb.join(qb, "bucket")
        .select(q_id, c_id, sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    train: str = "sample",
    kmeans_iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """IVF(-flat) index: pick centroids, assign every vector to its nearest.

    ``train="sample"``: deterministic corpus sample (lowest ids) — cheapest,
    plan-shape identical. ``train="kmeans"``: Lloyd's centroids
    (`functions/clustering.kmeans_fit`) — tighter cells, better recall at a
    given nprobe. Assignment is a broadcast cross join against the tiny
    centroid set + one windowed argmin — a single pass over the corpus.
    Returns (centroids(centroid_id, centroid_vec), corpus + centroid_id).
    """
    if train == "kmeans":
        from etl_edi_data_scrapper_spark.functions.clustering import kmeans_fit

        centers, _ = kmeans_fit(
            corpus, vec_col=c_vec, k=n_centroids, n_iters=kmeans_iters, id_col=c_id
        )
        centroids = corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
            f"centroid_id long, centroid_vec array<double>",
        )
    else:
        centroids = (
            corpus.orderBy(F.col(c_id)).limit(n_centroids)
            .select(
                F.col(c_id).alias("centroid_id"),
                F.col(c_vec).alias("centroid_vec"),
            )
        )
    cb = F.broadcast(centroids)
    scored = corpus.withColumn("__nv", norm_expr(F.col(c_vec))).crossJoin(
        cb.withColumn("__ncen", norm_expr(F.col("centroid_vec")))
    )
    sim = dot_expr(F.col(c_vec), F.col("centroid_vec")) / (F.col("__nv") * F.col("__ncen"))
    w = W.partitionBy(c_id).orderBy(F.col("__csim").desc(), F.col("centroid_id"))
    assigned = (
        scored.withColumn("__csim", sim)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(corpus[c_id], corpus[c_vec], "centroid_id")
    )
    return centroids, assigned


def ivf_topk(
    queries: DataFrame,
    centroids: DataFrame,
    assigned: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: route each query to its ``nprobe`` nearest
    centroids, exact-rerank ONLY inside those buckets. Cost per query drops
    from |corpus| to ~nprobe/n_centroids of it; recall rises with nprobe
    (nprobe = n_centroids ≡ brute force)."""
    cb = F.broadcast(centroids.withColumn("__ncen", norm_expr(F.col("centroid_vec"))))
    qn = queries.withColumn("__nq", norm_expr(F.col(q_vec)))
    qsim = dot_expr(F.col(q_vec), F.col("centroid_vec")) / (F.col("__nq") * F.col("__ncen"))
    wq = W.partitionBy(q_id).orderBy(F.col("__qsim").desc(), F.col("centroid_id"))
    routed = (
        qn.crossJoin(cb)
        .withColumn("__qsim", qsim)
        .withColumn("__rk", F.row_number().over(wq))
        .filter(F.col("__rk") <= nprobe)
        .select(q_id, q_vec, "__nq", "centroid_id")
    )
    cand = assigned.withColumn("__nc", norm_expr(F.col(c_vec))).join(
        F.broadcast(routed), "centroid_id"
    )
    sim = (dot_expr(F.col(q_vec), F.col(c_vec)) / (F.col("__nq") * F.col("__nc"))).alias("cosine")
    w = W.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id))
    return (
        cand.select(q_id, c_id, sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_vec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q[i] = clamp(round(x[i] /
    scale), -127, 127)`` with ``scale = max|x| / 127`` — the standard 4×
    storage/IO compression for embedding tables (float32 → int8) that an
    ANN corpus at 100 TB needs before anything else: scan time is
    IO-bound, and candidate generation (LSH/IVF routing) tolerates the
    ≤ scale/2 per-coordinate error easily; exact rerank can fetch the
    float originals for the top candidates only.

    Pure JVM array expressions (transform/greatest/round) — no Python, no
    shuffle; the quantized column is array<tinyint> (Spark's parquet
    writer stores it compactly) plus one float scale per vector.
    All-zero vectors get scale 0 and all-zero codes (dequantizes to the
    exact original).
    """
    absmax = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))),
    )
    scale = (absmax / F.lit(127.0)).alias(scale_col)
    q = F.when(
        F.col(scale_col) > 0,
        F.transform(
            F.col(vec_col),
            lambda v: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.round(v.cast("double") / F.col(scale_col))),
            ).cast("tinyint"),
        ),
    ).otherwise(F.transform(F.col(vec_col), lambda v: F.lit(0).cast("tinyint")))
    return df.withColumn(scale_col, scale).withColumn(out_col, q)


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of `quantize_embeddings`: ``x'[i] = q[i] * scale`` as
    array<float>. Per-coordinate reconstruction error ≤ scale/2 by
    construction (round-to-nearest)."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col), lambda v: (v.cast("double") * F.col(scale_col)).cast("float")
        ),
    )


def save_ivf_index(
    centroids: DataFrame,
    assigned: DataFrame,
    path: str,
) -> None:
    """Persist an :func:`ivf_index` for reuse across jobs — and lay the
    assignment out PARTITIONED BY ``centroid_id``, which is what makes a
    saved index more than a cache: at query time the candidate join
    routes to ``nprobe`` centroids, and Spark's partition pruning
    (static for literal probes, dynamic for the broadcast-join route in
    :func:`ivf_topk`) reads ONLY those cells' files. At 100 TB that is
    the difference between scanning the corpus per query batch and
    scanning nprobe/n_centroids of it — the on-disk analogue of what an
    IVF inverted list buys in memory."""
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/assigned"
    )


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(centroids, assigned) back from :func:`save_ivf_index` — drop-in
    arguments for :func:`ivf_topk`. The assignment scan carries the
    ``centroid_id`` partition column, so the routed candidate join
    prunes to the probed cells."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/assigned"),
    )
