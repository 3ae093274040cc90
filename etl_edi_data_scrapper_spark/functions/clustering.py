"""K-means (Lloyd's) over an embedding column — the iterative-algorithm
pattern on DataFrames, and the production replacement for `ivf_index`'s
sampled centroids (`similarity.py` keeps the same two-frame contract).

Spark-first iteration shape:
  * centroids live on the DRIVER between iterations (k × dim floats — tiny);
    each assignment pass embeds them as literals, so assigning is a single
    NARROW projection (argmin over k squared distances, whole-stage
    codegen'd) — no crossJoin, no shuffle, no UDF.
  * the update step is one shuffle per iteration: posexplode the vector and
    average per (cluster, dimension) — shuffle rows = n·dim scalar partials
    with map-side combine, never a collect of member vectors.
  * k iterations = k chained jobs; the DataFrame lineage resets each
    iteration because centroids round-trip through the driver — no
    exponentially growing plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sqdist(vec: Column, centroid: list[float]) -> Column:
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """df + `cluster` column = argmin squared distance (ties → lowest id)."""
    scored = F.array(
        *[
            F.struct(_sqdist(F.col(vec_col), c).alias("d"), F.lit(i).alias("c"))
            for i, c in enumerate(centroids)
        ]
    )
    return df.withColumn("cluster", F.array_sort(scored)[0]["c"])


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    n_iters: int = 5,
    id_col: str = "vec_id",
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's algorithm; returns (centroids, df + cluster assignment).

    Init is deterministic AND spread: the k vectors whose md5(id) sorts
    lowest — i.e. a deterministic uniform sample (k lowest ids would often
    all fall in one region — classic bad-init collapse). Runs as
    TakeOrderedAndProject (per-partition heaps), no global sort, stable
    across runs/partitionings. Empty clusters keep their previous centroid.
    """
    # the iteration re-reads df n_iters+2 times (init, updates, final
    # assignment) — cache the projected columns once; Spark spills cached
    # partitions at scale, and only (id, vec) is held, not the full row
    work = df.select(F.col(id_col), F.col(vec_col)).persist()
    init = (
        work.orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids = [list(map(float, r[0])) for r in init]
    for _ in range(n_iters):
        assigned = assign_clusters(work, vec_col, centroids)
        # exact mean: DECIMAL partial sums are associative/order-independent
        # (a float avg would differ run-to-run with partitioning — and
        # against any external replica), final cast + divide in double
        rows = (
            assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("double").cast("decimal(28,10)"))
                    .cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .collect()
        )
        new = {c: dict() for c in range(k)}
        for r in rows:
            new[r.cluster][r.pos] = r.m
        centroids = [
            [new[c][p] for p in sorted(new[c])] if new[c] else centroids[c]
            for c in range(k)
        ]
    work.unpersist()
    return centroids, assign_clusters(df, vec_col, centroids)


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iters: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): cluster-then-dedup over embeddings —
    k-means partitions the space, then near-duplicate pairs are searched
    only WITHIN each cluster, so the pair count is Σ cluster² instead of
    N² (the same blocked-pairs discipline as `dedup.embedding_near_pairs`,
    with the blocks LEARNED from the data instead of taken from a label).
    A vector is dropped when a lower-id vector in its cluster sits within
    ``threshold`` cosine — one representative per semantic duplicate set.

    Scale: k-means cost is n_iters narrow argmin passes (centroids are
    bounded driver state, k×dim); the within-cluster self-join is the
    only quadratic term and k is the knob that caps it (SemDeDup's paper
    setting uses k in the tens of thousands at web scale precisely so
    clusters stay self-joinable). Deterministic end-to-end: md5-ordered
    init + exact DECIMAL means + sequential-fold cosine.

    Returns (id, cluster, n_dupped_by, keep).
    """
    from etl_edi_data_scrapper_spark.functions.dedup import embedding_near_pairs

    _, assigned = kmeans_fit(df, vec_col=vec_col, k=k, n_iters=n_iters, id_col=id_col)
    blocked = assigned.select(
        F.col(id_col), F.col(vec_col), F.col("cluster").cast("long").alias("cluster")
    )
    # the assignment (k argmin distance folds over the corpus) feeds both
    # the self-join and the final verdict join — cut the recompute and the
    # lineage in one move (same discipline as winnowing_shared_pairs)
    blocked = blocked.localCheckpoint(eager=False)
    pairs = embedding_near_pairs(
        blocked,
        id_col=id_col,
        vec_col=vec_col,
        block_col="cluster",
        threshold=threshold,
    )
    cnt = pairs.groupBy("b").agg(F.count(F.lit(1)).alias("_n"))
    return (
        blocked.select(id_col, "cluster")
        .join(cnt, F.col(id_col) == F.col("b"), "left")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_dupped_by"),
            (F.coalesce("_n", F.lit(0)) == 0).alias("keep"),
        )
    )
