"""Leakage-safe train/test splitting for training corpora.

The naive hash split (`md5(doc_id) % 100 < 90`, the `split` leg of the
`stratified_sample` query) assigns each DOCUMENT independently — so two
near-duplicate documents routinely land on opposite sides of the split,
and the model is evaluated on paraphrases of its own training data
(test-set leakage; the reason dedup-before-split is a standard step in
LLM corpus pipelines).

`cluster_aware_split` closes that hole: the split bucket is derived from
the near-dup CLUSTER's canonical id, not the document's own id, so every
member of a cluster — the canonical AND all its near-duplicates — lands
in the same split by construction. Documents outside any cluster hash on
their own id (their cluster is the singleton {doc}).

Scale shape (100 TB): one left join of the corpus against the cluster
assignment (clusters are the MINORITY of docs — the join's build side is
small relative to the corpus and AQE can broadcast it when it fits), then
a narrow md5 projection. Determinism: the bucket depends only on
(seed, canonical id) — never on partitioning, arrival order, or corpus
growth (a new document never migrates an old one's split, and a document
JOINING an existing cluster adopts that cluster's split instead of
re-rolling it).

Reference parity note: the reference has no train/test tooling; this is
part of the training-data-pipeline layer (brief §"beyond the reference"),
composing `functions/dedup.connected_components` output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark.functions.hashing import hex_word


def split_bucket(canon: Column, seed: int = 0) -> Column:
    """Deterministic bucket in [0, 100) from a cluster-canonical id:
    first 8 hex chars of md5('{seed}:{canon}') as an integer, mod 100 —
    the same formula on the DuckDB oracle side."""
    key = F.concat(F.lit(f"{seed}:"), canon.cast("string"))
    return hex_word(F.md5(key), 1) % 100


def cluster_aware_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    train_pct: int = 90,
    seed: int = 0,
) -> DataFrame:
    """Assign 'train'/'test' per document such that no near-dup cluster
    straddles the split.

    ``clusters`` is ``connected_components`` output (``id_col``,
    ``cluster_col``, ...) — it need only cover documents that belong to a
    multi-document cluster; absent ids are treated as singletons.

    Returns ``docs``'s ``id_col`` plus ``cluster_id`` (coalesced to the
    doc's own id for singletons), ``split``, and ``is_canonical``.
    """
    assignment = clusters.select(
        F.col(id_col),
        F.col(cluster_col).alias("__cluster"),
    )
    joined = docs.select(id_col).join(assignment, id_col, "left")
    canon = F.coalesce(F.col("__cluster"), F.col(id_col))
    bucket = split_bucket(canon, seed=seed)
    return joined.select(
        F.col(id_col),
        canon.alias(cluster_col),
        F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("test")).alias("split"),
        (canon == F.col(id_col)).alias("is_canonical"),
    )
