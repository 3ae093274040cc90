"""Deterministic global shuffle into training shards.

Training consumes data in a random order that must be (a) uniform, (b)
reproducible across reruns, and (c) computable without a global sort. The
classic scale-out recipe is hash-shard + local sort: route each row to one
of ``shards`` output shards by a seeded hash, then order rows WITHIN each
shard by a second hash. Each shard is an independent uniform sample of the
corpus read in a pseudo-random order, so concatenating shards 0..N-1 is a
full deterministic permutation — with per-shard work only.

Scale design: ONE hash-partition shuffle (``shards``-way) and a per-shard
sort — there is no total order anywhere, so no single-reducer global sort
(the 100 TB scale-killer of naive ``ORDER BY rand()``). Shard assignment
and in-shard position derive from md5(id, seed), never from physical
layout: rerun-, repartition-, and growth-stable, unlike zipWithIndex or
``rand()``-based shuffles. All expressions are engine-portable (md5 +
substring arithmetic), so the permutation is oracle-checkable bit-for-bit.

The reference has no analog (it never reorders rows); this is part of the
engine's training-data surface alongside packing/mixture/dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark.functions.hashing import hex_word


def shuffle_to_shards(
    df: DataFrame,
    shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, shard_pos, shuffle_key) — a deterministic permutation.

    ``shuffle_key = md5(seed || ':' || id)`` (lowercase hex — ASCII string
    order is identical across engines); ``shard`` is the first 8 hex chars
    mod ``shards``; ``shard_pos`` is the 1-based rank of the row within its
    shard ordered by (shuffle_key, id) — the tiebreak on ``id`` makes the
    permutation total even under md5 collisions. A different ``seed``
    yields an independent permutation (fresh data order per epoch).
    """
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    key = F.md5(F.concat_ws(":", F.lit(int(seed)), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.select(
            F.col(id_col),
            key.alias("shuffle_key"),
            F.pmod(hex_word(key, 1), F.lit(shards)).cast("long").alias("shard"),
        )
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
    )
