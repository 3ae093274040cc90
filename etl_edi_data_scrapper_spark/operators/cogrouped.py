"""Cogrouped-map: two-sided custom per-key logic in one pass.

``cogroup_apply`` wraps ``df1.groupBy(k).cogroup(df2.groupBy(k))
.applyInPandas(fn, schema)`` — the Spark surface for logic that needs BOTH
sides of a key at once and that joins can't express cleanly (two-stream
reconciliation, per-key merge-asof, custom conflation). Each side shuffles
once on the key; the Arrow transfer hands ``fn(key, left_pdf, right_pdf)``
complete per-key frames.

Scale notes:
  * both sides shuffle on the SAME key → co-partitioned; no broadcast, no
    replication. Cost is one exchange per side, same as a join.
  * memory bound = largest single key's rows on either side (identical to
    applyInPandas); hot keys want pre-aggregation or salting upstream.
  * fixed Arrow/Python overhead is per KEY here (unlike
    `grouped_map_in_pandas`'s per-batch amortization) — cogroup is for
    moderately-sized keyed work, not millions of tiny groups.

The reference has no analog (single-threaded row loops); this is part of
the engine's Spark-native surface for training-data pipelines.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    fn: Callable,
    schema: str,
) -> DataFrame:
    """``fn(key_tuple, left_pdf, right_pdf) -> pdf`` per distinct key.

    Keys present on only one side still invoke ``fn`` (the other frame is
    empty) — full-outer semantics, unlike an inner join."""
    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(fn, schema)
    )
