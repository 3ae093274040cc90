"""Streaming exact-dedup: drop documents whose fingerprint was seen in ANY
earlier micro-batch (cross-batch state) — the streaming form of
`functions.dedup.exact_dedup`, built on ``applyInPandasWithState``.

Scale design: state is partitioned BY FINGERPRINT (the groupBy key), so
state lookup is a hash-partition-local probe — no broadcast set, no driver
state; the state store shards with the shuffle and spills via RocksDB when
configured. Per key the state is one boolean ("seen"), so state size is
O(distinct fingerprints) bytes, not O(rows).

Watermark note: with no eviction policy the state grows unbounded by
design (exact dedup must remember everything); a TTL variant would set
``GroupStateTimeout.ProcessingTimeTimeout`` and expire keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_edi_data_scrapper_spark.functions.text import normalize_text

OUTPUT_SCHEMA = "fingerprint string, doc_id long, text string"
STATE_SCHEMA = "seen boolean"


def _keep_first_unseen(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit the first row for a never-seen fingerprint; drop everything else.

    Within a batch the winner is the smallest doc_id (deterministic under
    shuffle); across batches the state bit wins.
    """
    if state.exists:
        return  # fingerprint already emitted in an earlier batch
    rows = pd.concat(list(batches), ignore_index=True)
    if rows.empty:
        return
    first = rows.sort_values("doc_id").iloc[:1]
    state.update((True,))
    yield first[["fingerprint", "doc_id", "text"]]


def streaming_exact_dedup(doc_stream: DataFrame) -> DataFrame:
    """doc_stream(doc_id, text) → first-occurrence rows only, across batches."""
    keyed = doc_stream.withColumn("fingerprint", F.md5(normalize_text("text")))
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _keep_first_unseen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _ttl_handle_rows(seen_state, rows) -> Iterator[pd.DataFrame]:
    """Per-fingerprint decision for the TTL dedup, split out so the
    sliding-window semantics are unit-testable without a live
    transformWithState runner (which needs protobuf + RocksDB):

    * first sighting → record the fingerprint, emit the smallest-doc_id row;
    * re-sighting → emit nothing BUT refresh the state ("unseen for ttl_ms"
      means ttl_ms since the LAST sighting, not since first admission —
      without the refresh a continuously-re-seen document would expire and
      be re-admitted mid-stream).
    """
    if seen_state.exists():
        seen_state.update((True,))  # reset the native TTL clock
        return
    first = None
    for pdf in rows:
        if pdf.empty:
            continue
        cand = pdf.sort_values("doc_id").iloc[:1]
        if first is None or cand["doc_id"].iloc[0] < first["doc_id"].iloc[0]:
            first = cand
    if first is None:
        return
    seen_state.update((True,))
    yield first[["fingerprint", "doc_id", "text"]]


def streaming_exact_dedup_ttl(doc_stream: DataFrame, ttl_ms: int = 86_400_000) -> DataFrame:
    """Bounded-retention exact dedup on Spark 4's `transformWithStateInPandas`
    (the successor to `applyInPandasWithState`): per-fingerprint ValueState
    with a NATIVE TTL — a fingerprint unseen for `ttl_ms` expires from the
    state store, so state size is O(distinct fingerprints within the TTL
    window) instead of O(all time). This is the "TTL variant" the unbounded
    dedup's docstring calls for: training-data firehoses rarely need
    forever-memory, and bounded state is what lets the RocksDB store hold a
    10⁹-key working set per shard.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``)
    — transformWithState is implemented only there; the HDFS-backed default
    raises. Also requires ``protobuf`` (Spark's transformWithState control
    channel is protobuf-encoded); probed here so the failure is a crisp
    ImportError at plan time instead of a crashed streaming runner at
    start. Same partitioning story as the unbounded form: state shards
    with the groupBy(fingerprint) shuffle, no driver state."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package "
            "(google.protobuf) — pip install protobuf, or use the "
            "unbounded streaming_exact_dedup (applyInPandasWithState)"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ttl = int(ttl_ms)

    class _SeenTtlProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", STATE_SCHEMA, ttlDurationMs=ttl)

        def handleInputRows(self, key, rows, timer_values):
            yield from _ttl_handle_rows(self._seen, rows)

        def close(self) -> None:
            pass

    keyed = doc_stream.withColumn("fingerprint", F.md5(normalize_text("text")))
    return keyed.groupBy("fingerprint").transformWithStateInPandas(
        _SeenTtlProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime",
    )
