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
