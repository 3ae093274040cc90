"""Streaming time-window aggregation with event-time watermarks.

The streaming upgrade of the batch `events_window` query: tumbling or
sliding event-time windows over an unbounded stream, with a watermark
bounding how late data may arrive. Windows FINALIZE (append-mode emit +
state eviction) once the watermark passes their end — the standard
Structured Streaming contract: state size is O(open windows × keys), not
O(stream history), and a row later than the watermark is dropped, never
silently double-counted.

Scale design: the aggregation is a plain ``groupBy(window(ts), key)`` —
partial (map-side) aggregation before the shuffle, state partitioned with
the shuffle (RocksDB-backed on a real cluster), no Python and no driver
state anywhere. The watermark delay is the ONLY memory knob: it directly
bounds open-window state, which is what keeps this runnable against a
100 TB/day event firehose.

The reference has no streaming aggregation at all (it publishes each row
as it is produced, `Aggregator.php:83-85`); this generalizes its hourly
replay cadence into true incremental event-time processing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_aggregate(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "5 minutes",
    window: str = "10 minutes",
    slide: str | None = None,
    keys: Sequence[str] = ("event_type",),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """stream → (win_start, win_end, *keys, n, total) windowed aggregates.

    ``slide=None`` gives tumbling windows; ``slide`` shorter than
    ``window`` gives overlapping sliding windows (each row contributes to
    window/slide windows — state grows by the same factor, so keep the
    ratio small). Default aggregates are row count ``n`` and
    ``total = sum(value)``; pass ``aggs`` to override. Works identically
    on a batch DataFrame (windows just never close) — handy for A/B
    checks against the batch oracle.
    """
    win = (
        F.window(F.col(ts_col), window)
        if slide is None
        else F.window(F.col(ts_col), window, slide)
    )
    if aggs is None:
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        ]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *[F.col(k) for k in keys],
            *[F.col(n) for n in _agg_names(aggs)],
        )
    )


def sessionized_aggregate(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "5 minutes",
    gap: str = "10 minutes",
    keys: Sequence[str] = ("user_id",),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """stream → (win_start, win_end, *keys, n, total) SESSION windows: a
    session extends while events arrive within ``gap`` of the previous
    one and closes after a quiet period — the streaming face of the batch
    `sessionize` query's native-session leg.

    Session state merges adjacent windows as events arrive (Spark's
    session_window aggregation handles the merge natively); a session
    finalizes and emits once the watermark passes its end + gap. State is
    O(open sessions × keys), bounded by the watermark — same memory
    contract as `windowed_aggregate`.
    """
    if aggs is None:
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        ]
    win = F.session_window(F.col(ts_col), gap)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *[F.col(k) for k in keys],
            *[F.col(n) for n in _agg_names(aggs)],
        )
    )


def _agg_names(aggs: Sequence[Column]) -> list[str]:
    """Output names of aliased aggregate columns (Spark puts the alias last
    in the column's string form: ``sum(value) AS total``)."""
    names = []
    for a in aggs:
        s = str(a)
        if s.startswith("Column<'") and s.endswith("'>"):
            s = s[len("Column<'") : -len("'>")]
        if " AS " not in s:
            raise ValueError(f"aggregate column must be aliased, got: {s}")
        names.append(s.rsplit(" AS ", 1)[1].strip("`"))
    return names
