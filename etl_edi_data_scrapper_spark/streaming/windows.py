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
    ``total = sum(value)``; pass ``aggs`` to override (each must be
    aliased). Works identically on a batch DataFrame (windows just never
    close) — handy for A/B checks against the batch oracle.
    """
    win = (
        F.window(F.col(ts_col), window)
        if slide is None
        else F.window(F.col(ts_col), window, slide)
    )
    return _windowed(stream, win, ts_col, watermark, keys, aggs)


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
    win = F.session_window(F.col(ts_col), gap)
    return _windowed(stream, win, ts_col, watermark, keys, aggs)


def _windowed(
    stream: DataFrame,
    win: Column,
    ts_col: str,
    watermark: str,
    keys: Sequence[str],
    aggs: Sequence[Column] | None,
) -> DataFrame:
    if aggs is None:
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        ]
    grouped = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(*aggs)
    )
    # aggregate output names come from the RESULT schema, not from parsing
    # Column reprs (repr formats differ across classic/Connect); an
    # unaliased aggregate surfaces as its auto-generated expression name —
    # reject it so callers get a crisp error instead of a weird column
    agg_names = [c for c in grouped.columns if c != "win" and c not in keys]
    bad = [c for c in agg_names if "(" in c or " " in c]
    if bad:
        raise ValueError(f"aggregate columns must be aliased, got: {bad}")
    return grouped.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *[F.col(k) for k in keys],
        *[F.col(n) for n in agg_names],
    )
