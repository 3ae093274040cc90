"""Stream-stream interval join with watermark-bounded state.

Joining two live streams (views ↔ purchases, request ↔ response, order ↔
shipment) requires buffering both sides: a row must wait for its match,
which may not have arrived yet. Unbounded buffering is the failure mode —
the watermark + time-range condition is what lets Spark EVICT state: a
buffered row can be dropped once the other side's watermark guarantees no
future match can fall inside the interval.

Scale design: state per side is O(rows inside the interval window × keys),
bounded by ``watermark`` + the interval width — the two knobs. The join
itself is a keyed shuffle (state store partitioned with it, RocksDB at
scale); the time-range predicate is part of the join condition, so Spark's
state cleanup reasons about it natively — this is NOT an after-the-fact
filter. Outer matches (``how='left_outer'``) emit their null row exactly
when the watermark proves no match can still arrive, never earlier.

The reference has nothing comparable (single-threaded batch); this is the
streaming upgrade of the batch `range_join`/`asof_join` operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """left ⋈ right on ``key`` with ``right_ts`` ∈ [left_ts + lower,
    left_ts + upper].

    Right-side columns that clash with left-side names (other than the
    join key, which appears once) come back suffixed ``_r`` — including
    ``right_ts`` when both sides call it ``ts``. Works identically on
    batch DataFrames (no watermark applied) for A/B checks.
    """
    taken = set(left.columns) | set(right.columns)
    renames = {}
    for c in right.columns:
        if c in left.columns and c != key:
            new = f"{c}_r"
            while new in taken:  # right may already have a '<col>_r' column
                new += "_r"
            taken.add(new)
            renames[c] = new
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r_ts = renames.get(right_ts, right_ts)

    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(r_ts, watermark)

    lhs, rhs = left.alias("l"), r.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{r_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{r_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    joined = lhs.join(rhs, cond, how)
    return joined.drop(F.col(f"r.{key}"))
