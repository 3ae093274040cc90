"""Backward as-of join — the time-series operator Spark lacks natively.

For each left row, attach the LATEST right row with ``right_ts <= left_ts``
per key (optionally within a tolerance window). Implementation is the
union+window trick: tag both sides, union, one window sorted by
(key, ts, side) carrying the right side's values forward with
``last(..., ignorenulls)``. ONE shuffle on the key, no range explosion, no
per-row subqueries — linear at any scale (the suite's ``asof_join`` query
oracle-checks this shape against a correlated-subquery SQL formulation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    values: Sequence[str] = (),
    tolerance_us: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """All left columns + each of ``values`` (from the matched right row,
    null when no prior right row exists — or none within ``tolerance_us``).

    At equal timestamps the right row wins (``<=`` semantics). ``tiebreak``
    names a column present on BOTH sides to make ordering total when
    multiple rows share (key, ts) — required for deterministic results on
    data with timestamp collisions.
    """
    rv = F.struct(
        F.unix_micros(F.col(right_ts)).alias("__rts_us"),
        *[F.col(v) for v in values],
    )
    order = [F.col("__ts"), F.col("__src")] + (
        [F.col(tiebreak)] if tiebreak else []
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        *( [F.col(tiebreak)] if tiebreak and tiebreak not in (key,) else [] ),
        rv.alias("__rv"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
    )
    # align columns for the union: left carries all its columns; right only
    # needs key/order/value — pad with nulls
    for c in l.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    r = r.select(*l.columns)

    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = l.unionByName(r).withColumn(
        "__carried", F.last("__rv", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__src") == 1)
    carried = F.col("__carried")
    if tolerance_us is not None:
        fresh = carried["__rts_us"] >= F.unix_micros(F.col(left_ts)) - int(tolerance_us)
        carried = F.when(fresh, carried)
    keep = [c for c in left.columns]
    return out.select(
        *keep, *[carried[v].alias(v) for v in values]
    )
