"""Grouped-map without per-group overhead.

``df.groupBy(k).applyInPandas(fn)`` pays a fixed cost (Arrow stream flush +
Python call + pandas construction) per GROUP. For the common training-data
shape — millions of small per-user / per-key groups — that fixed cost
dominates end-to-end runtime (measured 15x over the identical computation
batched: 4.0 s vs 0.26 s on 1 500-group events at sf0.1, identity function).

`grouped_map_in_pandas` keeps grouped-map semantics but pays the fixed cost
per Arrow BATCH (default 10k rows): hash-partition on the keys, sort within
partitions so groups are contiguous, then one `mapInPandas` pass that
carries the trailing (possibly split) group across batch boundaries and
hands the user function frames of WHOLE groups only. The user function is
free to vectorize across all groups in the frame (pandas ``groupby`` on a
frame of many groups beats one call per group by orders of magnitude).

Memory bound is max(batch size, largest single group) per worker — the same
largest-group bound `applyInPandas` has.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_map_in_pandas(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable,
    schema: str,
    order: Sequence[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Apply ``fn(pdf) -> pdf`` to frames of complete groups.

    ``fn`` receives rows sorted by ``keys + order``; every group (distinct
    ``keys`` tuple) in the frame is complete, but a frame holds MANY groups
    — the function must aggregate per group itself (e.g. ``pdf.groupby``),
    which is exactly what lets it vectorize across them.
    """
    keys = list(keys)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartition(n, *keys).sortWithinPartitions(*keys, *order)

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # the last group may continue in the next batch — hold it back
            last = pdf[keys].iloc[-1]
            tail = (pdf[keys] == last.values).all(axis=1).to_numpy()
            # groups are contiguous: the held-back rows are a suffix
            split = len(pdf) - int(tail.sum())
            carry = pdf.iloc[split:]
            if split:
                yield fn(pdf.iloc[:split].reset_index(drop=True))
        if carry is not None and len(carry):
            yield fn(carry.reset_index(drop=True))

    return part.mapInPandas(run, schema=schema)
