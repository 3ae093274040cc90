"""Document chunking: split each document into overlapping fixed-width
word windows — the retrieval/RAG indexing step (embed each chunk, not the
whole document) and the long-document slicing step of a training pipeline
(documents longer than the context window become several training rows).

Scale design: pure projection + bounded explode — ZERO shuffles. The
explode factor is ceil(n_tokens / stride) per document, bounded by the
longest document, so output size is a fixed multiple of input size; chunk
identity (``doc_id``, ``chunk_idx``) is derived from data, never physical
order, so the result is repartition/rerun-stable. All expressions are JVM
built-ins (``split``/``sequence``/``posexplode``/``slice``) — no Python in
the hot path, and the whole plan stays inside one WholeStageCodegen span
up to the generate.

The reference has no analog (its rows are already atomic price records);
this is part of the engine's training-data surface (SURVEY.md §2 extras)
alongside dedup/packing/mixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_by_words(
    df: DataFrame,
    width: int = 16,
    stride: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, start_tok, chunk_tokens, chunk_hash) per chunk.

    Chunks start every ``stride`` tokens (0, stride, 2·stride, … < n) and
    span up to ``width`` tokens, so consecutive chunks overlap by
    ``width - stride`` tokens (the standard RAG sliding window). The final
    chunk of a document may be shorter than ``width`` (clipped, never
    padded). ``chunk_hash`` is the md5 of the space-joined chunk text —
    the stable chunk fingerprint downstream dedup/embedding caches key on
    — computed engine-portably (md5 of a deterministic string) so the
    operator stays oracle-checkable.

    ``stride`` must be ≤ ``width`` or tokens between windows would be
    silently dropped.
    """
    if width <= 0 or stride <= 0:
        raise ValueError(f"width and stride must be positive, got {width}/{stride}")
    if stride > width:
        raise ValueError(
            f"stride ({stride}) > width ({width}) would drop tokens between chunks"
        )
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).cast("long").alias("_n_tokens"),
    )
    starts = F.sequence(
        F.lit(0).cast("long"), F.col("_n_tokens") - 1, F.lit(stride).cast("long")
    )
    chunk = F.expr(f"slice(_toks, start_tok + 1, {int(width)})")
    return (
        base.select(
            F.col(id_col),
            F.col("_toks"),
            F.posexplode(starts).alias("chunk_idx", "start_tok"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("start_tok"),
            F.size(chunk).cast("long").alias("chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
    )
