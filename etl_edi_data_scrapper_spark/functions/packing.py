"""Sequence packing: assign documents to fixed token-budget training
windows ("bins") — the step between curation and tokenization in an LLM
data pipeline (training consumes fixed-length sequences, so documents are
concatenated shard-by-shard and sliced every `budget` tokens; a document
belongs to the bin its first token lands in, and long documents straddle
bin boundaries exactly as concatenation-style packing does).

Scale design: a GLOBAL greedy pack is inherently sequential — one ordered
scan, one partition, a scale-killer at 100 TB. Packing within hash shards
(`shard = id % shards`) keeps bins just as full (each shard sees a uniform
sample of the corpus) while every shard packs independently: the plan is
one narrow projection + one per-shard running-sum window — `shards`-way
parallel, no global sort, no driver state. Assignment is deterministic and
repartition-stable: (shard, order-by-id, cumulative tokens) never depends
on physical layout, unlike zipWithIndex-style packers.

The reference has no analog (it has no notion of training windows); this
is part of the engine's training-data surface alongside dedup/curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_by_token_budget(
    df: DataFrame,
    budget: int = 2048,
    shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer=None,
) -> DataFrame:
    """(id, n_tokens, pack_shard, shard_offset, pack_bin) per document.

    ``n_tokens`` is the whitespace token count by default (the same
    tokenizer the quality/vocab queries use). Training windows are
    denominated in tokens the trainer actually sees, so ``tokenizer=``
    accepts a GPT-2-format merges.txt path (or preloaded rank dict) and
    switches the count to the EXACT BPE token count via
    `functions/bpe.bpe_token_count_exact` — an optional Arrow-batched
    Pandas stage; everything downstream (offsets, bins) is unchanged.
    ``shard_offset`` is the document's first-token offset within its
    shard's concatenation stream; ``pack_bin = shard_offset DIV budget``
    (integer division on longs — no float boundary jitter).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if tokenizer is not None:
        from etl_edi_data_scrapper_spark.functions.bpe import bpe_token_count_exact

        counted = bpe_token_count_exact(
            df.select(F.col(id_col), F.col(text_col)),
            text_col=text_col,
            merges=tokenizer,
            out_col="__bpe_n",
        )
        base = counted.select(
            F.col(id_col),
            F.col("__bpe_n").cast("long").alias("n_tokens"),
            F.pmod(F.col(id_col), F.lit(shards)).cast("long").alias("pack_shard"),
        )
    else:
        base = df.select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
            F.pmod(F.col(id_col), F.lit(shards)).cast("long").alias("pack_shard"),
        )
    w = Window.partitionBy("pack_shard").orderBy(id_col)
    return (
        base
        .withColumn("shard_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn("pack_bin", F.expr(f"shard_offset DIV {int(budget)}"))
    )


def materialize_packed_bins(
    df: DataFrame,
    budget: int = 2048,
    shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer=None,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """The assembly step after :func:`pack_by_token_budget`: one row per
    (pack_shard, pack_bin) — EVERY fixed-length training window a trainer
    loads, including windows that fall entirely inside a document longer
    than the budget (no doc STARTS in them; they emit an empty-docs row
    with ``carry_in`` true, so a sequence writer iterating the rows never
    silently skips a window and bin numbering has no gaps). Each row
    carries the ORDERED documents whose first token lands in the bin, as
    an array of (offset_in_bin, doc_id, n_tokens) structs, plus:

      * ``carry_in`` — the bin opens mid-document (the previous bin's
        last doc straddles the boundary; concatenation packing keeps it
        in its first-token bin, so this bin's tokens up to the first
        start — all of them, for an interior bin — belong to that
        straddler);
      * ``n_docs`` and ``bin_start_tokens`` — bookkeeping for the
        sequence writer (``bin_start_tokens`` is NULL for interior bins:
        nothing starts there).

    One groupBy on (shard, bin) — the assignment's own keys, so the
    aggregation rides the packing window's partitioning — plus one tiny
    per-shard totals aggregate (`shards` rows) that generates the full
    bin range. ``assignments`` accepts a precomputed
    :func:`pack_by_token_budget` frame so a caller already holding the
    assignment reuses its window instead of paying it twice.
    """
    packed = (
        assignments
        if assignments is not None
        else pack_by_token_budget(
            df, budget=budget, shards=shards, id_col=id_col, text_col=text_col,
            tokenizer=tokenizer,
        )
    )
    off_in_bin = F.col("shard_offset") - F.col("pack_bin") * F.lit(int(budget))
    starts = (
        packed.withColumn("offset_in_bin", off_in_bin.cast("long"))
        .groupBy("pack_shard", "pack_bin")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("offset_in_bin"),
                        F.col(id_col),
                        F.col("n_tokens"),
                    )
                )
            ).alias("docs"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("offset_in_bin").cast("long").alias("bin_start_tokens"),
        )
    )
    # the full bin range per shard: ceil(total tokens / budget) bins —
    # interior bins of straddling docs exist even with no starts inside
    all_bins = (
        packed.groupBy("pack_shard")
        .agg(F.sum("n_tokens").alias("__tot"))
        .select(
            "pack_shard",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    # integer DIV: exact at any corpus size (float division
                    # loses ULPs past 2^52 tokens)
                    F.expr(f"(__tot - 1) DIV {int(budget)}"),
                )
            ).alias("pack_bin"),
        )
    )
    empty_docs = F.expr(
        f"CAST(array() AS {starts.schema['docs'].dataType.simpleString()})"
    )
    return (
        all_bins.join(starts, ["pack_shard", "pack_bin"], "left")
        .select(
            "pack_shard",
            "pack_bin",
            F.coalesce("docs", empty_docs).alias("docs"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.col("bin_start_tokens"),
            # bin 0 starts at token 0 by construction; a later bin opened
            # mid-doc when its first start is past 0 — or nothing starts
            # in it at all (interior bin of a straddler)
            (
                (F.col("pack_bin") > 0)
                & (
                    F.col("bin_start_tokens").isNull()
                    | (F.col("bin_start_tokens") > 0)
                )
            ).alias("carry_in"),
        )
    )
