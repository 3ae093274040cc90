"""Incremental NEAR-dup: dedupe each incoming micro-batch of documents
against everything already accepted — the production shape of training-data
ingestion (a new crawl slice must not re-admit near-copies of the corpus).

Composition (all batch operators reused inside ``foreachBatch``):

  batch docs → `dedup.minhash_signatures` → `dedup.lsh_band_keys`
            → equi-join against the ACCUMULATED band-key store (parquet)
            → signature-agreement verify on candidates only
            → accepted docs' band keys appended to the store

The store holds (band, band_key, doc_id, h0..h{n-1}) — band keys plus the
signature longs, never document text, so state size is
O(accepted docs × bands) smalls and the verify step needs no second scan.
Candidate verification estimates Jaccard as the fraction of agreeing
minhash components (the standard unbiased estimator E[matches/n] = J) —
``threshold`` is applied to that estimate. Intra-batch near-dups are
resolved first (earliest doc_id wins), so a batch full of copies admits
exactly one.

Scale notes:
  * the join is band-key equi-join (shuffle on 16-byte keys) — no
    all-pairs against history, and the store is partitioned by band so a
    band's bucket files prune on read;
  * the store grows O(accepted docs); at 10⁹ docs it is ~12 longs + keys
    per doc — a compacted parquet table, readable with partition pruning.
    Delivery is at-least-once (a replayed batch re-checks against the
    store; already-admitted ids are de-duplicated by the store append
    being keyed on doc_id at read time via max — documented trade).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark.functions.dedup import (
    lsh_band_keys,
    minhash_signatures,
)


def _sig_cols(n_hashes: int) -> list[str]:
    return [f"h{j}" for j in range(n_hashes)]


def _agreement(n_hashes: int):
    """Fraction of agreeing minhash components between x-side and y-side
    (columns h{j} vs h{j}_old) — the Jaccard estimator."""
    matches = sum(
        (
            F.when(F.col(f"h{j}") == F.col(f"h{j}_old"), 1).otherwise(0)
            for j in range(n_hashes)
        ),
        F.lit(0),
    )
    return matches / F.lit(float(n_hashes))


def dedup_batch_against_store(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    bands: int = 6,
    threshold: float = 0.5,
) -> DataFrame:
    """One increment: returns the batch with ``dup_of`` (the earliest
    near-duplicate's id — in-store or earlier in-batch — else NULL) and
    appends the ACCEPTED docs' band keys + signatures to the store.

    Pure batch function so it is testable without a stream; the streaming
    entry point `run_incremental_neardup` calls it per micro-batch."""
    sig = minhash_signatures(batch, id_col, text_col, n_hashes).cache()
    keys = lsh_band_keys(sig, id_col, n_hashes, bands)
    keyed = keys.join(sig, id_col)  # (id, band, band_key, h0..h{n-1})

    # --- intra-batch: earliest doc per colliding verified pair wins
    old_side = [F.col(c).alias(f"{c}_old") for c in _sig_cols(n_hashes)]
    intra = (
        keyed.alias("x")
        .join(
            keyed.select(
                F.col(id_col).alias("old_id"), "band", "band_key", *old_side
            ).alias("y"),
            on=["band", "band_key"],
        )
        .filter(F.col("old_id") < F.col(id_col))
        .filter(_agreement(n_hashes) >= threshold)
        .groupBy(id_col)
        .agg(F.min("old_id").alias("dup_of_intra"))
    )

    # --- against the accumulated store (band equi-join, candidates only)
    store_exists = os.path.exists(os.path.join(store_dir, "_SUCCESS"))
    if store_exists:
        store = spark.read.parquet(store_dir)
        hist = (
            keyed.join(
                store.select(
                    F.col(id_col).alias("old_id"), "band", "band_key", *old_side
                ),
                on=["band", "band_key"],
            )
            # an at-least-once REPLAY finds the doc's own keys in the store
            # — a doc is never a duplicate of itself
            .filter(F.col("old_id") != F.col(id_col))
            .filter(_agreement(n_hashes) >= threshold)
            .groupBy(id_col)
            .agg(F.min("old_id").alias("dup_of_store"))
        )
    else:
        hist = sig.select(
            F.col(id_col), F.lit(None).cast("long").alias("dup_of_store")
        ).limit(0)

    verdict = (
        batch.join(intra, id_col, "left")
        .join(hist, id_col, "left")
        .withColumn("dup_of", F.coalesce("dup_of_store", "dup_of_intra"))
        .drop("dup_of_intra", "dup_of_store")
    )

    accepted = verdict.filter(F.col("dup_of").isNull()).select(id_col)
    new_state = keyed.join(accepted, id_col)
    new_state.write.mode("append").parquet(store_dir)
    sig.unpersist()
    return verdict


def run_incremental_neardup(
    spark: SparkSession,
    doc_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    on_batch: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    bands: int = 6,
    threshold: float = 0.5,
):
    """Streaming entry point: each micro-batch is near-dedup'd against the
    store and handed to ``on_batch(verdict_df, epoch_id)`` (sink the
    verdicts wherever the pipeline needs them). Returns the StreamingQuery."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        verdict = dedup_batch_against_store(
            spark,
            batch_df,
            store_dir,
            id_col=id_col,
            text_col=text_col,
            n_hashes=n_hashes,
            bands=bands,
            threshold=threshold,
        )
        on_batch(verdict, epoch_id)

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
