"""Incremental URL dedup: screen each incoming micro-batch (a new crawl
slice) against every canonical URL EVER accepted, so re-crawls and
mirror fetches never re-admit a document the store already holds. The
streaming face of `functions/urls.url_dedup_verdicts` — and the stage a
real web-ingest pipeline runs FIRST, before any text op touches the
batch (C4/CCNet/RefinedWeb all gate on URL before content).

Same store-join shape as `neardup_stream.py` but strictly cheaper:
exact keys (one broadcast-or-shuffle equi-join on a short string), no
candidate verification step, and the accumulated state is one row per
DISTINCT canonical URL ever accepted — the minimum any exact URL dedup
must remember (each row also names the first-accepting doc and epoch,
so verdicts can say WHO, like the near-dup store and unlike the bloom
screen).

Composition per micro-batch (pure batch operators, testable sans
stream):

  batch docs → `url_dedup_verdicts` (canonicalize + WITHIN-batch
  first-id-wins) → left join against the WHOLE store → verdict frame
  (`is_url_dup` = within-batch dup OR a store hit whose first-accepting
  doc is someone else; `dup_of` names the original);
  then the batch's first-per-key rows are inserted: keys NOT already
  present are appended, stamped with this epoch id (provenance only).

Replay safety (foreachBatch is at-least-once) is by IDENTITY, not by
epoch arithmetic — the `neardup_stream` rule: a replayed doc that finds
its OWN key in the store (``first_doc_id == doc_id``) is the accepted
representative, not a duplicate, so replaying an epoch reproduces its
verdicts exactly; the insert anti-joins against ALL existing keys, so
replay appends nothing. Screening the whole store (never
``epoch < current``) also means a NEW stream incarnation — fresh
checkpoint dir, epoch counter back at 0 — still screens against every
historical key; an epoch-relative filter would silently re-admit all
of history after a checkpoint reset.

Rows that are not URLs at all (NULL / placeholder values —
`url_dedup_verdicts`' head guard) are never flagged and never
inserted: a missing key is not a shared key, in the store exactly as
in the batch.

Store compatibility: the store keys ARE canonical forms, so changing
the canonicalization (a different ``tracking_params`` set, a new PSL,
toggling ``canonicalize_url(idna=...)`` — punycode folding rewrites the
canonical key of every IDN host) changes the keys — an existing store
must be rebuilt under the new rules or re-crawls of previously-held
pages will be re-admitted under their new canonical spelling. r12: the
``idna`` direction of this caveat is ENFORCED, not just documented — a
``_canon_meta.json`` sidecar (on the store's own filesystem, the fsutil
discipline) records the regime at store creation, and a batch arriving
under the other regime raises instead of silently splitting the key
space; a legacy store with no sidecar is idna=False by construction
(the only regime that could have built it).
"""

from __future__ import annotations

from typing import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark.functions.urls import url_dedup_verdicts


def _read_store(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """The accumulated (canonical_url, first_doc_id, epoch) table, or
    None when no store exists yet. Only PATH_NOT_FOUND / empty-dir mean
    'no store'; anything else (corruption, permissions) raises instead
    of silently forgetting ingestion history."""
    try:
        store = spark.read.parquet(store_dir)
        store.schema  # force analysis inside the try
        return store
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "UNABLE_TO_INFER_SCHEMA" not in str(e):
            raise
        return None


def _check_canon_meta(spark: SparkSession, store_dir: str, idna: bool,
                      store_exists: bool) -> None:
    """Write-or-verify the store's canonicalization regime. The sidecar
    is written ONCE at store creation; a mismatched batch refuses loudly
    (re-admitting history under respelled keys is the silent-failure
    mode). Absent sidecar + existing store = a pre-r12 store, which
    could only have been built idna=False."""
    import json

    from etl_edi_data_scrapper_spark import fsutil

    meta_path = f"{store_dir}/_canon_meta.json"
    text = fsutil.read_text(spark, meta_path)
    stored = json.loads(text).get("idna", False) if text else (
        False if store_exists else None
    )
    if stored is None:
        fsutil.write_text_atomic(
            spark, meta_path, json.dumps({"idna": bool(idna)})
        )
        return
    if bool(stored) != bool(idna):
        raise ValueError(
            f"url store {store_dir} was built with idna={bool(stored)} "
            f"but this batch screens with idna={bool(idna)}: the canonical "
            "keys of IDN hosts differ between regimes, so the store would "
            "silently re-admit (or over-drop) re-crawled pages. Rebuild "
            "the store under the new regime or keep the old flag."
        )


def screen_batch_against_url_store(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    epoch_id: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    idna: bool = False,
) -> DataFrame:
    """One increment: returns (id_col, canonical_url, is_url_dup,
    dup_of) for the batch — ``dup_of`` is the store's first-accepting
    doc id for store hits, the batch's lowest id for within-batch dups,
    NULL for accepted rows — and inserts the batch's newly-accepted
    canonical keys stamped with ``epoch_id`` (provenance only; verdicts
    never read it). The verdict frame is eagerly checkpointed before
    the store append, so the caller may evaluate it any number of
    times."""
    local = url_dedup_verdicts(
        batch, url_col=url_col, id_col=id_col, idna=idna
    ).select(
        F.col(id_col), "canonical_url", F.col("is_url_dup").alias("__batch_dup")
    )
    local = local.localCheckpoint(eager=True)  # verdict + insert share it

    store = _read_store(spark, store_dir)
    _check_canon_meta(spark, store_dir, idna, store_exists=store is not None)
    # the WHOLE store, not epoch < current: replay safety is by identity
    # (a doc is never a dup of itself — the filter below), and an
    # epoch-relative screen would go blind to all of history the moment
    # a new stream incarnation restarts the epoch counter at 0
    prior = (
        store.groupBy("canonical_url")
        .agg(F.min("first_doc_id").alias("__store_first"))
        if store is not None
        else spark.createDataFrame([], "canonical_url string, __store_first long")
    )

    # per-key batch minimum via groupBy+join, NOT a window: a window
    # would drag every NULL-canonical row (all the no-URL docs) into one
    # partition — the exact skew the NULL guard exists to avoid
    batch_first = (
        local.filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias("__batch_first"))
    )
    joined = local.join(prior, "canonical_url", "left").join(
        batch_first, "canonical_url", "left"
    )
    # an at-least-once REPLAY finds the doc's own key in the store — the
    # accepted representative is not a duplicate of itself
    store_hit = F.col("__store_first").isNotNull() & (
        F.col("__store_first") != F.col(id_col)
    )
    verdict = (
        joined.select(
            F.col(id_col),
            "canonical_url",
            (
                F.col("canonical_url").isNotNull()
                & (F.col("__batch_dup") | store_hit)
            ).alias("is_url_dup"),
            F.when(
                F.col("canonical_url").isNotNull() & store_hit,
                F.col("__store_first"),
            )
            .when(
                F.col("canonical_url").isNotNull() & F.col("__batch_dup"),
                F.col("__batch_first"),
            )
            .alias("dup_of"),
        )
        .localCheckpoint(eager=True)  # materialize BEFORE the store grows
    )

    accepted = (
        verdict.filter(~F.col("is_url_dup") & F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias("first_doc_id"))
    )
    existing = (
        store.select("canonical_url").distinct()
        if store is not None
        else spark.createDataFrame([], "canonical_url string")
    )
    new_keys = accepted.join(existing, "canonical_url", "left_anti").withColumn(
        "epoch", F.lit(int(epoch_id)).cast("long")
    )
    new_keys.write.mode("append").parquet(store_dir)
    return verdict


def run_incremental_url_dedup(
    spark: SparkSession,
    doc_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    on_batch: Callable[[DataFrame, int], None],
    url_col: str = "url",
    id_col: str = "doc_id",
    idna: bool = False,
):
    """Streaming entry point: each micro-batch is screened against the
    accumulated canonical-URL store and handed to
    ``on_batch(verdict_df, epoch_id)``. Returns the StreamingQuery."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        verdict = screen_batch_against_url_store(
            spark, batch_df, store_dir, epoch_id, url_col=url_col,
            id_col=id_col, idna=idna,
        )
        on_batch(verdict, epoch_id)

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
