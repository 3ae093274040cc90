"""Incremental bloom contamination screen: flag each incoming micro-batch
of documents against every span EVER ingested — with state bounded by the
filter size, not the corpus. The streaming face of `functions/bloom.py`
(the Dolma-style memory-bounded seen-set): the accumulated state is the
bloom filter's DISTINCT SET BIT POSITIONS as a parquet table, ≤ m rows no
matter how many batches (years of dumps) have been inserted — versus the
near-dup store (`neardup_stream.py`), which grows O(accepted docs) because
its verdicts must name a representative. Use this screen when the question
is only "have we seen this span before?" (dedup gating, rolling
decontamination) and the near-dup store when you need WHO.

Composition per micro-batch (pure batch operators, testable sans stream):

  batch docs → stride-1 width-token spans → `bloom.flag_maybe_seen`
            against the store's positions (k broadcast joins — the batch
            never shuffles) → per-doc counts → verdict frame;
  then the batch's own span positions are inserted: positions NOT already
  present are appended with this epoch id.

Replay safety (foreachBatch is at-least-once): verdicts for epoch e are
computed against positions from epochs **strictly before e within the
same stream INCARNATION** plus ALL positions from other incarnations,
so a replayed batch never matches its own insertions; and the insert
anti-joins against ALL existing positions, so replay appends nothing new.
The incarnation stamp (a UUID file persisted inside the checkpoint dir —
see ``incarnation_stamp``; epoch counters restart exactly when the
checkpoint dir is new or recreated, and the UUID changes with it) is what
keeps a RESET epoch counter from going blind to history: with a bare ``epoch < e`` screen, a fresh incarnation's epoch-0
batch would see an empty filter and re-admit every span ever ingested
(r10 review). Stores written before the stamp existed read as a
'legacy' incarnation and always screen.
Verdicts are therefore deterministic per epoch and the store stays ≤ m
rows of (pos, epoch, incarnation) — the anti-join is on the position
alone, so a position is inserted once EVER, whatever the incarnation.
False-positive semantics are the filter's textbook
contract (FPR ≈ (1 − e^(−k·n/m))^k, no false negatives) — size ``m`` to
the corpus the deployment expects, and route flagged docs to the exact
tier (`span_dedup.scrub_benchmark_spans` against the matching corpus)
when the application needs surgical confirmation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark.functions.bloom import (
    _span_expr,
    bloom_positions,
    flag_maybe_seen,
)


def _read_store(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """The accumulated (pos, epoch) table, or None when no store exists
    yet. Mirrors the neardup store discipline: only PATH_NOT_FOUND /
    empty-dir mean 'no store'; anything else (corruption, permissions)
    raises instead of silently forgetting ingestion history."""
    try:
        # mergeSchema: a store that predates the incarnation stamp holds
        # files WITHOUT the column next to files WITH it — a plain read
        # would pick one sampled footer's schema and silently drop or
        # invent the column depending on listing order
        store = spark.read.option("mergeSchema", "true").parquet(store_dir)
        store.schema  # force analysis inside the try
        return store
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "UNABLE_TO_INFER_SCHEMA" not in str(e):
            raise
        return None


def screen_batch_against_bloom_store(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    epoch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    m: int = 1 << 16,
    k: int = 3,
    incarnation: str = "default",
) -> DataFrame:
    """One increment: returns (id_col, n_spans, n_spans_maybe_seen,
    bloom_contaminated) for the batch — verdicts against epochs <
    epoch_id of THIS incarnation plus everything from other incarnations
    (module docs: a bare epoch screen goes blind after an epoch-counter
    reset) — and inserts the batch's span positions (new ones, stamped
    with epoch_id + incarnation). The verdict frame is eagerly
    checkpointed before the store append, so the caller may evaluate it
    any number of times."""
    spans = batch.select(
        F.col(id_col),
        F.explode(F.expr(_span_expr(text_col, width))).alias("win"),
    ).filter(F.col("win") != "")  # md5('') collides corpus-wide
    spans = spans.localCheckpoint(eager=True)  # verdict + insert share it

    store = _read_store(spark, store_dir)
    if store is None:
        prior = spark.createDataFrame([], "pos long")
    else:
        if "incarnation" not in store.columns:
            store = store.withColumn("incarnation", F.lit(None).cast("string"))
        # legacy rows (pre-stamp files: NULL after the schema merge) were
        # by definition written by some OTHER incarnation — always screen
        inc = F.coalesce(F.col("incarnation"), F.lit("__legacy__"))
        prior = (
            store.filter(
                (inc != incarnation) | (F.col("epoch") < int(epoch_id))
            )
            .select("pos")
            .distinct()
        )
    # one bounded table serves the k joins AND the insert anti-join
    prior = prior.localCheckpoint(eager=False)

    flagged = flag_maybe_seen(spans, prior, "win", m, k)
    counts = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("maybe_seen"), 1).otherwise(0))
        .cast("long")
        .alias("n_spans_maybe_seen"),
    )
    verdict = (
        batch.select(id_col)
        .join(counts, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_spans_maybe_seen", F.lit(0))
            .cast("long")
            .alias("n_spans_maybe_seen"),
            (F.coalesce("n_spans_maybe_seen", F.lit(0)) > 0).alias(
                "bloom_contaminated"
            ),
        )
        .localCheckpoint(eager=True)  # materialize BEFORE the store grows
    )

    batch_pos = spans.select(
        F.explode(
            F.array(*[p.cast("long") for p in bloom_positions(F.col("win"), m, k)])
        ).alias("pos")
    ).distinct()
    existing = (
        store.select("pos").distinct()
        if store is not None
        else spark.createDataFrame([], "pos long")
    )
    new_pos = (
        batch_pos.join(existing, "pos", "left_anti")
        .withColumn("epoch", F.lit(int(epoch_id)).cast("long"))
        .withColumn("incarnation", F.lit(incarnation))
    )
    new_pos.write.mode("append").parquet(store_dir)
    return verdict


def incarnation_stamp(checkpoint_dir: str, spark: SparkSession | None = None) -> str:
    """Read-or-create the stream's incarnation id: a UUID persisted as
    ``__incarnation__`` INSIDE the checkpoint dir. The raw dir PATH is
    not a safe stamp — delete-and-recreate the same path (the common
    restart-from-scratch op) resets Spark's epoch counter to 0 under an
    unchanged string, and the ``(inc != me) | (epoch < e)`` screen would
    go blind to that path's entire prior history. A UUID file shares the
    checkpoint dir's lifecycle exactly: same dir intact → same stamp
    (replay stays deterministic); dir recreated → epochs restart AND the
    stamp changes together, so prior rows read as a foreign incarnation
    and always screen.

    The marker lives on the CHECKPOINT DIR'S filesystem (Hadoop FS API
    via ``fsutil`` — r11 review: a driver-local ``open()`` beside an
    ``hdfs://``/``s3a://`` checkpoint would decouple the stamp from the
    dir's lifecycle, and a recreated remote dir would keep its stale
    local stamp — resurrecting the exact blindness this stamp closes).
    ``spark`` defaults to the active session; with no session at all
    (pure-local unit use) a plain ``file:``-scheme path still resolves
    through the local filesystem semantics below."""
    import os
    import uuid

    spark = spark or SparkSession.getActiveSession()
    marker = checkpoint_dir.rstrip("/") + "/__incarnation__"
    if spark is not None:
        from etl_edi_data_scrapper_spark import fsutil

        stamp = fsutil.read_text(spark, marker)
        if stamp and stamp.strip():
            return stamp.strip()
        stamp = uuid.uuid4().hex
        fsutil.write_text_atomic(spark, marker, stamp)
        return stamp
    # no JVM available (driver-side unit use): local filesystem
    os.makedirs(checkpoint_dir, exist_ok=True)
    try:
        with open(marker, "r", encoding="ascii") as fh:
            stamp = fh.read().strip()
        if stamp:
            return stamp
    except FileNotFoundError:
        pass
    stamp = uuid.uuid4().hex
    # write-then-rename: a crash mid-write must not leave a partial stamp
    # that a restart would read as a (different) incarnation
    tmp = marker + ".tmp"
    with open(tmp, "w", encoding="ascii") as fh:
        fh.write(stamp)
    os.replace(tmp, marker)
    return stamp


def run_incremental_bloom_screen(
    spark: SparkSession,
    doc_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    on_batch: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    m: int = 1 << 16,
    k: int = 3,
):
    """Streaming entry point: each micro-batch is screened against the
    accumulated filter and handed to ``on_batch(verdict_df, epoch_id)``.
    Returns the StreamingQuery. The incarnation stamp is a UUID file
    persisted inside the checkpoint dir (``incarnation_stamp``): epoch
    counters restart exactly when the checkpoint dir is new OR recreated,
    and the stamp changes in lockstep, so a restart of the same intact
    stream keeps its stamp (replay stays deterministic) and a reset
    counter cannot shadow history."""
    stamp = incarnation_stamp(checkpoint_dir, spark)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        verdict = screen_batch_against_bloom_store(
            spark,
            batch_df,
            store_dir,
            epoch_id,
            id_col=id_col,
            text_col=text_col,
            width=width,
            m=m,
            k=k,
            incarnation=stamp,
        )
        on_batch(verdict, epoch_id)

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
