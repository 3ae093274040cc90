"""Continuous aggregate (hypertable-rollup style): a per-(day, keys)
aggregate table maintained INCREMENTALLY from event batches — the
TimescaleDB continuous-aggregate / materialized-rollup pattern, expressed
with Spark primitives.

A full nightly recompute over 100 TB of history to refresh a dashboard
rollup is the classic waste; the incremental contract is: aggregate ONLY
the new batch, merge it with the existing rollup rows of the days the
batch touches, and rewrite ONLY those day partitions (dynamic partition
overwrite). Cost per refresh is O(batch + touched-day rollup rows), not
O(history).

Correctness discipline: partials are stored mergeable and exact —
``n`` (long) and ``total`` as DECIMAL(28,10) — so merge order and batch
boundaries can never drift the result; re-aggregating the same table from
scratch yields byte-identical rows (asserted in tests). Day selection is
a left-semi join on the batch's distinct days (no driver collect); the
write path flips ``spark.sql.sources.partitionOverwriteMode=dynamic`` so
untouched day directories are left physically untouched (also asserted).

The reference's closest analog is the hourly full replay of a supplier
feed (`BACKLOG.md` cadence notes); this is the general engine upgrade.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException


def merge_daily_rollup(
    spark: SparkSession,
    rollup_dir: str,
    batch: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> None:
    """Fold one event batch into the rollup table at ``rollup_dir``.

    Schema of the maintained table: (day date [partition], *keys,
    n long, total decimal(28,10)). Idempotence caveat: this is
    at-least-once on replay (re-merging the same batch double-counts) —
    pair with an upstream exactly-once sink (`sinks.idempotent_batch_writer`)
    or CDC dedup when the feed can replay.
    """
    delta = (
        batch.withColumn("day", F.col(ts_col).cast("date"))
        .groupBy("day", *[F.col(k) for k in keys])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(28,10)")).cast("decimal(28,10)").alias("total"),
        )
    )

    # Only PATH_NOT_FOUND / empty-dir mean "first merge" — any OTHER
    # failure (permissions, transient FS error, corrupt footer) must
    # raise: merging as first-write would dynamic-overwrite the touched
    # day partitions with batch-only counts and silently lose history.
    # Same probe discipline as streaming/neardup_stream.py's store read.
    try:
        existing = spark.read.parquet(rollup_dir)
        existing.schema  # force analysis inside the try
        have_existing = True
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "UNABLE_TO_INFER_SCHEMA" not in str(e):
            raise
        have_existing = False

    if have_existing:
        touched = delta.select("day").distinct()
        old = existing.join(touched, "day", "left_semi")
        merged = (
            old.unionByName(delta)
            .groupBy("day", *[F.col(k) for k in keys])
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("total").cast("decimal(28,10)").alias("total"),
            )
        )
        # `merged` reads the same files the overwrite below deletes at
        # commit; materialize it eagerly first so a mid-commit failure
        # cannot leave touched-day partitions deleted with their inputs
        # gone and nothing staged to replace them.
        merged = merged.localCheckpoint(eager=True)
    else:
        merged = delta

    # dynamic mode: only partitions PRESENT in `merged` are replaced.
    # Set per-write (DataFrameWriter option overrides the session conf)
    # rather than toggling spark.sql.sources.partitionOverwriteMode
    # session-globally — a concurrent writer on the same session must not
    # inherit (or race the restore of) this call's overwrite semantics.
    merged.write.option("partitionOverwriteMode", "dynamic").mode(
        "overwrite"
    ).partitionBy("day").parquet(rollup_dir)


def full_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """The from-scratch recompute the incremental path must equal."""
    return (
        events.withColumn("day", F.col(ts_col).cast("date"))
        .groupBy("day", *[F.col(k) for k in keys])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(28,10)")).cast("decimal(28,10)").alias("total"),
        )
    )


# --- replay-idempotent variant ----------------------------------------------
#
# `merge_daily_rollup` is at-least-once on replay: re-merging the same
# batch double-counts, because the merged aggregate has no memory of which
# batches it already absorbed, and a data+marker two-step cannot be made
# atomic on a plain object store (crash between the two loses or doubles a
# batch either way). The idempotent form stores PER-BATCH partials instead:
# each batch writes its own (day, batch_id) partitions with dynamic
# overwrite — the same discipline as `sinks.idempotent_batch_writer` — so a
# replay overwrites exactly its own partitions and can never double-count.
# Readers aggregate the partials (O(batches-per-day rows), not O(events));
# `compact_rollup` folds history into one partial per day so read cost
# stays bounded on long-running tables. Compact only past the replay
# horizon (batches the stream checkpoint has committed): replaying a batch
# that was already folded re-adds its partition — the same rule as Kafka
# log compaction vs consumer rewind.


def merge_daily_rollup_idempotent(
    spark: SparkSession,
    rollup_dir: str,
    batch: DataFrame,
    batch_id: int,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> None:
    """Fold one batch into the rollup store with exactly-once RESTART
    semantics: wire as
    ``stream.writeStream.foreachBatch(lambda df, bid:
    merge_daily_rollup_idempotent(spark, path, df, bid))`` — Structured
    Streaming replays a crashed batch with the SAME batch_id, and the
    rewrite lands on the same partitions."""
    delta = (
        batch.withColumn("day", F.col(ts_col).cast("date"))
        .groupBy("day", *[F.col(k) for k in keys])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(28,10)")).cast("decimal(28,10)").alias("total"),
        )
        .withColumn("batch_id", F.lit(int(batch_id)))
    )
    # per-write dynamic mode (writer option overrides session conf): safe
    # under the advertised concurrent foreachBatch wiring — no session-
    # global toggle to race or leak
    delta.write.option("partitionOverwriteMode", "dynamic").mode(
        "overwrite"
    ).partitionBy("day", "batch_id").parquet(rollup_dir)


def run_rollup_stream(
    stream: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
):
    """The DEFAULT serve-loop rollup wiring (r7): a streaming event frame
    → ``foreachBatch(merge_daily_rollup_idempotent)`` with the stream's
    REAL batch id, checkpointed — so a crash anywhere between the partial
    write and the checkpoint commit replays the batch onto its own
    (day, batch_id) partitions and can never double-count. Read the
    maintained table with :func:`read_rollup`; fold history offline with
    ``rollup-compact``. Returns the started StreamingQuery.

    This is the exactly-once counterpart of the bare
    ``foreachBatch(lambda df, _: merge_daily_rollup(...))`` wiring, which
    is at-least-once on replay and should only be used behind an upstream
    exactly-once sink."""
    spark = stream.sparkSession
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: merge_daily_rollup_idempotent(
                spark,
                rollup_dir,
                df,
                bid,
                ts_col=ts_col,
                keys=keys,
                value_col=value_col,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_rollup(
    spark: SparkSession, rollup_dir: str, keys: Sequence[str] = ("event_type",)
) -> DataFrame:
    """The rollup view over the partial store: (day, *keys, n, total).
    Cost is one aggregate over partial rows (per-day-per-batch grain),
    not over events; run `compact_rollup` to keep that grain at one row
    per (day, keys) for history."""
    return (
        spark.read.parquet(rollup_dir)
        .groupBy("day", *[F.col(k) for k in keys])
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("total").cast("decimal(28,10)").alias("total"),
        )
    )


def compact_rollup(
    spark: SparkSession, rollup_dir: str, keys: Sequence[str] = ("event_type",)
) -> tuple[int, int]:
    """Fold all batch partials into one ``batch_id=-1`` partial per day
    (temp-write + Hadoop-FS swap, same discipline as
    `streaming.neardup_stream.compact_neardup_store`). OFFLINE only —
    stop the merging stream first, and compact only batches past the
    replay horizon. Returns (rows_before, rows_after)."""
    before_df = spark.read.parquet(rollup_dir)
    before = before_df.count()
    compacted = (
        before_df.groupBy("day", *[F.col(k) for k in keys])
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("total").cast("decimal(28,10)").alias("total"),
        )
        .withColumn("batch_id", F.lit(-1))
    )
    tmp = rollup_dir.rstrip("/") + "__compacting"
    bak = rollup_dir.rstrip("/") + "__backup"
    compacted.write.mode("overwrite").partitionBy("day", "batch_id").parquet(tmp)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    src, dst, bkp = jpath(tmp), jpath(rollup_dir), jpath(bak)
    fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())
    after = spark.read.parquet(tmp).count()
    # swap via a backup rename, never a delete-then-rename: a crash
    # between the two renames leaves the live data at __backup (recover by
    # renaming it back), and the no-rollup-path window shrinks from a full
    # recursive delete to one atomic-on-HDFS rename
    fs.delete(bkp, True)  # stale backup from a prior crashed compaction
    if not fs.rename(dst, bkp):
        raise IOError(
            f"compaction could not move the live rollup {rollup_dir!r} "
            f"aside to {bak!r} — store untouched, compacted data at {tmp!r}"
        )
    if not fs.rename(src, dst):
        fs.rename(bkp, dst)  # restore the live store before failing
        raise IOError(
            f"compaction wrote {tmp!r} but could not rename it over "
            f"{rollup_dir!r} — original store restored from backup"
        )
    fs.delete(bkp, True)
    return before, after
