"""Keyed merge (dedup w/ merge rules) + multi-source enrichment join.

Reference semantics: `DataSetCollection` (`src/Model/DataSetCollection.php`):
rows stream in arrival order into a map keyed by a unique index (default
``upc``); per-field merge rules combine colliding rows — ``min`` / ``max`` /
``addArray`` (append, arrival order) / default last-write-wins; rows whose
key is NULL or ``''`` are dropped (:70-71). `addFieldsFromCollection`
(:86-109) is the multi-source enrichment: left-join a leg onto the base by
key, overwriting listed fields where the leg has a value.

Spark-first restatement:
  * arrival order is IMPLICIT in PHP (one thread, one array); under
    distributed execution it must be explicit — every scan attaches a
    ``_seq`` long (leg_index ⊗ partition ⊗ row offset, or any caller-supplied
    total order). All order-dependent rules read it.
  * the merge is ONE ``groupBy(key)`` with hash-partial aggregation:
    map-side combine happens before the shuffle, so 100 TB with hot keys
    still moves only one partial row per key per task. ``max_by(col, _seq)``
    = last-write-wins; ``min``/``max`` direct; ``addArray`` =
    ``array_sort(collect_list(struct(_seq, col)))`` then field-extract
    (exact arrival order, deterministic under any partitioning).
  * enrichment legs are typically small (supplier dimension feeds) →
    broadcast-joinable; AQE promotes them at runtime, or pass
    ``broadcast=True`` to force.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEQ_COL = "_seq"

# min/max/addArray + default last-write-wins are the reference's rules
# (`DataSetCollection::applyRules`); sum/first/count are natural
# generalizations this engine adds (all still one-shuffle aggregates).
VALID_RULES = {"min", "max", "addArray", "sum", "first", "count"}


# Legs live at bit 59+: monotonically_increasing_id is partition_id<<33 |
# row, so its values stay below 2^59 while partition count < 2^26 (~67M — far
# past any real job; Spark itself degrades around ~1M tasks). A lower shift
# (e.g. 52) silently loses last-write-wins ties at ≥2^19 partitions.
_LEG_SHIFT = 59


def with_seq(df: DataFrame, leg: int = 0, seq_expr: Column | None = None) -> DataFrame:
    """Attach the explicit arrival-order column ``_seq``.

    Default: ``monotonically_increasing_id()`` encodes (partition, row
    offset) — deterministic for a given file listing, which matches the
    reference's file-order × row-order arrival contract without a shuffle or
    a global sort. Callers with a real event-order column (the scalable
    choice at 100 TB, and what correctness oracles use) pass ``seq_expr``
    (must stay below 2^59 when combined with a non-zero ``leg``).
    ``leg`` (0..15) offsets multi-source legs into disjoint ranges so later
    legs always win last-write-wins ties (legs are processed in config
    order, `Aggregator.php:112-128`). With a non-zero leg the default seq is
    overflow-guarded in-plan: a scan with ≥2^26 partitions raises instead of
    silently corrupting tie-breaks.
    """
    if not 0 <= int(leg) < 16:
        raise ValueError(f"leg must be in [0, 16): {leg}")
    if seq_expr is not None:
        seq = seq_expr.cast("long")
    else:
        seq = F.monotonically_increasing_id()
        if leg and not df.isStreaming:
            # plan-time guard (a per-row branch would knock the projection
            # out of whole-stage codegen): mid's partition bits stay below
            # the leg shift while partitions < 2^26; demand an explicit seq
            # beyond 2^20 static partitions — 64x headroom for AQE re-splits
            n = df.rdd.getNumPartitions()
            if n >= (1 << 20):
                raise ValueError(
                    f"with_seq: {n} partitions risks overflowing the leg "
                    "bits of monotonically_increasing_id — pass an explicit "
                    "seq_expr for multi-leg jobs at this scale"
                )
    return df.withColumn(SEQ_COL, seq + F.lit(int(leg) << _LEG_SHIFT))


def keyed_merge(
    df: DataFrame,
    key: str,
    merge_rules: dict[str, str] | None = None,
    seq_col: str = SEQ_COL,
    drop_seq: bool = True,
    max_array_elements: int | None = None,
) -> DataFrame:
    """Group by ``key`` applying per-column merge rules (§2.4 of SURVEY.md).

    Columns without a rule get last-write-wins by ``seq_col``. Null/empty
    keys are dropped before the shuffle (filter is pushed to the scan).

    ``max_array_elements`` bounds every ``addArray`` column to the FIRST N
    values in arrival order — the knob for hot keys at scale, where an
    unbounded per-key array is the one growth term the merge otherwise has
    (SCALE.md §keyed_merge). The aggregation state itself still collects
    before slicing; for keys hot enough that even that is a problem,
    ``keyed_merge_salted`` splits the collection across salt buckets.
    """
    merge_rules = dict(merge_rules or {})
    bad = {r for r in merge_rules.values()} - VALID_RULES
    if bad:
        raise ValueError(f"unknown merge rules: {sorted(bad)}")

    if seq_col not in df.columns:
        df = with_seq(df)
        seq_col = SEQ_COL

    kc = F.col(key)
    df = df.filter(kc.isNotNull() & (kc.cast("string") != ""))

    aggs: list[Column] = []
    for c in df.columns:
        if c == key or c == seq_col:
            continue
        rule = merge_rules.get(c)
        if rule == "min":
            aggs.append(F.min(c).alias(c))
        elif rule == "max":
            aggs.append(F.max(c).alias(c))
        elif rule == "sum":
            aggs.append(F.sum(c).alias(c))
        elif rule == "count":
            aggs.append(F.count(c).alias(c))
        elif rule == "first":
            aggs.append(F.min_by(c, F.col(seq_col)).alias(c))
        elif rule == "addArray":
            # exact arrival order: sort the (seq, value) pairs, then project
            pairs = F.array_sort(
                F.collect_list(F.struct(F.col(seq_col).alias("s"), F.col(c).alias("v")))
            )
            if max_array_elements is not None:
                pairs = F.slice(pairs, 1, int(max_array_elements))
            aggs.append(F.transform(pairs, lambda x: x["v"]).alias(c))
        else:
            aggs.append(F.max_by(c, F.col(seq_col)).alias(c))
    if not drop_seq:
        aggs.append(F.max(seq_col).alias(seq_col))
    return df.groupBy(key).agg(*aggs)


def enrich(
    base: DataFrame,
    leg: DataFrame,
    base_key: str,
    leg_key: str,
    fields: list[str],
    seq_col: str = SEQ_COL,
    broadcast: bool = True,
) -> DataFrame:
    """Left-join enrichment (`DataSetCollection::addFieldsFromCollection`).

    Leg rows are first deduped to last-per-key (the reference's "last
    occurrence per key wins", :94-105); leg rows whose key is absent from the
    base are discarded (left join does this); base rows with no match keep
    their values. Overlapping columns follow the reference's null semantics
    exactly (`DataRow::hasField` is ``array_key_exists``,
    `DataSetCollection.php:100-103`): when the KEY matched, the leg value
    overwrites even if it is NULL — so the overwrite keys off the join-match
    marker (leg key is never null: keyed_merge drops those rows), not off
    value presence.
    """
    leg_proj = leg.select(
        F.col(leg_key).alias("__leg_key"),
        *[F.col(f) for f in fields],
        *([F.col(seq_col)] if seq_col in leg.columns else []),
    )
    leg_last = keyed_merge(leg_proj, "__leg_key", {}, seq_col=seq_col)
    renamed = leg_last.select(
        "__leg_key", *[F.col(f).alias(f"__leg_{f}") for f in fields]
    )
    if broadcast:
        renamed = F.broadcast(renamed)

    joined = base.join(renamed, base[base_key] == renamed["__leg_key"], "left")
    matched = F.col("__leg_key").isNotNull()
    out_cols: list[Column] = []
    for c in base.columns:
        if c in fields:
            out_cols.append(F.when(matched, F.col(f"__leg_{c}")).otherwise(base[c]).alias(c))
        else:
            out_cols.append(base[c])
    for f in fields:
        if f not in base.columns:
            out_cols.append(F.col(f"__leg_{f}").alias(f))
    return joined.select(*out_cols)


def keyed_merge_salted(
    df: DataFrame,
    key: str,
    merge_rules: dict[str, str] | None = None,
    seq_col: str = SEQ_COL,
    salt_buckets: int = 16,
    max_array_elements: int | None = None,
) -> DataFrame:
    """Skew-proof ``keyed_merge``: two-stage aggregation over a salt.

    A hot key (one UPC = 10% of a 100 TB feed) funnels into a single
    reducer under plain groupBy. Salting splits each key into
    ``salt_buckets`` sub-groups — stage 1 combines within (key, salt)
    in parallel, stage 2 merges the per-salt partials per key. Results are
    IDENTICAL to keyed_merge (given unique ``_seq``):
      * min/max     — associative, two-stage directly;
      * last-write  — per-salt (value at max seq, max seq), final max_by
                      over the per-salt seqs;
      * addArray    — per-salt (seq, value) pairs, final flatten + sort.
    AQE's skew-join splitting handles the JOIN side of skew; this handles
    the AGGREGATION side, which AQE does not re-split.
    """
    merge_rules = dict(merge_rules or {})
    bad = {r for r in merge_rules.values()} - VALID_RULES
    if bad:
        raise ValueError(f"unknown merge rules: {sorted(bad)}")
    if seq_col not in df.columns:
        df = with_seq(df)
        seq_col = SEQ_COL

    kc = F.col(key)
    df = df.filter(kc.isNotNull() & (kc.cast("string") != ""))
    df = df.withColumn("__salt", F.pmod(F.col(seq_col), F.lit(salt_buckets)))

    value_cols = [c for c in df.columns if c not in (key, seq_col, "__salt")]
    partial: list[Column] = []
    final: list[Column] = []
    for c in value_cols:
        rule = merge_rules.get(c)
        if rule == "min":
            partial.append(F.min(c).alias(c))
            final.append(F.min(c).alias(c))
        elif rule == "max":
            partial.append(F.max(c).alias(c))
            final.append(F.max(c).alias(c))
        elif rule == "sum":
            partial.append(F.sum(c).alias(c))
            final.append(F.sum(c).alias(c))
        elif rule == "count":
            partial.append(F.count(c).alias(c))
            final.append(F.sum(c).alias(c))  # counts add up across salts
        elif rule == "first":
            partial.append(F.min_by(c, F.col(seq_col)).alias(c))
            final.append(F.min_by(c, F.col("__min_seq")).alias(c))
        elif rule == "addArray":
            partial.append(
                F.collect_list(
                    F.struct(F.col(seq_col).alias("s"), F.col(c).alias("v"))
                ).alias(c)
            )
            merged_pairs = F.array_sort(F.flatten(F.collect_list(c)))
            if max_array_elements is not None:
                merged_pairs = F.slice(merged_pairs, 1, int(max_array_elements))
            final.append(F.transform(merged_pairs, lambda x: x["v"]).alias(c))
        else:
            partial.append(F.max_by(c, F.col(seq_col)).alias(c))
            final.append(F.max_by(c, F.col("__max_seq")).alias(c))
    partial.append(F.max(seq_col).alias("__max_seq"))
    partial.append(F.min(seq_col).alias("__min_seq"))

    staged = df.groupBy(key, "__salt").agg(*partial)
    return staged.groupBy(key).agg(*final)


def keyed_merge_auto(
    df: DataFrame,
    key: str,
    merge_rules: dict[str, str] | None = None,
    seq_col: str = SEQ_COL,
    salt_buckets: int | str = "auto",
    max_array_elements: int | None = None,
    salt_above: int = 1_000_000,
) -> tuple[DataFrame, dict]:
    """Measured-auto plain-vs-salted ``keyed_merge`` (r14 — the
    `jaccard_pairs` auto-strategy discipline applied to the reference's
    core operator). Returns ``(result, decision)``; the result is
    byte-identical whichever strategy fires (pinned by the salted
    equivalence tests).

    The decision rule follows where skew can actually hurt this
    aggregation: every rule EXCEPT ``addArray`` keeps constant-size
    per-key state with map-side partials (a hot key costs one partial
    row per task — plain groupBy is already skew-safe), so
    (a) with no ``addArray`` rule the plain merge ships WITHOUT any
        probe job;
    (b) with one, the hot-key mass is MEASURED first: one
        ``groupBy(key).count() → max`` probe — itself constant-state,
        so the probe cannot hit the skew it is probing for — and the
        salted two-stage fires only when the hottest key's row count
        reaches ``salt_above`` (default 1M: ~the per-task row volume
        where a single reducer's collect_list state becomes a
        straggler/OOM term at 100 TB; size it to executor memory /
        expected element width).

    ``salt_buckets="auto"`` sizes the salt from the SAME measurement:
    ⌈max_key_rows / salt_above⌉ buckets (clamped to [2, 256]) caps each
    per-(key, salt) partial's collect state at ~``salt_above`` rows —
    the bucket count scales with the measured hot mass instead of a
    fixed 16 that over-salts mild skew and under-salts a monster key.

    The probe is one linear pass over the input — measured at factor
    300 (SCALE.md): 313 s against the merge's own 792 s, because the
    probe re-pays the input SCAN, the dominant term of both jobs. It is
    skew-immune but not free: probe a NEW feed once, record the
    decision, and pin `merge_strategy` for reruns — the decision dict
    (strategy, max_key_rows, salt_above, salt_buckets, probed) is
    returned for exactly that, the opq_train_auto convention."""
    merge_rules = dict(merge_rules or {})
    bad = {r for r in merge_rules.values()} - VALID_RULES
    if bad:
        raise ValueError(f"unknown merge rules: {sorted(bad)}")
    decision: dict = {"salt_above": int(salt_above), "probed": False,
                      "max_key_rows": None}
    if "addArray" not in merge_rules.values():
        decision["strategy"] = "plain"
        decision["reason"] = (
            "no addArray rule: per-key aggregation state is constant "
            "(map-side partials), plain groupBy is skew-safe"
        )
        return (
            keyed_merge(
                df, key, merge_rules, seq_col=seq_col,
                max_array_elements=max_array_elements,
            ),
            decision,
        )
    kc = F.col(key)
    hot = (
        df.filter(kc.isNotNull() & (kc.cast("string") != ""))
        .groupBy(key).count()
        .agg(F.max("count").alias("m"))
        .first()["m"]
    )
    decision["probed"] = True
    decision["max_key_rows"] = int(hot or 0)
    if decision["max_key_rows"] >= salt_above:
        if salt_buckets == "auto":
            salt_buckets = min(
                256, max(2, -(-decision["max_key_rows"] // salt_above))
            )
        decision["strategy"] = "salted"
        decision["salt_buckets"] = int(salt_buckets)
        decision["reason"] = (
            f"hottest key carries {decision['max_key_rows']} rows "
            f">= salt_above={salt_above}: addArray collect state on one "
            "reducer would be the straggler/OOM term"
        )
        return (
            keyed_merge_salted(
                df, key, merge_rules, seq_col=seq_col,
                salt_buckets=int(salt_buckets),
                max_array_elements=max_array_elements,
            ),
            decision,
        )
    decision["strategy"] = "plain"
    decision["reason"] = (
        f"hottest key carries {decision['max_key_rows']} rows < "
        f"salt_above={salt_above}: one-stage merge is cheaper (no "
        "second shuffle)"
    )
    return (
        keyed_merge(
            df, key, merge_rules, seq_col=seq_col,
            max_array_elements=max_array_elements,
        ),
        decision,
    )
