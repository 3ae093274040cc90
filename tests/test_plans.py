"""Physical-plan property tests — the scale contract, asserted.

Each assertion pins a property the 100 TB deployment depends on: predicate
pushdown into the parquet scan, column pruning, broadcast of small
dimensions, map-side partial aggregation, top-K without a global sort. A
regression here (e.g. a refactor that breaks pushdown) fails CI even though
results stay correct.
"""

import pytest

from etl_edi_data_scrapper_spark.suite import QUERIES


def plan_of(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_tpch_q1_pushdown_pruning_partial_agg(spark, sf_dir):
    plan = plan_of(spark, "tpch_q1", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: only needed columns reach the reader
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    # partial (map-side) + final aggregate around one exchange
    assert plan.count("HashAggregate") >= 2


def test_join_q3_broadcasts_and_topk(spark, sf_dir):
    plan = plan_of(spark, "join_q3", sf_dir)
    assert "BroadcastHashJoin" in plan
    # top-10 executes as TakeOrderedAndProject, not a global Sort
    assert "TakeOrderedAndProject" in plan
    # lineitem scan pruned to 3 columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l and "l_orderkey" in l]
    assert read and "l_quantity" not in read[0]


def test_enrich_join_broadcasts_leg(spark, sf_dir):
    plan = plan_of(spark, "enrich_join", sf_dir)
    assert "BroadcastHashJoin LeftOuter BuildRight" in plan
    # part leg scan pruned to key + copied fields
    read = [l for l in plan.splitlines() if "ReadSchema" in l and "p_partkey" in l]
    assert read and "p_size" not in read[0] and "p_brand" not in read[0]


def test_keyed_merge_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, "keyed_merge", sf_dir)
    # collect_list/max_by run as ObjectHashAggregate partial+final pairs
    assert plan.count("ObjectHashAggregate") >= 2 or plan.count("HashAggregate") >= 2


def test_map_clean_single_roundrobin_exchange(spark, sf_dir):
    # one deliberate round-robin repartition (parallelism for the CPU-heavy
    # clean projection over coarse file splits); NO hash/range shuffle —
    # the mapper itself stays narrow
    plan = plan_of(spark, "map_clean", sf_dir)
    assert "RoundRobinPartitioning" in plan
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan


def test_topk_orders_no_global_sort(spark, sf_dir):
    plan = plan_of(spark, "topk_orders", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_minhash_no_cartesian(spark, sf_dir):
    # candidate generation must never be a cross product
    plan = plan_of(spark, "minhash_lsh", sf_dir)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_minhash_signature_pipeline_appears_once(spark, sf_dir):
    """Candidate generation is bucket-grouped pair explosion, not a
    self-join — the signature pipeline (shingle explode) must exist exactly
    ONCE in the candidate subtree; verification adds two streamed doc
    scans, so the whole query holds ≤3 shingle Generates."""
    plan = plan_of(spark, "minhash_lsh", sf_dir)
    assert plan.count("Generate explode(array_distinct") <= 3
    # the verify joins must broadcast the (small) pair set, not the docs
    assert "BroadcastHashJoin" in plan


def test_embed_neardup_blocked_join(spark, sf_dir):
    plan = plan_of(spark, "embed_neardup", sf_dir)
    assert "CartesianProduct" not in plan  # label-blocked equi-join


def test_ann_topk_broadcasts_queries(spark, sf_dir):
    plan = plan_of(spark, "ann_topk", sf_dir)
    # corpus side streams; the 5 query vectors broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_contamination_broadcasts_benchmark_set(spark, sf_dir):
    plan = plan_of(spark, "contamination", sf_dir)
    # benchmark shingles are the broadcast side; corpus text never shuffles
    assert "BroadcastHashJoin" in plan
    # the doc_id predicate splitting bench/corpus reaches both parquet scans
    assert "PushedFilters" in plan and "doc_id" in plan


def test_tfidf_broadcasts_vocabulary(spark, sf_dir):
    plan = plan_of(spark, "tfidf_topk", sf_dir)
    # DF (vocabulary) and corpus-count legs join by broadcast, not shuffle
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_pii_scrub_narrow_legs_and_hash_only_span_shuffle(spark, sf_dir):
    """The scrub/collapse legs stay narrow (one widen repartition, no
    key exchange of their own); the r6 span-dedup leg may shuffle, but
    ONLY on the 16-byte span hash and doc_id — never on text. Partition
    keys named in the plan's exchanges are the proof surface here; the
    payload discipline (the `h` exchange carries (h, doc_id, pos), not
    spans) is asserted in span_dedup's own docstring-audited plan."""
    import re

    plan = plan_of(spark, "pii_scrub", sf_dir)
    # the widen repartition appears once per reuse of the shared docs scan
    # (pii leg + the span leg's two derivations), never zero
    assert plan.count("RoundRobinPartitioning") >= 1
    keys = set(re.findall(r"hashpartitioning\((\w+)#", plan))
    assert keys <= {"h", "doc_id"}, keys


def test_cogroup_stats_copartitions_both_sides(spark, sf_dir):
    plan = plan_of(spark, "cogroup_stats", sf_dir)
    assert "FlatMapCoGroupsInPandas" in plan or "FlatMapCoGroups" in plan
    # key-subset filter pushed into BOTH parquet scans
    assert "PushedFilters" in plan
    assert plan.count("IsNotNull(o_orderkey)") >= 1 or "o_orderkey" in plan


def test_simhash_pairs_shares_one_kernel_pass(spark, sf_dir):
    # both sig_bits legs live in ONE linear plan: a single documents scan
    # (the kernel runs once) and a single blocking exchange for the
    # combined (leg, piece, block) groupBy — no union, no double pipeline.
    # raw toString (not formatted) so each node appears exactly once
    df = QUERIES["simhash_pairs"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    # exactly three hash exchanges: the doc_id repartition the kernel
    # groupBy rides, the combined (leg, piece, block) blocking groupBy,
    # and the final pair-dedup distinct — nothing duplicated per leg
    assert plan.count("Exchange hashpartitioning") == 3


def test_sessionize_native_leg_joins_broadcast(spark, sf_dir):
    # the two 150-row per-user aggregates merge without a shuffle join
    plan = plan_of(spark, "sessionize", sf_dir)
    assert "BroadcastHashJoin" in plan
