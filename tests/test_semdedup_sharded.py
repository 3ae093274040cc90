"""Shard-bounded SemDeDup (`clustering.semantic_dedup_sharded`) — the
linear-total deployment shape for extreme scale (SCALE.md's answer (a)
to the k ∝ N asymptote). Not oracle-expressible (shard-local numpy
Lloyd's), so the contract is pinned here: pure-python model parity on a
tiny corpus, determinism, shard-boundedness, and verdict semantics.
"""

import math

import pytest


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a)) or 1.0
    nb = math.sqrt(sum(x * x for x in b)) or 1.0
    return num / (na * nb)


@pytest.fixture(scope="module")
def tiny(spark):
    # two tight groups far apart + one singleton; ids interleaved so the
    # keep-lowest-id rule is actually exercised
    rows = [
        (10, [1.0, 0.0, 0.0]),
        (3, [0.99, 0.05, 0.0]),  # near id=10's vector, lower id -> keeps
        (7, [0.98, -0.04, 0.01]),
        (20, [0.0, 1.0, 0.0]),
        (15, [0.02, 0.99, 0.0]),
        (99, [0.0, 0.0, 1.0]),  # singleton direction
    ]
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id long, embedding array<float>"
    )


def test_single_shard_matches_bruteforce_model(spark, tiny):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded,
    )

    # threshold is a similarity FLOOR (cos >= thr drops), the same rule
    # as semantic_dedup/embedding_near_pairs — 0.9 separates the tight
    # groups (intra ~0.999) from cross-group (~0) in this fixture
    thr = 0.9
    out = semantic_dedup_sharded(
        tiny, n_shards=1, k_per_shard=1, n_iters=2, threshold=thr
    ).collect()
    got = {r.vec_id: (r.n_dupped_by, r.keep) for r in out}

    # k=1 puts everything in one cluster: verdicts equal global brute force
    data = {r.vec_id: [float(x) for x in r.embedding] for r in tiny.collect()}
    for i, vi in data.items():
        expect = sum(
            1 for j, vj in data.items() if j < i and _cos(vi, vj) >= thr
        )
        assert got[i] == (expect, expect == 0), f"id {i}"


def test_threshold_floor_matches_flat_semantic_dedup(spark, tiny):
    """The sharded variant must agree with semantic_dedup on the SAME
    threshold value (similarity floor) when sharding is degenerate
    (one shard, one cluster vs flat k=1) — pins the verdict-rule parity
    the docstring claims."""
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup,
        semantic_dedup_sharded,
    )

    for thr in (0.5, 0.97):
        flat = {
            r.vec_id: r.keep
            for r in semantic_dedup(tiny, k=1, n_iters=1, threshold=thr).collect()
        }
        sharded = {
            r.vec_id: r.keep
            for r in semantic_dedup_sharded(
                tiny, n_shards=1, k_per_shard=1, n_iters=1, threshold=thr
            ).collect()
        }
        assert flat == sharded, f"threshold={thr}"


def test_every_id_exactly_once_and_shard_bounded(spark, tiny):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded,
    )

    out = semantic_dedup_sharded(tiny, n_shards=3, k_per_shard=2).collect()
    ids = sorted(r.vec_id for r in out)
    assert ids == [3, 7, 10, 15, 20, 99]
    assert all(0 <= r.shard < 3 for r in out)
    # shard routing is md5-derived, so rerouting must be stable
    again = semantic_dedup_sharded(tiny, n_shards=3, k_per_shard=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_rows_per_shard_sizing_via_count(spark, tiny):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded,
    )

    # 6 rows / rows_per_shard=2 -> 3 shards chosen internally; every row
    # still verdicted exactly once
    out = semantic_dedup_sharded(tiny, rows_per_shard=2, k_per_shard=1).collect()
    assert sorted(r.vec_id for r in out) == [3, 7, 10, 15, 20, 99]
    assert len({r.shard for r in out}) <= 3


def test_cross_shard_duplicates_survive_by_design(spark):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded,
    )

    # two identical vectors forced into different shards (n_shards large
    # enough that md5 routing separates them -> both keep): the documented
    # trade of the sharded shape
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = semantic_dedup_sharded(df, n_shards=64, k_per_shard=1).collect()
    by_id = {r.vec_id: r for r in out}
    if by_id[1].shard != by_id[2].shard:
        assert by_id[1].keep and by_id[2].keep
    else:  # md5 collision into one shard: normal rule applies
        assert by_id[1].keep and not by_id[2].keep


def test_second_pass_catches_cross_shard_duplicate(spark):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded,
        semantic_dedup_sharded_multipass,
    )

    # build a duplicate pair that pass 1 (seed=0) routes to DIFFERENT
    # shards, found by probing the deterministic md5 routing
    def shards(df, n_shards, seed):
        out = semantic_dedup_sharded(
            df, n_shards=n_shards, k_per_shard=1, seed=seed
        ).collect()
        return {r.vec_id: r.shard for r in out}

    pair = None
    base = [(i, [1.0, 0.0]) for i in range(1, 40)]
    df_all = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    s0 = shards(df_all, 2, 0)
    s1 = shards(df_all, 2, 1)
    for i in range(1, 40):
        for j in range(i + 1, 40):
            if s0[i] != s0[j] and s1[i] == s1[j]:
                pair = (i, j)
                break
        if pair:
            break
    assert pair, "md5 routing never separated-then-joined any pair"

    df = spark.createDataFrame(
        [(pair[0], [1.0, 0.0]), (pair[1], [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    one = {r.vec_id: r.keep for r in semantic_dedup_sharded(
        df, n_shards=2, k_per_shard=1, seed=0
    ).collect()}
    assert one == {pair[0]: True, pair[1]: True}  # pass 1 misses it

    two = {r.vec_id: (r.keep, r.pass_dropped) for r in
           semantic_dedup_sharded_multipass(
               df, n_passes=2, n_shards=2, k_per_shard=1
           ).collect()}
    assert two[pair[0]] == (True, None)
    assert two[pair[1]] == (False, 1)  # caught by the seed=1 pass


def test_multipass_keeps_every_id_once(spark, tiny):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded_multipass,
    )

    out = semantic_dedup_sharded_multipass(
        tiny, n_passes=3, n_shards=2, k_per_shard=2
    ).collect()
    assert sorted(r.vec_id for r in out) == [3, 7, 10, 15, 20, 99]
    for r in out:
        assert r.keep == (r.pass_dropped is None)


def test_string_ids_work_end_to_end(spark):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded,
    )

    df = spark.createDataFrame(
        [("docA", [1.0, 0.0]), ("docB", [1.0, 0.0]), ("docZ", [0.0, 1.0])],
        "vec_id string, embedding array<float>",
    )
    out = semantic_dedup_sharded(df, n_shards=1, k_per_shard=1).collect()
    by_id = {r.vec_id: r.keep for r in out}
    # "lower id" = lexicographic for strings: docA keeps, docB dups it
    assert by_id == {"docA": True, "docB": False, "docZ": True}


def test_multipass_accepts_caller_seed(spark, tiny):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded_multipass,
    )

    out = semantic_dedup_sharded_multipass(
        tiny, n_passes=2, n_shards=2, k_per_shard=1, seed=7
    ).collect()
    assert sorted(r.vec_id for r in out) == [3, 7, 10, 15, 20, 99]


def test_null_vectors_are_dropped_not_crashed(spark):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.99, 0.01])],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup_sharded(df, n_shards=1, k_per_shard=1).collect()
    assert sorted(r.vec_id for r in out) == [1, 3]  # null row excluded
    by_id = {r.vec_id: r.keep for r in out}
    assert by_id == {1: True, 3: False}  # dedup still ran on the rest


def test_plan_is_one_shuffle_plus_grouped_pandas(spark, tiny):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded,
    )

    plan = (
        semantic_dedup_sharded(tiny, n_shards=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time python


# ---- r9: recall as a knob (collision model, geometry planner, LSH bridge) --


def test_expected_missed_frac_matches_r8_measurements():
    """The model the planner solves must reproduce the MEASURED quality
    rows (SEMDEDUP_QUALITY_r08.json: n=20000, rows_per_shard=1000 ⇒ S=20,
    10-member replica families). Model is documented slightly
    conservative at higher pass counts (survivor re-sharding shrinks
    effective S)."""
    from etl_edi_data_scrapper_spark.functions.clustering import (
        expected_missed_frac,
    )

    measured = {1: 0.7818, 2: 0.6159, 3: 0.4817}
    for p, obs in measured.items():
        model = expected_missed_frac(20, p, 10)
        assert abs(model - obs) < 0.03, (p, model, obs)
    # edges
    assert expected_missed_frac(1, 1, 10) == 0.0  # one shard = exact
    assert expected_missed_frac(50, 1, 1) == 0.0  # no true duplicates
    assert expected_missed_frac(50, 1, 2) == pytest.approx(0.98)  # q^1


def test_expected_missed_frac_monotonicity():
    from etl_edi_data_scrapper_spark.functions.clustering import (
        expected_missed_frac,
    )

    # more shards miss more; more passes miss less; bigger families easier
    assert expected_missed_frac(40, 2, 10) > expected_missed_frac(10, 2, 10)
    assert expected_missed_frac(20, 3, 10) < expected_missed_frac(20, 1, 10)
    assert expected_missed_frac(20, 2, 20) < expected_missed_frac(20, 2, 3)


def test_plan_shard_geometry_meets_target_and_bounds():
    from etl_edi_data_scrapper_spark.functions.clustering import (
        expected_missed_frac,
        plan_shard_geometry,
    )

    n, fam, target = 200_000, 10, 0.10
    rows_per_shard, n_passes = plan_shard_geometry(
        n, fam, target, max_rows_per_shard=50_000
    )
    assert rows_per_shard <= 50_000
    S = -(-n // rows_per_shard)
    assert expected_missed_frac(S, n_passes, fam) <= target
    # maximality: one more shard (smaller shards) would overshoot the
    # target at this pass count UNLESS the memory bound was what bound us
    if rows_per_shard < 50_000:
        assert expected_missed_frac(S + 1, n_passes, fam) > target


def test_plan_shard_geometry_unreachable_raises():
    from etl_edi_data_scrapper_spark.functions.clustering import (
        plan_shard_geometry,
    )

    with pytest.raises(ValueError, match="bridge"):
        # pairs (f=2) at 1 pass with tiny shards can't reach 1% missed
        plan_shard_geometry(
            10_000_000, 2, 0.01, max_rows_per_shard=1_000, max_passes=1
        )


def test_plan_shard_geometry_single_shard_when_it_fits():
    from etl_edi_data_scrapper_spark.functions.clustering import (
        plan_shard_geometry,
    )

    # f=2 at p=1: any S>=2 misses >= 50% — but the corpus fits one shard
    rows_per_shard, n_passes = plan_shard_geometry(
        5_000, 2, 0.10, max_rows_per_shard=10_000, max_passes=1
    )
    assert (rows_per_shard, n_passes) == (5_000, 1)


def test_estimate_family_size_replica_families(spark):
    from etl_edi_data_scrapper_spark.functions.clustering import (
        estimate_family_size,
    )

    # 20 families x 8 near-identical replicas in 16 dims
    rows = []
    for fam in range(20):
        base = [1.0 if d == fam % 16 else 0.1 * ((fam * 7 + d) % 5) for d in range(16)]
        for r in range(8):
            rows.append(
                (fam * 8 + r, [x + 0.0005 * ((r + d) % 3) for d, x in enumerate(base)])
            )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    est = estimate_family_size(df)
    assert 5.0 <= est <= 8.5  # boundary-plane splits bias low, never high


def test_bridge_catches_cross_shard_duplicate(spark):
    """The geometry knob's partner: a duplicate pair routed to DIFFERENT
    shards in every pass must still be dropped by the LSH bridge
    (pass_dropped = -1), with the subset property intact."""
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded,
        semantic_dedup_sharded_multipass,
    )

    # find a pair the seed=0 single pass separates (probing md5 routing)
    base = [(i, [1.0, 0.0]) for i in range(1, 40)]
    df_all = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    s0 = {
        r.vec_id: r.shard
        for r in semantic_dedup_sharded(
            df_all, n_shards=2, k_per_shard=1, seed=0
        ).collect()
    }
    pair = next(
        (i, j)
        for i in range(1, 40)
        for j in range(i + 1, 40)
        if s0[i] != s0[j]
    )
    df = spark.createDataFrame(
        [(pair[0], [1.0, 0.0]), (pair[1], [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    no_bridge = {
        r.vec_id: r.keep
        for r in semantic_dedup_sharded_multipass(
            df, n_passes=1, n_shards=2, k_per_shard=1
        ).collect()
    }
    assert no_bridge == {pair[0]: True, pair[1]: True}  # the geometric miss

    bridged = {
        r.vec_id: (r.keep, r.pass_dropped)
        for r in semantic_dedup_sharded_multipass(
            df, n_passes=1, n_shards=2, k_per_shard=1, bridge_tables=2
        ).collect()
    }
    assert bridged[pair[0]] == (True, None)
    assert bridged[pair[1]] == (False, -1)  # caught by the bridge


def test_bridge_no_false_drops(spark):
    """Bridge drops are exact-cosine verified: a corpus with NO near
    duplicates must survive untouched even if LSH buckets collide."""
    from etl_edi_data_scrapper_spark.functions.clustering import (
        semantic_dedup_sharded_multipass,
    )

    rows = [
        (i, [1.0 if d == i else 0.0 for d in range(8)]) for i in range(8)
    ]  # pairwise orthogonal
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_sharded_multipass(
        df, n_passes=1, n_shards=4, k_per_shard=1, threshold=0.9,
        bridge_tables=2,
    ).collect()
    assert sorted(r.vec_id for r in out) == list(range(8))
    assert all(r.keep for r in out)


def test_auto_target_sizes_geometry(spark, tiny):
    """target_missed_frac wires the planner end-to-end: the call must run,
    emit every id exactly once, and (checked via the planner directly)
    choose a geometry whose model missed_frac meets the target."""
    from etl_edi_data_scrapper_spark.functions.clustering import (
        expected_missed_frac,
        plan_shard_geometry,
        semantic_dedup_sharded_multipass,
    )

    out = semantic_dedup_sharded_multipass(
        tiny, target_missed_frac=0.05, family_size_hint=3, threshold=0.9,
        k_per_shard=1,
    ).collect()
    assert sorted(r.vec_id for r in out) == [3, 7, 10, 15, 20, 99]
    # the tiny frame fits one shard, so the verdict is exact: both
    # higher-id members of the two tight families drop
    keeps = {r.vec_id: r.keep for r in out}
    assert keeps == {3: True, 7: False, 10: False, 15: True, 20: False, 99: True}

    rows_per_shard, p = plan_shard_geometry(1_000_000, 8, 0.05)
    S = -(-1_000_000 // rows_per_shard)
    assert expected_missed_frac(S, p, 8) <= 0.05


def test_bridge_pair_recall_matches_lsh_model(spark):
    """The bridge's recall claim is a formula — 1 − (1 − a^planes)^tables
    with a = 1 − θ/π per plane — and must be MEASURED, not asserted:
    near-identical replicas (a ≈ 0.996) collide almost surely, but
    borderline pairs (cos just over the threshold) are where LSH recall
    genuinely bites. Build 300 pairs at cos ≈ 0.92 in random directions
    and check the measured collision fraction against the model."""
    import math
    import random

    from etl_edi_data_scrapper_spark.functions.clustering import (
        cross_shard_bridge_pairs,
    )

    rng = random.Random(11)
    dim, target_cos = 16, 0.92
    rows = []
    n_pairs = 300
    for i in range(n_pairs):
        a = [rng.gauss(0, 1) for _ in range(dim)]
        na = math.sqrt(sum(x * x for x in a))
        a = [x / na for x in a]
        # b = cosθ·a + sinθ·o for a unit o ⟂ a → exact target cosine
        o = [rng.gauss(0, 1) for _ in range(dim)]
        dot = sum(x * y for x, y in zip(a, o))
        o = [y - dot * x for x, y in zip(a, o)]
        no = math.sqrt(sum(x * x for x in o))
        o = [x / no for x in o]
        s = math.sqrt(1 - target_cos**2)
        b = [target_cos * x + s * y for x, y in zip(a, o)]
        rows.append((2 * i, a))
        rows.append((2 * i + 1, b))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    n_planes, n_tables = 12, 2
    pairs = cross_shard_bridge_pairs(
        df, threshold=0.9, n_planes=n_planes, n_tables=n_tables, max_block=None
    ).collect()
    # count only the planted pairs (random cross-pairs at dim 16 can
    # occasionally clear 0.9 — they are true positives, not noise)
    planted = sum(1 for r in pairs if r.b == r.a + 1 and r.a % 2 == 0)
    a_plane = 1 - math.acos(target_cos) / math.pi
    model = 1 - (1 - a_plane**n_planes) ** n_tables
    got = planted / n_pairs
    # binomial σ ≈ sqrt(p(1−p)/300) ≈ 0.029 at p≈0.5 — allow 4σ
    assert abs(got - model) < 0.12, (got, model)
    # and every emitted pair is exact-verified: precision structural
    assert all(r.cosine >= 0.9 for r in pairs)
