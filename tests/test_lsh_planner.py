"""plan_lsh_bands — the MMDS S-curve (b, r) planner (r14 operator
intelligence: the banding is a measured/closed-form decision, not an
operator guess, the `--opq auto` discipline applied to LSH).

P(s) = 1 − (1 − s^r)^b; the planner minimizes the threshold-weighted
integrated FP/FN error over every (b, r) with b·r ≤ n_hashes. Pure
driver math, so the tests pin it against an independent brute-force
evaluation and the known closed-form inflection (1/b)^(1/r).
"""

from __future__ import annotations

import pytest

from etl_edi_data_scrapper_spark.functions.dedup import (
    minhash_candidate_pairs,
    plan_lsh_bands,
)


def _err(b: int, r: int, t: float, grid_n: int = 1000) -> float:
    """Independent reference: same objective, written from the formula."""
    fp = fn = 0.0
    for i in range(grid_n):
        s = (i + 0.5) / grid_n
        p = 1.0 - (1.0 - s**r) ** b
        if s < t:
            fp += p
        else:
            fn += 1.0 - p
    return 0.5 * (fp + fn) / grid_n


def test_planner_is_argmin_over_all_bandings():
    for n_hashes, t in [(12, 0.5), (12, 0.8), (16, 0.3), (9, 0.6)]:
        plan = plan_lsh_bands(n_hashes, t)
        b, r = plan["bands"], plan["rows"]
        assert 1 <= b <= n_hashes and b * r <= n_hashes
        best = min(
            _err(bb, n_hashes // bb, t) for bb in range(1, n_hashes + 1)
        )
        assert _err(b, r, t) == pytest.approx(best, abs=1e-12)


def test_inflection_tracks_threshold():
    """The chosen curve's inflection (1/b)^(1/r) must move WITH the
    target: a higher threshold needs a steeper/later S-curve."""
    stars = [
        plan_lsh_bands(24, t)["threshold_star"] for t in (0.2, 0.5, 0.8)
    ]
    assert stars == sorted(stars)
    # and each lands in the threshold's neighborhood, not a far corner
    for t, star in zip((0.2, 0.5, 0.8), stars):
        assert abs(star - t) < 0.25


def test_planner_fields_and_validation():
    plan = plan_lsh_bands(12, 0.5)
    assert set(plan) == {
        "bands", "rows", "n_hashes_used", "threshold_star", "fp", "fn"
    }
    assert plan["n_hashes_used"] == plan["bands"] * plan["rows"]
    assert 0.0 <= plan["fp"] <= 1.0 and 0.0 <= plan["fn"] <= 1.0
    with pytest.raises(ValueError):
        plan_lsh_bands(12, 0.0)
    with pytest.raises(ValueError):
        plan_lsh_bands(12, 1.0)
    with pytest.raises(ValueError):
        plan_lsh_bands(0, 0.5)


def test_weights_trade_fp_for_fn():
    """Asymmetric weights move the curve the right way: punishing false
    negatives favors more bands (catch more), punishing false positives
    favors fewer/steeper."""
    recall_plan = plan_lsh_bands(24, 0.5, fp_weight=0.05, fn_weight=0.95)
    precision_plan = plan_lsh_bands(24, 0.5, fp_weight=0.95, fn_weight=0.05)
    assert recall_plan["bands"] >= precision_plan["bands"]
    assert recall_plan["fn"] <= precision_plan["fn"]
    assert recall_plan["fp"] >= precision_plan["fp"]


def test_bands_auto_equals_planned_explicit(spark):
    """`minhash_candidate_pairs(bands="auto", threshold=…)` must produce
    exactly the pairs of the explicitly-planned banding (the auto path
    only substitutes the count; the pipeline is unchanged)."""
    docs = [
        (i, "the quick brown fox jumps over the lazy dog number %d" % (i % 3))
        for i in range(12)
    ] + [(100 + i, f"totally distinct background text {i} {i * 7}") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    planned = plan_lsh_bands(12, 0.5)["bands"]
    auto = sorted(
        (r.a, r.b)
        for r in minhash_candidate_pairs(
            df, n_hashes=12, bands="auto", threshold=0.5
        ).collect()
    )
    explicit = sorted(
        (r.a, r.b)
        for r in minhash_candidate_pairs(
            df, n_hashes=12, bands=planned
        ).collect()
    )
    assert auto == explicit and len(auto) > 0
