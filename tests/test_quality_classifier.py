"""Integer batch-perceptron quality classifier
(`functions/quality_classifier.py`) — model parity against a pure-Python
reference on a tiny corpus, determinism, and the all-integer contract
that makes the epochs oracle-unrollable without quantization.
"""

import hashlib

import pytest


def _bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _featurize_py(texts: dict, n_buckets: int) -> dict:
    out = {}
    for i, t in texts.items():
        v = [0] * n_buckets
        for tok in t.split(" "):
            v[_bucket(tok, n_buckets)] += 1
        out[i] = v
    return out


def _fit_py(feats, labels, n_buckets, n_epochs, lr=1):
    w, bias = [0] * n_buckets, 0
    for _ in range(n_epochs):
        grad, gb = [0] * n_buckets, 0
        for i, f in feats.items():
            s = bias + sum(c * wv for c, wv in zip(f, w))
            if labels[i] * s <= 0:
                for b, c in enumerate(f):
                    grad[b] += labels[i] * c
                gb += labels[i]
        w = [wv + lr * g for wv, g in zip(w, grad)]
        bias += lr * gb
    return w, bias


TEXTS = {
    1: "the cat sat on the mat",
    2: "the dog ran in the park",
    3: "stock market prices fell sharply today",
    4: "quarterly earnings beat market expectations",
    5: "a cat and a dog play in a park",
    6: "market volatility and earnings pressure prices",
}
LABELS = {1: 1, 2: 1, 5: 1, 3: -1, 4: -1, 6: -1}
B = 16


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in TEXTS.items()], "doc_id long, text string"
    )


def test_featurize_matches_python_hash(spark, docs):
    from etl_edi_data_scrapper_spark.functions.quality_classifier import featurize

    got = {r.doc_id: list(r.features) for r in featurize(docs, n_buckets=B).collect()}
    assert got == _featurize_py(TEXTS, B)


def test_fit_matches_python_reference_exactly(spark, docs):
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.quality_classifier import (
        featurize,
        perceptron_fit,
    )

    feat = featurize(docs, n_buckets=B).withColumn(
        "y",
        F.when(F.col("doc_id").isin([1, 2, 5]), F.lit(1)).otherwise(F.lit(-1)),
    )
    w, bias = perceptron_fit(feat, label_col="y", n_buckets=B, n_epochs=3)
    w_py, bias_py = _fit_py(_featurize_py(TEXTS, B), LABELS, B, 3)
    assert (w, bias) == (w_py, bias_py)  # integers: EXACT, no tolerance


def test_classifier_separates_the_two_topics(spark, docs):
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.quality_classifier import (
        fit_reference_classifier,
    )

    out = fit_reference_classifier(
        docs, F.col("doc_id").isin([1, 2, 5]), n_buckets=B, n_epochs=5
    ).collect()
    verdict = {r.doc_id: r.clf_keep for r in out}
    assert verdict == {1: True, 2: True, 5: True, 3: False, 4: False, 6: False}
    # margin sign defines the verdict — pin the coupling
    for r in out:
        assert r.clf_keep == (r.clf_score > 0)


def test_training_is_deterministic_under_repartition(spark, docs):
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.quality_classifier import (
        featurize,
        perceptron_fit,
    )

    feat = featurize(docs, n_buckets=B).withColumn(
        "y",
        F.when(F.col("doc_id").isin([1, 2, 5]), F.lit(1)).otherwise(F.lit(-1)),
    )
    a = perceptron_fit(feat, label_col="y", n_buckets=B, n_epochs=3)
    b = perceptron_fit(feat.repartition(7), label_col="y", n_buckets=B, n_epochs=3)
    assert a == b  # integer sums are order-independent


def test_null_text_doc_still_gets_a_verdict(spark):
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.quality_classifier import (
        fit_reference_classifier,
    )

    rows = [(i, t) for i, t in TEXTS.items()] + [(99, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = fit_reference_classifier(
        docs, F.col("doc_id").isin([1, 2, 5]), n_buckets=B, n_epochs=2
    ).collect()
    # the NULL-text doc must not vanish through the feature inner joins
    assert sorted(r.doc_id for r in out) == [1, 2, 3, 4, 5, 6, 99]


def test_converged_epoch_is_a_noop(spark, docs):
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.quality_classifier import (
        featurize,
        perceptron_fit,
    )

    feat = featurize(docs, n_buckets=B).withColumn(
        "y",
        F.when(F.col("doc_id").isin([1, 2, 5]), F.lit(1)).otherwise(F.lit(-1)),
    )
    w5 = perceptron_fit(feat, label_col="y", n_buckets=B, n_epochs=5)
    w9 = perceptron_fit(feat, label_col="y", n_buckets=B, n_epochs=9)
    # this corpus separates within 5 epochs; extra epochs must change nothing
    assert w5 == w9


from hypothesis import given, settings, strategies as st

_WORD = st.sampled_from(
    ["cat", "dog", "park", "market", "earnings", "prices", "the", "a", "x1"]
)
_DOC = st.lists(_WORD, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(_DOC, min_size=2, max_size=10),
    st.integers(min_value=1, max_value=40),
)
def test_fit_parity_property(spark, texts, n_pos):
    """Property: Spark's integer perceptron equals the pure-python model
    EXACTLY on arbitrary small corpora and label splits — integer
    arithmetic leaves no tolerance to hide behind."""
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.quality_classifier import (
        featurize,
        perceptron_fit,
    )

    texts_d = {i + 1: t for i, t in enumerate(texts)}
    labels = {i: (1 if i <= n_pos else -1) for i in texts_d}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts_d.items()], "doc_id long, text string"
    )
    feat = featurize(docs, n_buckets=B).withColumn(
        "y",
        F.when(F.col("doc_id") <= n_pos, F.lit(1)).otherwise(F.lit(-1)),
    )
    got = perceptron_fit(feat, label_col="y", n_buckets=B, n_epochs=2)
    want = _fit_py(_featurize_py(texts_d, B), labels, B, 2)
    assert got == want


def test_target_keep_budget_threshold(spark):
    """r14: `target_keep` swaps the fixed score>0 cutoff for the exact
    (1-target) percentile — realized keep fraction lands at/under the
    budget (strict > drops whole tie-groups), the cut is a clean
    threshold (min kept score > max dropped score), and the default
    path is untouched."""
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.quality_classifier import (
        fit_reference_classifier,
    )

    rows = [(i, "market earnings prices " * (1 + i % 3)) for i in range(10)]
    rows += [(100 + i, "cats dogs parks trees " * (1 + i % 4)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = F.col("doc_id") >= 100

    out = fit_reference_classifier(
        docs, ref, n_buckets=B, n_epochs=5, target_keep=0.25
    ).collect()
    kept = [r.clf_score for r in out if r.clf_keep]
    dropped = [r.clf_score for r in out if not r.clf_keep]
    assert 0 < len(kept) <= 5  # 25% of 20, ties can only shrink it
    assert min(kept) > max(dropped)

    # default path: verdict is still the sign cutoff
    base = fit_reference_classifier(docs, ref, n_buckets=B, n_epochs=5).collect()
    for r in base:
        assert r.clf_keep == (r.clf_score > 0)

    with pytest.raises(ValueError, match="target_keep"):
        fit_reference_classifier(docs, ref, n_buckets=B, target_keep=1.5)


def test_model_persistence_roundtrip_bit_exact(spark, docs, tmp_path):
    """r14 learn→persist→reuse: save_model/load_model round-trip the
    integer model exactly, and classify_corpus under the loaded model
    reproduces the training run's verdicts bit-for-bit; wrong-kind and
    missing files refuse loudly."""
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.quality_classifier import (
        classify_corpus,
        fit_reference_classifier,
        load_model,
        save_model,
    )

    scored, (w, bias) = fit_reference_classifier(
        docs, F.col("doc_id").isin([1, 2, 5]), n_buckets=B, n_epochs=5,
        return_model=True,
    )
    want = {r.doc_id: (r.clf_score, r.clf_keep) for r in scored.collect()}

    path = str(tmp_path / "clf_model.json")
    save_model(spark, path, w, bias, B)
    w2, bias2, nb = load_model(spark, path)
    assert (w2, bias2, nb) == (w, bias, B)
    got = {
        r.doc_id: (r.clf_score, r.clf_keep)
        for r in classify_corpus(docs, w2, bias2, nb).collect()
    }
    assert got == want

    with pytest.raises(FileNotFoundError):
        load_model(spark, str(tmp_path / "absent.json"))
    bad = str(tmp_path / "bad.json")
    save_model(spark, bad, w, bias, B)
    import json as _json

    from etl_edi_data_scrapper_spark.fsutil import read_text, write_text_atomic

    d = _json.loads(read_text(spark, bad))
    d["kind"] = "something_else"
    write_text_atomic(spark, bad + "2", _json.dumps(d))
    with pytest.raises(ValueError, match="kind"):
        load_model(spark, bad + "2")
