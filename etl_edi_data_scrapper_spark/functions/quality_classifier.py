"""Model-based quality filtering — the fasttext-style linear classifier
step of LLM data pipelines (GPT-3, LLaMA, RedPajama: score every crawl
document by "does it look like the reference corpus", keep high scorers).

Spark-first shape, same iterative discipline as `clustering.kmeans_fit`:

  * features are hashed unigram bucket counts (`importance.hashed_bucket`
    — the DSIR feature hash, so one featurization convention serves both
    selection families), densified to a fixed-length array per document:
    one explode shuffle + one per-doc groupBy, computed ONCE and reused
    by every epoch;
  * the model (B weights + bias) lives on the DRIVER between epochs; each
    scoring pass embeds it as a literal array, so scoring is a single
    NARROW projection (zip_with dot product) — no join, no UDF;
  * one shuffle per epoch: misclassified docs posexplode their feature
    array and the per-bucket gradient reduces with map-side combine to at
    most B rows, collected to the driver (bounded by B, never by N).

Everything is INTEGER arithmetic — counts are longs, the batch-perceptron
update (w += lr·Σ_mis y·count) never divides and never touches a float —
so training is bit-exact across engines and partitionings: the epochs
unroll into plain SQL for the DuckDB oracle with no quantization step and
no transcendental hazard (contrast `importance.py`'s micro-nat logs).
Fixed epoch count, no early-stop: an epoch with no misclassifications is
a zero gradient, i.e. a no-op, identically in both engines.

The perceptron is the classic mistake-driven linear fit (Rosenblatt 1958;
fasttext's supervised mode is the same hashed-bag linear family). For the
weak-label setup the registered leg uses (reference-source docs = +1,
rest = −1), linear separability is not assumed — a fixed epoch budget
just yields the best-effort linear scorer, like one epoch of fasttext.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark.functions.importance import hashed_bucket


def featurize(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, features) — dense length-``n_buckets`` array of hashed
    unigram counts. One explode shuffle + one per-doc groupBy; the dense
    form makes every later epoch a narrow zip_with, never a join."""
    counts = (
        docs.select(
            F.col(id_col),
            # NULL text must still yield a feature row (the '' token):
            # explode(split(NULL)) emits nothing, which would silently
            # drop the doc through every downstream inner join
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            ).alias("tok"),
        )
        .select(id_col, hashed_bucket(F.col("tok"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        counts.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "tf"))
            ).alias("__m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("features"),
        )
    )


def _score(w: list[int], bias: int):
    # one parsed expression: the per-element F.lit loop cost a py4j round
    # trip per weight, rebuilt every epoch (seconds of pure driver chatter
    # across a fit) — the parsed tree is identical (same zip_with fold,
    # same long discipline; parity pinned by the model tests)
    arr = "array(" + ",".join(f"{int(x)}L" for x in w) + ")"
    return F.expr(
        f"aggregate(zip_with(features, {arr}, (c, wv) -> c * wv), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v) + {int(bias)}L"
    )


def perceptron_fit(
    feat: DataFrame,
    label_col: str = "y",
    n_buckets: int = 64,
    n_epochs: int = 3,
    lr: int = 1,
) -> tuple[list[int], int]:
    """Batch perceptron over (features, y ∈ {+1,−1}) rows: per epoch,
    every misclassified doc (y·score ≤ 0 — zero-init counts as a miss)
    contributes y·count to its buckets' gradients; w += lr·grad. Returns
    (weights, bias), all Python ints. The epoch loop re-reads ``feat``
    n_epochs times — persist it; lineage resets every epoch because the
    model round-trips through the driver."""
    feat = feat.persist()
    w = [0] * n_buckets
    bias = 0
    for _ in range(int(n_epochs)):
        mis = feat.withColumn("__s", _score(w, bias)).filter(
            F.col(label_col) * F.col("__s") <= 0
        )
        # bias-as-feature: a constant-1 slot appended at position B makes
        # the bias gradient (Σ_mis y) fall out of the SAME per-bucket
        # aggregation — one job per epoch instead of two scoring passes
        grad = (
            mis.select(
                F.col(label_col).alias("__y"),
                F.posexplode(
                    F.array_append("features", F.lit(1).cast("long"))
                ).alias("pos", "c"),
            )
            .groupBy("pos")
            .agg(F.sum(F.col("__y") * F.col("c")).alias("g"))
            .collect()
        )
        for r in grad:
            if r["pos"] == n_buckets:
                bias += lr * int(r["g"])
            else:
                w[r["pos"]] += lr * int(r["g"])
    feat.unpersist()
    return w, bias


def classify(
    feat: DataFrame, w: list[int], bias: int, score_col: str = "clf_score"
) -> DataFrame:
    """feat + integer margin score + keep verdict (score > 0). Narrow
    projection — the fitted model is a literal, classification adds zero
    shuffles to whatever plan carries the features."""
    return feat.withColumn(score_col, _score(w, bias)).withColumn(
        "clf_keep", F.col(score_col) > 0
    )


def fit_reference_classifier(
    docs: DataFrame,
    reference_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    n_epochs: int = 3,
    target_keep: float | None = None,
    return_model: bool = False,
) -> DataFrame:
    """The pipeline form: label docs matching ``reference_pred`` (a
    Column predicate — e.g. source == 'wiki') +1, the rest −1, fit, and
    return (id, clf_score, clf_keep) for EVERY document. This is the
    GPT-3/LLaMA-style weak-label setup: the reference corpus is the
    positive class and the classifier generalizes its surface statistics
    to unseen crawl docs.

    ``target_keep`` (r14, measured-auto): instead of the fixed
    ``score > 0`` cutoff — whose keep fraction is whatever the margin
    distribution happens to give — pick the threshold as the exact
    (1 − target_keep) quantile of the scored corpus, so the stage keeps
    ~``target_keep`` of documents by construction (the LLaMA-style
    "keep the best X%" budget). One extra 1-row aggregate over the
    already-scored frame (``percentile``, exact — integer scores make
    it cheap and deterministic); keep stays ``score > threshold`` with
    the strict inequality, so ties at the cut score drop together and
    the realized fraction lands ≤ target within one tie-group.

    ``return_model=True`` returns ``(scored, (w, bias))`` so the
    trained model can be persisted (`save_model`) and applied to new
    corpora (`classify_corpus`) without refitting."""
    feat = featurize(docs, id_col=id_col, text_col=text_col, n_buckets=n_buckets)
    labeled = feat.join(
        docs.select(
            F.col(id_col),
            F.when(reference_pred, F.lit(1)).otherwise(F.lit(-1)).alias("__y"),
        ),
        on=id_col,
    )
    # the epochs AND the final scoring both consume the featurization —
    # cut the lineage so classify() reuses it instead of re-exploding
    labeled = labeled.localCheckpoint(eager=False)
    w, bias = perceptron_fit(
        labeled, label_col="__y", n_buckets=n_buckets, n_epochs=n_epochs
    )
    scored = classify(labeled, w, bias)
    if target_keep is not None:
        if not 0.0 < target_keep < 1.0:
            raise ValueError(
                f"target_keep must be in (0, 1), got {target_keep}"
            )
        thr = scored.agg(
            F.expr(
                f"percentile(clf_score, {1.0 - target_keep})"
            ).alias("t")
        ).first()["t"]
        scored = scored.withColumn(
            "clf_keep", F.col("clf_score") > F.lit(float(thr))
        )
    scored = scored.select(id_col, "clf_score", "clf_keep")
    return (scored, (w, bias)) if return_model else scored


def save_model(spark, path: str, w: list, bias: int, n_buckets: int) -> None:
    """Persist a trained binary perceptron as a JSON sidecar (r14 — the
    learn→persist→reuse step `save_merges` gave the tokenizer): the
    model is K+1 INTEGERS, so the round trip is bit-exact by
    construction. Written atomically through the Hadoop FS (any
    scheme); `load_model` refuses files of a different kind rather than
    silently mis-shaping weights."""
    import json

    from etl_edi_data_scrapper_spark.fsutil import write_text_atomic

    write_text_atomic(spark, path, json.dumps({
        "kind": "integer_perceptron_v1",
        "w": [int(v) for v in w],
        "bias": int(bias),
        "n_buckets": int(n_buckets),
    }, sort_keys=True))


def load_model(spark, path: str) -> tuple[list, int, int]:
    """(w, bias, n_buckets) from `save_model`'s sidecar; loud refusal on
    a missing file or a different model kind."""
    import json

    from etl_edi_data_scrapper_spark.fsutil import read_text

    raw = read_text(spark, path)
    if raw is None:
        raise FileNotFoundError(f"no classifier model at {path}")
    d = json.loads(raw)
    if d.get("kind") != "integer_perceptron_v1":
        raise ValueError(
            f"{path}: expected kind 'integer_perceptron_v1', "
            f"got {d.get('kind')!r}"
        )
    return [int(v) for v in d["w"]], int(d["bias"]), int(d["n_buckets"])


def classify_corpus(
    docs: DataFrame,
    w: list,
    bias: int,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score RAW documents with an already-trained (possibly loaded)
    model: featurize + classify, zero training jobs — the deploy path a
    persisted model exists for. Returns (id, clf_score, clf_keep)."""
    feat = featurize(docs, id_col=id_col, text_col=text_col,
                     n_buckets=n_buckets)
    return classify(feat, w, bias).select(id_col, "clf_score", "clf_keep")
