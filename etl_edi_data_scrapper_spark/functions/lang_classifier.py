"""Trained language identification — the fasttext-lid-shaped upgrade of
`text.lang_id`'s stopword-dictionary argmax (r13 verdict #4: the
dictionary CASE was the weakest stage vs real pipelines; CCNet ships
fasttext lid.176, a linear classifier over character n-gram features).

Public method, Spark-first shape:

  * features are hashed CHARACTER TRIGRAM bucket counts (char n-grams
    are the standard lid feature family — they see morphology and
    diacritics where a token dictionary sees only exact stopwords),
    densified to a fixed-length array per document by the same
    explode + per-doc-groupBy convention as `quality_classifier.featurize`;
  * the model is a MULTICLASS integer perceptron (Crammer/Singer-style
    mistake-driven update: predict by argmax, on a mistake add the
    feature vector to the true class and subtract it from the predicted
    class);
  * scoring and training are RELATIONAL: the feature array posexplodes
    ONCE into (id, pos, count) rows (bias riding a constant-1 slot at
    position B, persisted across epochs), each epoch broadcast-joins the
    K·(B+1)-row weight frame, hash-aggregates per-(doc, class) scores,
    argmaxes with a min-struct((−s), class) — (score desc, class asc)
    ties, bit-identical to the SQL oracle's row_number — and reduces the
    mistake gradient to ≤ K·(B+1) driver rows. One job and three small
    hash-agg shuffles per epoch, zero Python, zero higher-order
    expressions (a literal zip_with fold evaluated interpreted and
    ~3×/row under CollapseProject; an unrolled 64-term sum blew up
    codegen/JIT — measured 3.3 s and 9+ s per epoch respectively vs
    ~0.3 s relational at sf0.1).

Everything is INTEGER arithmetic (counts are longs, updates add/subtract
counts) — bit-exact across engines and partitionings, so the epochs
unroll into plain SQL for the DuckDB oracle exactly like
`quality_classifier`'s binary perceptron (`suite._clf_ctes`), with a
class dimension added (`suite._lang_clf_ctes`). At 100 TB:
featurization is one explode shuffle over the corpus, each epoch's
shuffles carry at most corpus-nnz rows into bounded hash aggregates,
and the model state at the driver is K·(B+1) ints. A real deployment
fits on a labeled SAMPLE (labels come from annotation or an upstream
model) and scores the corpus — the fit input is whatever labeled frame
the caller passes, nothing here scans more than it is given.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark.functions.importance import hashed_bucket


def char_trigram_featurize(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, features) — dense length-``n_buckets`` array of hashed char
    ``n``-gram counts over the RAW text (spaces included: token
    boundaries are themselves a language signal). Texts shorter than
    ``n`` contribute themselves as their single (short) gram, and NULL
    text contributes the '' gram — every doc gets a feature row (absent
    rows would silently drop docs through downstream inner joins)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    grams = docs.select(
        F.col(id_col),
        F.explode(F.transform(idx, lambda i: t.substr(i, F.lit(n)))).alias(
            "gram"
        ),
    )
    counts = (
        grams.select(
            id_col, hashed_bucket(F.col("gram"), n_buckets).alias("bucket")
        )
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


def char_trigram_bucket_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_buckets: int = 64,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """(id[, *extra], bucket, tf) — the SPARSE form of
    `char_trigram_featurize`: same grams, same hash, same counts, without
    the dense-array build (map_from_entries + a 64-slot element_at
    transform per doc measured ~2.5 s of the featurize wall at sf0.1 —
    the r14 optimization round removed it from the fit/score hot path;
    the dense form remains for the distributed trainer). Zero-count
    buckets are absent, which is exactly `_exploded_counts`'s c != 0
    contract. Every doc yields at least one gram row (NULL text counts
    the '' gram), so no doc is lost downstream."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    grams = docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra],
        F.explode(F.transform(idx, lambda i: t.substr(i, F.lit(n)))).alias(
            "gram"
        ),
    )
    return (
        grams.select(
            id_col,
            *extra,
            hashed_bucket(F.col("gram"), n_buckets).alias("bucket"),
        )
        .groupBy(id_col, *extra, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _score_corpus_grouped(
    docs: DataFrame,
    w: dict[str, list[int]],
    b: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    pred_col: str = "lang_clf_pred",
    score_col: str = "lang_clf_score",
) -> DataFrame:
    """Score RAW documents in ONE hash aggregate: each gram row
    contributes w_cls[bucket] per class (Σ_grams w[bucket(g)] ==
    Σ_buckets tf·w[bucket] — the same integer sum the dense dot product
    computes), summed per doc with the per-class weight vector inlined
    as an element_at over a literal array (codegen, no join, no K-way
    row blowup), bias added as a literal, argmax by array_sort of
    (−score, class) structs — (score desc, class asc) ties, identical
    to `_argmax`. Replaces [posexplode → broadcast join ×K → two hash
    aggregates] with [explode → one hash aggregate]: 5.9 s → 0.8 s at
    sf0.1 for the full featurize+score pipeline, result-identical
    (pinned by test)."""
    langs = sorted(w)
    n_buckets = len(w[langs[0]]) if langs else 0
    t = F.coalesce(F.col(text_col), F.lit(""))
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    bk = docs.select(
        F.col(id_col),
        F.explode(F.transform(idx, lambda i: t.substr(i, F.lit(n)))).alias(
            "gram"
        ),
    ).select(id_col, hashed_bucket(F.col("gram"), n_buckets).alias("bucket"))
    # one parsed expression per class: the per-element F.lit loop cost a
    # py4j round trip per weight (K×64 per plan build) — the parsed tree
    # is identical (same element_at over a long-array literal; parity
    # pinned by the sparse==dense test)
    aggs = [
        F.expr(
            "sum(element_at(array("
            + ",".join(f"{int(v)}L" for v in w[lg])
            + "), CAST(bucket + 1 AS INT)))"
        ).alias(f"__s_{i}")
        for i, lg in enumerate(langs)
    ]
    sc = bk.groupBy(id_col).agg(*aggs)
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-(F.col(f"__s_{i}") + F.lit(int(b[lg])))).alias("ns"),
                    F.lit(lg).alias("cls"),
                )
                for i, lg in enumerate(langs)
            ]
        )
    )[0]
    return sc.select(
        F.col(id_col),
        ranked["cls"].alias(pred_col),
        (-ranked["ns"]).cast("long").alias(score_col),
    )


def _exploded_counts(feat: DataFrame, id_col: str, *extra: str) -> DataFrame:
    """(id, [*extra,] pos, c) — the dense feature array posexploded with
    the constant-1 bias slot appended at position B; zero counts dropped
    (they contribute 0 to every integer sum — exact). The relational
    currency of both training and scoring."""
    return feat.select(
        F.col(id_col),
        *[F.col(c) for c in extra],
        F.posexplode(
            F.array_append("features", F.lit(1).cast("long"))
        ).alias("pos", "c"),
    ).filter(F.col("c") != 0)


def _weights_df(spark, w: dict[str, list[int]], b: dict[str, int]):
    """The model as a dense K·(B+1)-row (cls, pos, w) frame (bias at
    pos B). DENSE on purpose: the scoring inner-join must produce a row
    for every (doc, class) — the all-zero epoch-1 model still has to
    score every class 0, identically to the SQL unroll."""
    rows = []
    for cls in sorted(w):
        for pos, wv in enumerate(w[cls]):
            rows.append((cls, pos, int(wv)))
        rows.append((cls, len(w[cls]), int(b[cls])))
    return spark.createDataFrame(rows, "cls string, pos int, w long")


def _scores(exploded: DataFrame, w_df: DataFrame, id_col: str) -> DataFrame:
    """(id, cls, s): per-(doc, class) integer scores — one broadcast
    join + one hash aggregate; every doc gets all K classes because the
    weight frame is dense and every doc carries the bias slot."""
    return (
        exploded.join(F.broadcast(w_df), "pos")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.col("c") * F.col("w")).alias("s"))
    )


def _argmax(scores: DataFrame, id_col: str) -> DataFrame:
    """(id, pred, best): argmax class with (score desc, class asc) ties
    — min of struct(−s, cls), the aggregate form of the oracle's
    row_number ORDER BY s DESC, cls ASC."""
    m = F.min(F.struct((-F.col("s")).alias("ns"), F.col("cls"))).alias("m")
    return scores.groupBy(id_col).agg(m).select(
        id_col,
        F.col("m.cls").alias("pred"),
        (-F.col("m.ns")).cast("long").alias("best"),
    )


def multiclass_perceptron_fit(
    feat: DataFrame,
    langs: list[str],
    label_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    n_epochs: int = 2,
) -> tuple[dict[str, list[int]], dict[str, int]]:
    """Multiclass (Crammer/Singer-style) integer perceptron over
    (id, features, label) rows: per epoch every doc is scored for all K
    classes, predicted by argmax (ties → language code asc — all-zero
    epoch-1 scores predict the first code for everyone, which IS the
    algorithm, identically in the SQL unroll), and every mistake
    contributes +counts to its true class and −counts to the predicted
    class (bias rides the constant-1 slot). One collect job per epoch,
    ≤ K·(B+1) rows to the driver. Returns ({lang: weights},
    {lang: bias}) — Python ints, bit-exact.

    Rows whose label is not in ``langs`` are excluded from the fit (the
    oracle's replica excludes them identically)."""
    spark = feat.sparkSession
    exploded = _exploded_counts(
        feat.filter(F.col(label_col).isin(list(langs))), id_col, label_col
    ).persist()
    w = {lg: [0] * n_buckets for lg in langs}
    b = {lg: 0 for lg in langs}
    labels = exploded.select(id_col, label_col).distinct()
    for _ in range(int(n_epochs)):
        pred = _argmax(
            _scores(exploded.select(id_col, "pos", "c"), _weights_df(spark, w, b), id_col),
            id_col,
        )
        mis = pred.join(labels, id_col).filter(
            F.col(label_col) != F.col("pred")
        )
        deltas = mis.select(
            F.col(id_col),
            F.explode(
                F.array(
                    F.struct(
                        F.col(label_col).alias("cls"),
                        F.lit(1).cast("long").alias("sign"),
                    ),
                    F.struct(
                        F.col("pred").alias("cls"),
                        F.lit(-1).cast("long").alias("sign"),
                    ),
                )
            ).alias("u"),
        ).select(id_col, "u.cls", "u.sign")
        grad = (
            deltas.join(exploded.select(id_col, "pos", "c"), id_col)
            .groupBy("cls", "pos")
            .agg(F.sum(F.col("sign") * F.col("c")).alias("g"))
            .collect()
        )
        for r in grad:
            if r["pos"] == n_buckets:
                b[r["cls"]] += int(r["g"])
            else:
                w[r["cls"]][r["pos"]] += int(r["g"])
    exploded.unpersist()
    return w, b


def multiclass_classify(
    feat: DataFrame,
    w: dict[str, list[int]],
    b: dict[str, int],
    id_col: str = "doc_id",
    pred_col: str = "lang_clf_pred",
    score_col: str = "lang_clf_score",
) -> DataFrame:
    """(id, pred, winning integer score — the perceptron margin
    surrogate, same convention as `quality_classifier.classify`'s
    `clf_score`) for EVERY row of ``feat``, labeled or not. Broadcast
    join + two hash aggregates; the corpus text never moves."""
    spark = feat.sparkSession
    exploded = _exploded_counts(feat, id_col)
    out = _argmax(_scores(exploded, _weights_df(spark, w, b), id_col), id_col)
    return out.select(
        F.col(id_col),
        F.col("pred").alias(pred_col),
        F.col("best").alias(score_col),
    )


def np_multiclass_fit(
    x, y_idx, langs: list[str], n_epochs: int = 2
) -> tuple[dict[str, list[int]], dict[str, int]]:
    """The SAME batch multiclass perceptron as
    `multiclass_perceptron_fit`, run driver-resident on an int64 numpy
    matrix (``x`` (n, B+1) WITH the constant-1 bias column appended;
    ``y_idx`` indexes into lang-asc ``langs``). Integer matmul and
    scatter-adds are exact, np.argmax takes the FIRST maximum — with
    columns in lang-asc order that is precisely the (score desc, class
    asc) tiebreak — so the returned model is bit-identical to the
    distributed fit and to the SQL unroll (pinned by test). This is the
    `kmeans_fit`/`opq_train` bounded-driver-model discipline: the fit
    input is a capped sample, never the corpus."""
    import numpy as np

    x = np.asarray(x, dtype=np.int64)
    y_idx = np.asarray(y_idx, dtype=np.int64)
    k = len(langs)
    W = np.zeros((k, x.shape[1]), dtype=np.int64)
    for _ in range(int(n_epochs)):
        s = x @ W.T
        pred = s.argmax(axis=1)
        mask = pred != y_idx
        if mask.any():
            g = np.zeros_like(W)
            np.add.at(g, y_idx[mask], x[mask])
            np.subtract.at(g, pred[mask], x[mask])
            W += g
    return (
        {lg: [int(v) for v in W[i, :-1]] for i, lg in enumerate(langs)},
        {lg: int(W[i, -1]) for i, lg in enumerate(langs)},
    )


def fit_lang_classifier(
    docs: DataFrame,
    langs: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    n_buckets: int = 64,
    n_epochs: int = 2,
    max_fit_rows: int = 65536,
    return_model: bool = False,
) -> DataFrame:
    """Pipeline form: fit DRIVER-RESIDENT (`np_multiclass_fit`) on the
    ``max_fit_rows`` labeled docs whose md5(id) sorts lowest — the
    deterministic bounded training sample, `opq_train`'s discipline;
    fasttext-lid likewise trains on a fixed labeled set, never the
    corpus — then score EVERY document distributed. Returns
    (id, lang_clf_pred, lang_clf_score). The oracle unroll
    (`suite._lang_clf_ctes`) replicates the cap with a
    row_number-over-md5 CTE, so parity holds at ANY corpus size, not
    just while the cap doesn't bind. ``return_model=True`` returns
    ``(scored, (w, b))`` so the trained model can be persisted
    (`save_lang_model`) and reused without refitting.

    r14 optimization (result-identical, pinned by test): the sample ids
    are picked by a TakeOrdered over the RAW labeled docs, and only
    those docs are featurized for the fit — as sparse (id, bucket, tf)
    triplets densified driver-side in numpy (the batch perceptron is
    row-order-independent, so densification order is immaterial) —
    while scoring runs `_score_corpus_grouped`'s single hash aggregate
    over the corpus grams. This drops the dense-array featurization,
    the localCheckpoint materialization, and the K-way scoring join
    from the hot path (text_quality's lang legs: ~3.5 s → ~1.5 s at
    sf0.1), and at scale featurizes only the bounded sample for the
    fit instead of the whole corpus."""
    import numpy as np

    langs = sorted(langs)
    sample_ids = (
        docs.filter(F.col(label_col).isin(langs))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(max_fit_rows)
        .select(F.col(id_col), F.col(label_col))
    )
    # Arrow transfer + vectorized densify (r14): the row-at-a-time
    # .collect() of the (id, label, bucket, tf) triplets was ~2.3 s of
    # every plan build at sf0.1 (≈300k pickled rows); toPandas rides the
    # session's Arrow path and the scatter-assign densification is one
    # numpy op. Row mapping is pandas.factorize's first-occurrence order
    # — the same assignment the old dict loop made — and the batch
    # perceptron is row-order independent regardless, so the model is
    # bit-identical (pinned by the sparse==dense parity test).
    trip = char_trigram_bucket_counts(
        docs.select(F.col(id_col), F.col(text_col)).join(
            F.broadcast(sample_ids), on=id_col
        ),
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        extra=(label_col,),
    ).toPandas()
    if len(trip):
        import pandas as pd

        lang_pos = {lg: i for i, lg in enumerate(langs)}
        codes, _uniques = pd.factorize(trip[id_col])
        n_docs = len(_uniques)
        # first occurrence of each code 0..n_docs-1 carries the doc's label
        _, first_row = np.unique(codes, return_index=True)
        y_idx = np.asarray(
            [lang_pos[v] for v in trip[label_col].to_numpy()[first_row]],
            dtype=np.int64,
        )
        x = np.zeros((n_docs, n_buckets + 1), dtype=np.int64)
        x[:, n_buckets] = 1
        x[codes, trip["bucket"].to_numpy()] = trip["tf"].to_numpy()
        w, b = np_multiclass_fit(x, y_idx, langs, n_epochs=n_epochs)
    else:
        w = {lg: [0] * n_buckets for lg in langs}
        b = {lg: 0 for lg in langs}
    scored = _score_corpus_grouped(
        docs, w, b, id_col=id_col, text_col=text_col
    )
    return (scored, (w, b)) if return_model else scored


def save_lang_model(
    spark, path: str, w: dict, b: dict, n_buckets: int, n: int = 3
) -> None:
    """Persist a trained multiclass language model as a JSON sidecar
    (r14, the `quality_classifier.save_model` convention): all-integer
    weights make the round trip bit-exact. Records the featurization
    geometry (trigram ``n``, ``n_buckets``) so scoring cannot silently
    run under a different hash space than training."""
    import json

    from etl_edi_data_scrapper_spark.fsutil import write_text_atomic

    write_text_atomic(spark, path, json.dumps({
        "kind": "multiclass_integer_perceptron_v1",
        "w": {c: [int(v) for v in ws] for c, ws in w.items()},
        "b": {c: int(v) for c, v in b.items()},
        "n_buckets": int(n_buckets),
        "n": int(n),
    }, sort_keys=True))


def load_lang_model(spark, path: str) -> tuple[dict, dict, int, int]:
    """(w, b, n_buckets, n) from `save_lang_model`'s sidecar; loud
    refusal on absence or a different model kind."""
    import json

    from etl_edi_data_scrapper_spark.fsutil import read_text

    raw = read_text(spark, path)
    if raw is None:
        raise FileNotFoundError(f"no language model at {path}")
    d = json.loads(raw)
    if d.get("kind") != "multiclass_integer_perceptron_v1":
        raise ValueError(
            f"{path}: expected kind 'multiclass_integer_perceptron_v1', "
            f"got {d.get('kind')!r}"
        )
    w = {c: [int(v) for v in ws] for c, ws in d["w"].items()}
    b = {c: int(v) for c, v in d["b"].items()}
    return w, b, int(d["n_buckets"]), int(d["n"])


def classify_lang_corpus(
    docs: DataFrame,
    w: dict,
    b: dict,
    n_buckets: int,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score RAW documents with an already-trained (possibly loaded)
    language model: featurize under the model's recorded geometry +
    classify, zero training jobs — via `_score_corpus_grouped`'s single
    hash aggregate (result-identical to the dense
    featurize + `multiclass_classify` path, pinned by test). Returns
    (id, lang_clf_pred, lang_clf_score). ``n_buckets`` is taken from the
    model's weight vectors; the argument is kept for signature
    compatibility and cross-checked."""
    langs = sorted(w)
    if langs and len(w[langs[0]]) != n_buckets:
        raise ValueError(
            f"model has {len(w[langs[0]])} buckets, caller says {n_buckets}"
        )
    return _score_corpus_grouped(
        docs, w, b, id_col=id_col, text_col=text_col, n=n
    )
