"""Operational audit for persisted store layouts (r12 verdict #7).

Three store families grew sidecar conventions — the URL dedup store's
``_canon_meta.json`` (canonicalization regime), streaming checkpoints'
``__incarnation__`` stamp (replay-epoch fencing), and the persisted
ANN index's ``_meta.json`` (encoding flags), and the r14 fit artifacts
(classifier / language models, DSIR ratio tables, unigram / bigram
reference LMs) — each with its own ad-hoc
reader. ``describe_store`` is the one audit surface over all of them:
it identifies the layout, reads the sidecar(s), and counts rows/files,
so operational drift (a legacy regime, a stranded compaction, a
foreign incarnation) is visible from the CLI (``store-info``) before a
mismatched batch refuses at 2 a.m. Unknown layouts REFUSE (a crisp
error beats a half-parsed report that normalizes guessing).

Detection is by the stores' own contracts, not path names:

- ``ivfpq-index``: `_meta.json` beside `centroids/` + `codes/` +
  `codebooks/` (`save_ivfpq_index` layout). Extras: cell count, codes
  per cell min/max, leftover compaction dirs (`codes__precompact` /
  `codes__compacting` — a crashed `ann-compact`).
- ``url-store``: parquet with a `canonical_url` column
  (`screen_batch_against_url_store`). Extras: the idna regime
  (legacy = absent sidecar = idna False by construction), epoch range.
- ``bloom-store``: parquet with `pos` + `incarnation` columns
  (`screen_batch_against_bloom_store`). Extras: incarnations present,
  epoch range (a foreign incarnation in the list is EXPECTED history,
  not corruption — the screen fences by stamp).
- ``neardup-store``: parquet with `band`/`band_key`/doc-id columns
  (`screen_batch_against_store`). Extras: band count, docs.
- ``stream-checkpoint``: a directory carrying the `__incarnation__`
  stamp (plus Spark's own offsets/commits dirs).

Everything reads through the Hadoop FileSystem API (the `fsutil`
discipline) so `hdfs://`/`s3a://` stores audit identically to local
paths.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from etl_edi_data_scrapper_spark import fsutil


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def _data_files(spark: SparkSession, path: str) -> int:
    """Non-hidden data files under ``path``, recursively (the same
    convention as `compact_ivfpq_codes`: names starting with '_' or '.'
    are bookkeeping, not data)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return 0
    n = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
    return n


def _is_file(spark: SparkSession, path: str) -> bool:
    fs, p = fsutil._fs(spark, path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isFile())


def _read_json_sidecar(spark: SparkSession, path: str) -> dict | None:
    import json

    text = fsutil.read_text(spark, path)
    return json.loads(text) if text else None


def _try_parquet(spark: SparkSession, path: str):
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
        df.schema  # force analysis inside the try
        return df
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return None
        raise


def describe_store(spark: SparkSession, path: str) -> dict[str, Any]:
    """One dict describing whatever store lives at ``path`` (see module
    docstring for the families); raises ValueError for layouts none of
    the store contracts match."""
    path = path.rstrip("/")
    out: dict[str, Any] = {"path": path}

    # --- ivfpq index: sidecar + three component dirs -------------------
    if _exists(spark, f"{path}/_meta.json") and all(
        _exists(spark, f"{path}/{d}") for d in ("centroids", "codes", "codebooks")
    ):
        from pyspark.sql import functions as F

        from etl_edi_data_scrapper_spark.functions.similarity import (
            load_ivfpq_meta,
        )

        out["type"] = "ivfpq-index"
        out["meta"] = load_ivfpq_meta(spark, path)
        codes = spark.read.parquet(f"{path}/codes")
        per_cell = codes.groupBy("centroid_id").count().collect()
        out["rows"] = int(sum(r["count"] for r in per_cell))
        out["cells"] = len(per_cell)
        if per_cell:
            counts = sorted(r["count"] for r in per_cell)
            out["codes_per_cell"] = {
                "min": int(counts[0]), "max": int(counts[-1]),
            }
        out["centroid_rows"] = spark.read.parquet(
            f"{path}/centroids"
        ).count()
        cb = spark.read.parquet(f"{path}/codebooks")
        agg = cb.agg(
            F.countDistinct("sub_id").alias("m"),
            F.countDistinct("code_id").alias("n"),
        ).first()
        out["codebook_geometry"] = {"m_sub": agg["m"], "n_codes": agg["n"]}
        out["code_data_files"] = _data_files(spark, f"{path}/codes")
        # quantizer staleness (r13 verdict #5): ann-index records the
        # train-time quantization MSE and every append records its own;
        # the ratio is the FAISS "monitor quantization error" signal —
        # frozen centroids/codebooks degrade silently as appends drift,
        # and past RETRAIN_MSE_RATIO the advisory says rebuild (ann-index
        # again) rather than keep appending into stretched cells.
        qm = out["meta"].get("quant_mse") if isinstance(out["meta"], dict) else None
        if (
            isinstance(qm, dict)
            and qm.get("train")
            and isinstance(qm.get("appended"), dict)
        ):
            from etl_edi_data_scrapper_spark.functions.similarity import (
                RETRAIN_MSE_RATIO,
            )

            ratio = float(qm["appended"]["mse"]) / float(qm["train"])
            out["quant_mse_ratio"] = ratio
            out["retrain_advised"] = ratio > RETRAIN_MSE_RATIO
            out["retrain_mse_ratio_threshold"] = RETRAIN_MSE_RATIO
        leftovers = [
            d
            for d in ("codes__precompact", "codes__compacting")
            if _exists(spark, f"{path}/{d}")
        ]
        if leftovers:
            out["crashed_compaction_dirs"] = leftovers
        return out

    # --- r14 fit artifacts: every one carries a 'kind' ------------------
    # model JSON sidecar files (quality / language classifier) — only
    # attempted when the path IS a file (read_text on a dir raises), and
    # non-JSON file contents just fall through to the refusal
    file_meta = None
    if _is_file(spark, path):
        try:
            file_meta = _read_json_sidecar(spark, path)
        except ValueError:
            file_meta = None
    if isinstance(file_meta, dict) and file_meta.get("kind") in (
        "integer_perceptron_v1", "multiclass_integer_perceptron_v1",
    ):
        out["type"] = (
            "classifier-model"
            if file_meta["kind"] == "integer_perceptron_v1"
            else "lang-classifier-model"
        )
        out["kind"] = file_meta["kind"]
        out["n_buckets"] = file_meta.get("n_buckets")
        if "w" in file_meta and isinstance(file_meta["w"], dict):
            out["classes"] = sorted(file_meta["w"])
        return out

    # DSIR ratio table: _meta.json kind + ratios/ parquet
    dsir_meta = _read_json_sidecar(spark, f"{path}/_meta.json")
    if (
        isinstance(dsir_meta, dict)
        and dsir_meta.get("kind") == "dsir_ratios_v1"
        and _exists(spark, f"{path}/ratios")
    ):
        out["type"] = "dsir-ratios"
        out["meta"] = dsir_meta
        out["buckets_with_evidence"] = spark.read.parquet(
            f"{path}/ratios"
        ).count()
        return out

    # bigram reference LM: uni/ + big/ count tables
    if _exists(spark, f"{path}/uni") and _exists(spark, f"{path}/big"):
        from pyspark.sql import functions as F

        uni = spark.read.parquet(f"{path}/uni")
        big = spark.read.parquet(f"{path}/big")
        if {"term", "ucnt"} <= set(uni.columns) and {
            "prev", "cur", "bcnt"
        } <= set(big.columns):
            out["type"] = "bigram-lm"
            out["terms"] = uni.count()
            out["bigrams"] = big.count()
            out["total_tokens"] = int(
                uni.agg(F.sum("ucnt").alias("t")).first()["t"] or 0
            )
            return out

    # --- ivf-flat index: centroids + assigned, no codes/meta ------------
    if all(
        _exists(spark, f"{path}/{d}") for d in ("centroids", "assigned")
    ) and not _exists(spark, f"{path}/codes"):
        out["type"] = "ivf-index"
        assigned = spark.read.parquet(f"{path}/assigned")
        out["rows"] = assigned.count()
        out["cells"] = assigned.select("centroid_id").distinct().count()
        out["centroid_rows"] = spark.read.parquet(
            f"{path}/centroids"
        ).count()
        out["keeps_float_vectors"] = True  # vs the IVFPQ code store
        out["data_files"] = _data_files(spark, f"{path}/assigned")
        return out

    # --- stream checkpoint: incarnation stamp --------------------------
    stamp = fsutil.read_text(spark, f"{path}/__incarnation__")
    df = _try_parquet(spark, path)
    if stamp is not None and df is None:
        out["type"] = "stream-checkpoint"
        out["incarnation"] = stamp.strip()
        out["has_offsets"] = _exists(spark, f"{path}/offsets")
        out["has_commits"] = _exists(spark, f"{path}/commits")
        return out

    # --- parquet-backed stores, told apart by their contract columns ---
    canon_meta = _read_json_sidecar(spark, f"{path}/_canon_meta.json")
    if df is None and canon_meta is None:
        raise ValueError(
            f"{path!r} matches no known store layout (ivfpq-index, "
            "ivf-index, url-store, bloom-store, neardup-store, "
            "stream-checkpoint, classifier-model, lang-classifier-model, "
            "dsir-ratios, unigram-lm, bigram-lm) — refusing to guess."
        )
    cols = set(df.columns) if df is not None else set()

    from pyspark.sql import functions as F

    if canon_meta is not None or "canonical_url" in cols:
        out["type"] = "url-store"
        out["canon_meta"] = canon_meta if canon_meta is not None else {
            "idna": False,
            "note": "legacy store (no _canon_meta.json) = idna=False "
            "by construction",
        }
        if df is not None:
            out["rows"] = df.count()
            if "epoch" in cols:
                rng = df.agg(
                    F.min("epoch").alias("lo"), F.max("epoch").alias("hi")
                ).first()
                out["epochs"] = {"min": rng["lo"], "max": rng["hi"]}
        else:
            out["rows"] = 0
        out["data_files"] = _data_files(spark, path)
        return out

    if {"pos", "incarnation"} <= cols:
        out["type"] = "bloom-store"
        out["rows"] = df.count()
        incs = [
            r["incarnation"]
            for r in df.select("incarnation").distinct().collect()
        ]
        out["incarnations"] = sorted(
            ("<legacy/null>" if i is None else i) for i in incs
        )
        if "epoch" in cols:
            rng = df.agg(
                F.min("epoch").alias("lo"), F.max("epoch").alias("hi")
            ).first()
            out["epochs"] = {"min": rng["lo"], "max": rng["hi"]}
        out["data_files"] = _data_files(spark, path)
        return out

    if {"band", "band_key"} <= cols:
        out["type"] = "neardup-store"
        out["rows"] = df.count()
        id_cols = [c for c in df.columns if c not in {"band", "band_key"}
                   and not c.startswith("h")]
        out["bands"] = df.select("band").distinct().count()
        if id_cols:
            out["docs"] = df.select(id_cols[0]).distinct().count()
        out["data_files"] = _data_files(spark, path)
        return out

    if cols == {"term", "cnt"}:
        out["type"] = "unigram-lm"
        out["terms"] = df.count()
        out["total_tokens"] = int(
            df.agg(F.sum("cnt").alias("t")).first()["t"] or 0
        )
        out["data_files"] = _data_files(spark, path)
        return out

    raise ValueError(
        f"{path!r} is parquet but matches no known store contract "
        f"(columns: {sorted(cols)}) — refusing to guess."
    )
