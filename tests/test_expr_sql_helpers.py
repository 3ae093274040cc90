"""r14 optimization: SQL-text builders replace per-element py4j Column-DSL
construction (one round trip per literal). These pin the parsed expressions
against their DSL reference forms — values must match exactly, including
adversarial string content and the hex-word integer fold."""

from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark.functions.hashing import (
    hex_val,
    hex_val_sql,
    hex_word,
    hex_word_sql,
    str_array_sql,
)


def test_str_array_sql_escaping_and_unicode(spark):
    words = ("it's", 'a "b"', "back\\slash", "的", "plain", "semi;colon")
    row = (
        spark.range(1)
        .select(
            F.expr(str_array_sql(words)).alias("n"),
            F.array(*[F.lit(w) for w in words]).alias("o"),
        )
        .first()
    )
    assert list(row.n) == list(row.o) == list(words)


def test_hex_word_sql_matches_dsl_fold(spark):
    df = spark.range(200).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )
    got = df.select(
        hex_word(F.col("h"), 1).alias("o1"),
        F.expr(hex_word_sql("h", 1)).alias("n1"),
        hex_word(F.col("h"), 9).alias("o9"),
        F.expr(hex_word_sql("h", 9)).alias("n9"),
        hex_val(F.substring("h", 3, 1)).alias("ov"),
        F.expr(hex_val_sql("substring(h, 3, 1)")).alias("nv"),
    ).collect()
    for r in got:
        assert r.o1 == r.n1 and r.o9 == r.n9 and r.ov == r.nv
        assert 0 <= r.n1 < 2**32


def test_text_helpers_sql_match_dsl_bitexact(spark):
    """r15: lang_id / quality_features / quality_score column-NAME forms
    parse to value-identical expressions vs the Column-DSL forms —
    including doubles compared bit-exactly and adversarial texts (empty,
    single token, unicode stopwords, ties between language scores)."""
    import math
    import struct

    from etl_edi_data_scrapper_spark.functions.text import (
        lang_id,
        quality_features,
        quality_score,
    )

    texts = [
        "the quick brown fox and the lazy dog is in it",
        "der la le 的 el the und est y",  # cross-language tie bait
        "one",
        "",
        "a a a a a a a a",
        "el la los las y es en un",
        "的 是 在 了 和 有 我 不",
        "x " * 500,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    fd = quality_features(F.col("text"))
    fs = quality_features("text")
    rows = df.select(
        lang_id(F.col("text")).alias("l_dsl"),
        lang_id("text").alias("l_sql"),
        quality_score(F.col("text")).alias("q_dsl"),
        quality_score("text").alias("q_sql"),
        *[fd[k].alias(f"d_{k}") for k in fd],
        *[fs[k].alias(f"s_{k}") for k in fs],
    ).collect()

    def bits(x):
        if x is None:
            return None
        if isinstance(x, float):
            return struct.pack("<d", x)
        return x

    for r in rows:
        assert r.l_dsl == r.l_sql
        assert bits(r.q_dsl) == bits(r.q_sql)
        for k in fd:
            assert bits(r[f"d_{k}"]) == bits(r[f"s_{k}"]), k
