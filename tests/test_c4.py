"""C4 line-level cleaning rules (functions/c4.py) vs a pure-Python model."""

import random
import re


def model_c4(text: str, min_words: int = 3, min_sentences: int = 5):
    from etl_edi_data_scrapper_spark.functions.c4 import POLICY_PHRASES

    # lines are [ \t\r]-stripped before the rules run (the published C4
    # recipe strips first; \r\n / trailing-space input fails the terminal
    # punctuation regex otherwise) — and the clean text keeps the strip
    lines = [re.sub(r"^[ \t\r]+|[ \t\r]+$", "", x) for x in text.split("\n")]

    def kept(x: str) -> bool:
        low = x.lower()
        return (
            re.search(r'[.!?"]$', x) is not None
            and len(x.split(" ")) >= min_words
            and "javascript" not in low
            and not any(p in low for p in POLICY_PHRASES)
        )

    k = [x for x in lines if kept(x)]
    keep = (
        "lorem ipsum" not in text.lower()
        and "{" not in text
        and len(k) >= min_sentences
    )
    return (len(lines), len(k), keep, "\n".join(k))


def _spark_c4(spark, texts, **kw):
    from etl_edi_data_scrapper_spark.functions.c4 import add_c4_features

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    return {
        r.doc_id: (r.c4_n_lines, r.c4_n_kept, r.c4_keep, r.c4_clean_text)
        for r in add_c4_features(df, **kw).collect()
    }


def test_c4_handcrafted_rules(spark):
    texts = [
        # every rule on display
        'Good sentence one.\nGood sentence two!\nIs this kept?\nShort.\n'
        'no terminal punct\nHas javascript inline.\nSee our privacy policy.\n'
        'A final "quoted line."\nAnother keeper here.',
        "Lorem Ipsum dolor sit amet.\nFine line one.\nFine line two.\n"
        "Fine line three.\nFine line four.\nFine line five.",   # page: lorem
        "var x = { a: 1 }.\nGood one here.\nGood two here.\n"
        "Good three here.\nGood four here.\nGood five here.",   # page: curly
        "Only two keepers here.\nAnd the second one.",           # < 5 sentences
        "",                                                      # empty page
    ]
    got = _spark_c4(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == model_c4(t), f"doc {i}"
    # doc 0: 9 lines; dropped: 'Short.' (2 words), 'no terminal punct',
    # javascript line, policy line -> 5 kept -> page keep True
    assert got[0][1] == 5 and got[0][2] is True
    assert got[1][2] is False and got[2][2] is False and got[3][2] is False


def test_c4_strips_crlf_and_trailing_space(spark):
    """\\r\\n endings / trailing spaces must not fail the terminal-punct
    rule (the pre-strip C4 bug: every such line silently dropped)."""
    texts = [
        # CRLF-terminated page: split('\n') leaves a trailing \r per line
        "Alpha one keeps fine.\r\nBeta two keeps fine.\r\n"
        "Gamma three keeps fine.\r\nDelta four keeps fine.\r\n"
        "Epsilon five keeps fine.\r\n",
        # trailing spaces / tabs after the period
        "Kept despite spaces one.   \nKept despite tab two.\t\n"
        "  Indented but kept three.\nKept plain four.\nKept plain five.",
    ]
    got = _spark_c4(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == model_c4(t), f"doc {i}: {t!r}"
    assert got[0][1] == 5 and got[0][2] is True  # all five CRLF lines kept
    assert got[1][1] == 5 and got[1][2] is True
    assert "\r" not in got[0][3] and not got[1][3].endswith(" ")


def test_c4_randomized_model_parity(spark):
    rng = random.Random(31)
    frags = [
        "alpha beta gamma.", "delta epsilon", "ok.", "x { y }.",
        "javascript rules here.", "read our Terms of Use.",
        'she said "stop."', "lorem ipsum inside.", "one two three four!",
        "why not?", "tail",
        "trailing spaces keep fine.  ", "carriage return line.\r",
        "\ttab led line stays.", "   ",
    ]
    texts = [
        "\n".join(rng.choice(frags) for _ in range(rng.randint(0, 10)))
        for _ in range(150)
    ]
    got = _spark_c4(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == model_c4(t), f"doc {i}: {t!r}"


def test_c4_zero_shuffle(spark):
    from etl_edi_data_scrapper_spark.functions.c4 import add_c4_features

    df = spark.createDataFrame([(1, "A line here.\nAnother.")], ["doc_id", "text"])
    plan = add_c4_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_c4_badwords_page_rule(spark):
    """The Raffel 2020 bad-words page rule: any blocklisted token
    (case-insensitive, punctuation-trimmed) drops the page."""
    from etl_edi_data_scrapper_spark.functions.c4 import add_c4_badwords

    texts = [
        "a perfectly clean page here.",                  # 0: keep
        "contains badword plainly.",                     # 1: drop
        "hugged by punctuation (Badword.) here.",        # 2: drop (trim+case)
        "substring notabadwordhere stays fine.",         # 3: keep (token-exact)
        "two hits: badword and OBSCENITY together.",     # 4: drop, hits=2
        "line one fine.\nbadword on line two.",          # 5: drop across lines
        "",                                              # 6: keep
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.c4_badword_hits, r.c4_badwords_keep)
        for r in add_c4_badwords(df).collect()
    }
    assert got[0] == (0, True)
    assert got[1] == (1, False)
    assert got[2] == (1, False)
    assert got[3] == (0, True)
    assert got[4] == (2, False)
    assert got[5] == (1, False)
    assert got[6] == (0, True)


def test_c4_badwords_custom_list(spark):
    from etl_edi_data_scrapper_spark.functions.c4 import add_c4_badwords

    df = spark.createDataFrame(
        [(0, "the word zorblax offends this deployment.")], ["doc_id", "text"]
    )
    default = add_c4_badwords(df).collect()[0]
    assert default.c4_badwords_keep  # not on the placeholder list
    custom = add_c4_badwords(df, words=("zorblax",)).collect()[0]
    assert custom.c4_badword_hits == 1 and not custom.c4_badwords_keep


def test_c4_badwords_zero_shuffle(spark):
    from etl_edi_data_scrapper_spark.functions.c4 import (
        add_c4_badwords,
        add_c4_features,
    )

    df = spark.createDataFrame([(1, "A line here.\nAnother.")], ["doc_id", "text"])
    plan = (
        add_c4_badwords(add_c4_features(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_c4_badwords_split_on_all_whitespace(spark):
    """The published filter splits on ALL whitespace — a tab- or
    CR-separated badword must still hit the blocklist (advisor r9: the
    old '[ \\n]+' split never matched 'foo\\tbadword')."""
    from etl_edi_data_scrapper_spark.functions.c4 import add_c4_badwords

    df = spark.createDataFrame(
        [
            (0, "foo\tbadword bar."),
            (1, "foo\r\nbadword bar."),
            (2, "clean\ttext only."),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.c4_badword_hits, r.c4_badwords_keep)
           for r in add_c4_badwords(df).collect()}
    assert got[0] == (1, False)
    assert got[1] == (1, False)
    assert got[2] == (0, True)
