"""Exact BPE token counting (functions/bpe.py) vs an independent
pure-Python reference on a fixture vocabulary, plus the packing hook."""

import random

import pytest


@pytest.fixture()
def merges_file(tmp_path):
    p = tmp_path / "merges.txt"
    p.write_text(
        "#version: fixture\n"
        "l o\n"
        "lo w\n"
        "e r\n"
        "Ġ l\n"
        "low er\n"
    )
    return str(p)


def test_load_merges_keeps_hash_rules_and_survives_crlf(tmp_path):
    """Only the FIRST '#' line is a header: real GPT-2 tables contain
    '#'-starting MERGE rules (the '##' token), and CRLF checkouts must
    not leave \\r glued to second symbols (which silently kills every
    merge)."""
    from etl_edi_data_scrapper_spark.functions.bpe import (
        bpe_count_text,
        load_merges,
    )

    p = tmp_path / "merges_crlf.txt"
    p.write_bytes(b"#version: 0.2\r\n# #\r\nl o\r\nlo w\r\n")
    ranks = load_merges(str(p))
    assert ranks == {("#", "#"): 0, ("l", "o"): 1, ("lo", "w"): 2}
    # the '#'-rule fires: '###' -> ['##', '#'] = 2 tokens, not 3
    assert bpe_count_text("###", ranks) == 2
    # and the CRLF-read rules fire at all (the \r bug left counts raw)
    assert bpe_count_text("low", ranks) == 1


def test_bytes_to_unicode_is_a_printable_bijection():
    from etl_edi_data_scrapper_spark.functions.bpe import bytes_to_unicode

    enc = bytes_to_unicode()
    assert len(enc) == 256
    assert len(set(enc.values())) == 256  # bijection
    assert enc[ord("a")] == "a" and enc[ord("!")] == "!"  # printable: identity
    assert enc[32] == chr(256 + 32)  # space -> the Ġ-style remap


def test_merge_loop_on_the_classic_example(merges_file):
    from etl_edi_data_scrapper_spark.functions.bpe import (
        bpe_count_text,
        bpe_segment_tokens,
        bytes_to_unicode,
        load_merges,
    )

    ranks = load_merges(merges_file)
    assert ranks[("l", "o")] == 0 and ranks[("low", "er")] == 4
    enc = bytes_to_unicode()
    # "lower": l o w e r -> lo -> low -> er -> lower (rank-4 merge fires)
    assert bpe_segment_tokens("lower", ranks, enc) == ["lower"]
    assert bpe_segment_tokens("low", ranks, enc) == ["low"]
    assert bpe_segment_tokens("wel", ranks, enc) == ["w", "e", "l"]
    # " lower" (pre-tokenizer keeps the leading space): Ġ l o w e r ->
    # (l,o) wins over (Ġ,l) by rank -> Ġ low er -> Ġ lower (rank 4);
    # no (Ġ,lower) merge exists -> 2 tokens
    assert bpe_count_text("lower lower", ranks) == 1 + 2
    assert bpe_count_text("", ranks) == 0


def _naive_bpe(segment: str, ranks, enc) -> int:
    """Independent reference: recursively split at the LAST-applied merge
    — equivalent formulation of the merge loop (greedy lowest-rank-first
    merging is order-independent in outcome for a fixed rank table when
    applied exhaustively via best-pair selection)."""
    word = [enc[b] for b in segment.encode("utf-8")]
    changed = True
    while changed and len(word) > 1:
        best_rank, best_pos = None, None
        for i, pair in enumerate(zip(word, word[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pos = r, i
        changed = best_pos is not None
        if changed:
            word = (
                word[:best_pos]
                + [word[best_pos] + word[best_pos + 1]]
                + word[best_pos + 2 :]
            )
    return len(word)


def test_randomized_parity_with_independent_reference(merges_file):
    import re

    from etl_edi_data_scrapper_spark.functions.bpe import (
        _PRETOKEN_RE,
        bpe_count_text,
        bytes_to_unicode,
        load_merges,
    )

    rng = random.Random(23)
    enc = bytes_to_unicode()
    # random rank table over a small alphabet (incl. multi-char results)
    syms = ["l", "o", "w", "e", "r", "s", "t", "Ġ"]
    ranks = {}
    for a in syms:
        for b in syms:
            if rng.random() < 0.3:
                ranks[(a, b)] = len(ranks)
    ranks[("lo", "w")] = len(ranks)
    ranks[("er", "s")] = len(ranks)

    for _ in range(200):
        text = " ".join(
            "".join(rng.choice("lowerst") for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(1, 6))
        )
        want = sum(
            _naive_bpe(seg, ranks, enc) for seg in re.findall(_PRETOKEN_RE, text)
        )
        assert bpe_count_text(text, ranks) == want, text


def test_distributed_counts_match_driver_side(spark, merges_file):
    from etl_edi_data_scrapper_spark.functions.bpe import (
        bpe_count_text,
        bpe_token_count_exact,
        load_merges,
    )

    rows = [
        (0, "lower lower low"),
        (1, "wel wel lower"),
        (2, ""),
        (3, "numbers 123 and punct!?"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_count_exact(df, merges=merges_file).collect()
    }
    ranks = load_merges(merges_file)
    for i, t in rows:
        assert got[i] == bpe_count_text(t, ranks), (i, t)


def test_exact_count_bounds_the_jvm_approximation(spark, merges_file):
    """The JVM fast path counts pre-tokenizer segments; the merge stage
    only splits WITHIN segments, so exact >= approximate, always."""
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.bpe import bpe_token_count_exact
    from etl_edi_data_scrapper_spark.functions.text import bpe_token_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    both = bpe_token_count_exact(docs, merges=merges_file).withColumn(
        "approx", bpe_token_count("text")
    )
    assert both.filter(F.col("n_bpe_tokens") < F.col("approx")).count() == 0


def test_packing_accepts_tokenizer(spark, merges_file):
    from etl_edi_data_scrapper_spark.functions.bpe import (
        bpe_count_text,
        load_merges,
    )
    from etl_edi_data_scrapper_spark.functions.packing import pack_by_token_budget

    rows = [(i, "lower low wel" * (i + 1)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = {
        r.doc_id: r.n_tokens
        for r in pack_by_token_budget(
            df, budget=8, shards=2, tokenizer=merges_file
        ).collect()
    }
    ranks = load_merges(merges_file)
    for i, t in rows:
        assert packed[i] == bpe_count_text(t, ranks)
    # default path unchanged: whitespace counts
    ws = {
        r.doc_id: r.n_tokens
        for r in pack_by_token_budget(df, budget=8, shards=2).collect()
    }
    assert ws[0] == len(rows[0][1].split(" "))


def test_load_merges_diagnoses_malformed_lines(tmp_path):
    """A corrupt rule raises a ValueError naming file and line, not an
    opaque unpacking traceback; space-padded and blank lines parse."""
    import pytest

    from etl_edi_data_scrapper_spark.functions.bpe import load_merges

    ok = tmp_path / "padded.txt"
    ok.write_text("#version: x\nl o   \n   \nlo w\n")
    assert load_merges(str(ok)) == {("l", "o"): 0, ("lo", "w"): 1}

    bad = tmp_path / "corrupt.txt"
    bad.write_text("#version: x\nl o\na b c\n")
    with pytest.raises(ValueError, match=r"corrupt\.txt:3"):
        load_merges(str(bad))


def test_pretokenizer_keeps_last_space_glued_to_word():
    """GPT-2's `\\s+(?!\\S)` rule: a multi-space run keeps its LAST space
    attached to the following word ('a  b' -> ['a', ' ', ' b'])."""
    import re

    from etl_edi_data_scrapper_spark.functions.bpe import _PRETOKEN_RE

    assert re.findall(_PRETOKEN_RE, "a  b") == ["a", " ", " b"]
    assert re.findall(_PRETOKEN_RE, "a   b") == ["a", "  ", " b"]
    assert re.findall(_PRETOKEN_RE, "a b") == ["a", " b"]
    assert re.findall(_PRETOKEN_RE, "a  ") == ["a", "  "]


def test_gate_vocab_closed_form_matches_merge_loop(spark):
    """The pack_sequences oracle counts PACK_GATE_BPE_RANKS merges in
    closed form (bytes - n('er') - n(' t') - n('ers')); that identity
    holds only on a [a-z ]-only corpus with disjoint occurrence sets —
    pin BOTH facts against the real testdata and the real merge loop."""
    import re

    from etl_edi_data_scrapper_spark.functions.bpe import bpe_count_text
    from etl_edi_data_scrapper_spark.suite import PACK_GATE_BPE_RANKS

    rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "text"
    ).collect()
    assert rows
    for r in rows:
        t = r.text
        assert not re.search(r"[^a-z ]", t), "corpus alphabet changed"
        closed = (
            len(t.encode("utf-8"))
            - len(re.findall("er", t))
            - len(re.findall(" t", t))
            - len(re.findall("ers", t))
        )
        assert bpe_count_text(t, PACK_GATE_BPE_RANKS) == closed


def test_gate_vocab_closed_form_randomized():
    """Same identity under random [a-z ] strings — including adversarial
    'erer'/'ers'/'eers' overlaps the corpus may not contain."""
    import random
    import re

    from etl_edi_data_scrapper_spark.functions.bpe import bpe_count_text
    from etl_edi_data_scrapper_spark.suite import PACK_GATE_BPE_RANKS

    rng = random.Random(10)
    pieces = ["er", "ers", "erer", "eers", " t", " ter", "ters", "e", "r",
              "s", "t", " ", "table", "stream"]
    for _ in range(300):
        t = "".join(rng.choice(pieces) for _ in range(rng.randint(0, 20)))
        closed = (
            len(t.encode("utf-8"))
            - len(re.findall("er", t))
            - len(re.findall(" t", t))
            - len(re.findall("ers", t))
        )
        assert bpe_count_text(t, PACK_GATE_BPE_RANKS) == closed, repr(t)


def _naive_learn(texts, n_merges, min_count):
    """Independent Sennrich-2016 reference over the word histogram."""
    import re
    from collections import Counter

    from etl_edi_data_scrapper_spark.functions.bpe import bytes_to_unicode
    from etl_edi_data_scrapper_spark.functions.text import BPE_SPLIT_PATTERN

    # JVM pattern -> stdlib re (the trainer segments JVM-side)
    pat = BPE_SPLIT_PATTERN.replace(r"\p{L}", "[^\\W\\d_]").replace(
        r"\p{N}", "\\d"
    ).replace(r"[^\s\p{L}\p{N}]", "(?:[^\\w\\s]|_)")
    enc = bytes_to_unicode()
    segs = Counter()
    for t in texts:
        segs.update(re.findall(pat, t))
    hist = Counter()
    for seg, n in segs.items():
        if n >= min_count:
            hist[tuple(enc[b] for b in seg.encode("utf-8"))] += n
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, n in hist.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < max(min_count, 1):
            break
        merges.append(best)
        nh = Counter()
        for w, n in hist.items():
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nh[tuple(out)] += n
        hist = nh
    return merges


def test_learn_bpe_merges_matches_independent_reference(spark):
    from etl_edi_data_scrapper_spark.functions.bpe import learn_bpe_merges

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low lower newer newest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = learn_bpe_merges(df, n_merges=12, min_count=2)
    want = _naive_learn(texts, 12, 2)
    assert got == want and len(got) > 0
    # determinism across a different partitioning
    got2 = learn_bpe_merges(df.repartition(7), n_merges=12, min_count=2)
    assert got2 == got


def test_learned_merges_feed_the_exact_counter(spark):
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.bpe import (
        bpe_token_count_exact,
        learn_bpe_merges,
    )

    texts = ["low lower lowest"] * 4 + ["newer newest new"] * 4
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = learn_bpe_merges(df, n_merges=8, min_count=2)
    ranks = {pair: r for r, pair in enumerate(merges)}
    with_m = bpe_token_count_exact(df, merges=ranks).collect()
    no_m = bpe_token_count_exact(df, merges={}).collect()
    # merges strictly compress a corpus they were learned on
    assert sum(r.n_bpe_tokens for r in with_m) < sum(r.n_bpe_tokens for r in no_m)


def test_learn_bpe_merges_driver_state_guard(spark):
    import pytest

    from etl_edi_data_scrapper_spark.functions.bpe import learn_bpe_merges

    df = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i}") for i in range(30)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="min_count"):
        learn_bpe_merges(df, n_merges=4, min_count=1, max_words=10)


def test_jvm_segment_count_matches_real_pretokenizer(spark):
    """The RE2-safe JVM approximation (BPE_SPLIT_PATTERN + the signed
    BPE_SPLIT_COUNT_FIXES terms) counts EXACTLY the segments of the real
    GPT-2 pre-tokenizer — including the `\\s+(?!\\S)` rule RE2 cannot
    express. Its count effect decomposes into three lookahead-free terms
    (see text.py); pinned three ways on a whitespace-heavy code/markdown
    fixture plus a 20k-string fuzz: the stdlib-re exact pre-tokenizer vs
    the Spark expression vs the DuckDB rendering the oracle uses (r10
    verdict nit #2). \\x0b is exercised on the python/Spark legs only:
    RE2's \\s class omits it (documented oracle-side gap; the gate
    corpus is ASCII text without vertical tabs)."""
    import random
    import re

    import duckdb

    from etl_edi_data_scrapper_spark.functions.bpe import _PRETOKEN_RE
    from etl_edi_data_scrapper_spark.functions.text import (
        BPE_SPLIT_COUNT_FIXES,
        BPE_SPLIT_PATTERN,
        bpe_token_count,
    )

    def py_fixes(fixes):
        # stdlib re has no \p{L}: render the letter class by hand
        return [(p.replace(r"\p{L}", "[^\\W\\d_]"), sign) for p, sign in fixes]

    fixture = (
        "def f(x):\n\tif x:\n\t\treturn x*2\n# header\n\n"
        "| a | b |\n|---|---|\nrow   \t\nmixed \t mix\t\tend  's  'store 'll"
    )
    random.seed(11)
    alphabet = [
        "ab", "1", ".", "'s", "'ll", "'d", "s", "'", " ", "\t", "\n",
        "\r", "\x0b", "\f", "  ", "\t ",
    ]
    cases = [fixture] + [
        "".join(random.choice(alphabet) for _ in range(random.randint(0, 12)))
        for _ in range(20000)
    ]
    # 1) pure-python: approximation + signed corrections == exact
    # segmentation (the stdlib-re rendering of the approximation is
    # _PRETOKEN_RE minus its lookahead alternative — a plain \p-class
    # replace would corrupt the negated punct class)
    approx_re = _PRETOKEN_RE.replace(r"\s+(?!\S)|", "")
    assert approx_re != _PRETOKEN_RE  # the lookahead alternative was there
    fixes_py = py_fixes(BPE_SPLIT_COUNT_FIXES)
    for s in cases:
        exact = len(re.findall(_PRETOKEN_RE, s))
        got = len(re.findall(approx_re, s)) + sum(
            sign * len(re.findall(p, s)) for p, sign in fixes_py
        )
        assert got == exact, repr(s)
    # 2) the Spark expression and 3) the DuckDB oracle rendering agree
    # with the exact count on the fixture + a sample of the fuzz corpus
    sample = cases[:300]
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sample)], "i long, text string"
    ).select("i", bpe_token_count("text").alias("n"))
    got_spark = {r.i: r.n for r in sdf.collect()}
    pat = BPE_SPLIT_PATTERN.replace("'", "''")
    fixes_sql = " ".join(
        f"{'+' if sign > 0 else '-'} len(regexp_extract_all(?, "
        f"'{p.replace(chr(39), chr(39) * 2)}'))"
        for p, sign in BPE_SPLIT_COUNT_FIXES
    )
    con = duckdb.connect()
    n_fix = len(BPE_SPLIT_COUNT_FIXES)
    for i, s in enumerate(sample):
        exact = len(re.findall(_PRETOKEN_RE, s))
        assert got_spark[i] == exact, repr(s)
        if "\x0b" in s:
            continue  # RE2 \s omits \x0b — documented oracle-side gap
        (got_duck,) = con.execute(
            f"SELECT len(regexp_extract_all(?, '{pat}')) {fixes_sql}",
            [s] * (1 + n_fix),
        ).fetchone()
        assert got_duck == exact, repr(s)


def test_greedy_merges_incremental_matches_naive_on_random_histograms():
    """r12: the incremental pair-count loop (`_greedy_merges`, inverted
    index + lazy-deletion heap) is BIT-IDENTICAL to the naive full-
    recompute loop on randomized word histograms — including overlap
    counting ('aaa' holds TWO (a,a) pairs but one greedy replacement),
    (count desc, lex) tie-breaks, and the min_count stop. Hypothesis
    drives word shapes, counts, and merge budgets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_edi_data_scrapper_spark.functions.bpe import _greedy_merges

    def naive(hist, n_merges, min_count):
        hist = dict(hist)
        merges = []
        for _ in range(n_merges):
            pairs = {}
            for w, n in hist.items():
                for i in range(len(w) - 1):
                    p = (w[i], w[i + 1])
                    pairs[p] = pairs.get(p, 0) + n
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if pairs[best] < max(min_count, 1):
                break
            merges.append(best)
            nh = {}
            for w, n in hist.items():
                out, i = [], 0
                while i < len(w):
                    if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                        out.append(w[i] + w[i + 1])
                        i += 2
                    else:
                        out.append(w[i])
                        i += 1
                nh[tuple(out)] = nh.get(tuple(out), 0) + n
            hist = nh
        return merges

    word = st.lists(
        st.sampled_from("abc"), min_size=1, max_size=8
    ).map(tuple)
    hists = st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(
        hist=hists,
        n_merges=st.integers(1, 20),
        min_count=st.integers(0, 4),
    )
    def check(hist, n_merges, min_count):
        assert _greedy_merges(dict(hist), n_merges, min_count) == naive(
            hist, n_merges, min_count
        )

    check()


def test_save_merges_roundtrip_and_cli_learn_bpe(spark, sf_dir, tmp_path, capsys):
    """r14: the learn→persist→reuse ladder step. save_merges writes
    standard GPT-2 merges.txt (header + rank-ordered rules) that
    load_merges reads back identically — local AND Hadoop-FS atomic
    paths — and the `learn-bpe` CLI produces an artifact the exact
    counter consumes with identical counts to the in-memory table."""
    from etl_edi_data_scrapper_spark.__main__ import main
    from etl_edi_data_scrapper_spark.engine import Engine
    from etl_edi_data_scrapper_spark.functions.bpe import (
        bpe_token_count_exact,
        learn_bpe_merges,
        load_merges,
        save_merges,
    )

    texts = ["low lower lowest"] * 4 + ["newer newest new"] * 4
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = learn_bpe_merges(df, n_merges=8, min_count=2)
    ranks = {pair: r for r, pair in enumerate(merges)}

    p_local = str(tmp_path / "merges_local.txt")
    save_merges(merges, p_local)
    assert load_merges(p_local) == ranks
    assert open(p_local).readline().startswith("#version")

    p_fs = str(tmp_path / "merges_fs.txt")
    save_merges(ranks, p_fs, spark=spark)  # dict form + Hadoop FS write
    assert load_merges(p_fs) == ranks

    with pytest.raises(ValueError, match="unwritable"):
        save_merges([("a b", "c")], str(tmp_path / "bad.txt"))

    out = str(tmp_path / "merges_cli.txt")
    eng = Engine(spark=spark)
    assert main(
        ["learn-bpe", "--docs", f"{sf_dir}/documents.parquet",
         "--output", out, "--n-merges", "24"],
        engine=eng,
    ) == 0
    assert "SUCCESS: BPE merges learned | Rules: 24" in capsys.readouterr().out
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from_file = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_count_exact(docs, merges=out).collect()
    }
    learned = learn_bpe_merges(docs, n_merges=24)
    in_mem = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_count_exact(
            docs, merges={p: r for r, p in enumerate(learned)}
        ).collect()
    }
    assert from_file == in_mem
