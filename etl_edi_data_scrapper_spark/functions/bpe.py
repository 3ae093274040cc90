"""Exact byte-pair-encoding token counts from a public GPT-2-format
merges file — the precision upgrade behind `text.bpe_token_count`'s
JVM-side approximation.

The approximation (pre-tokenizer segment count) upper-bounds and tracks
real BPE counts, but `pack_sequences`/`chunk_documents` budgets are
denominated in tokens a trainer actually SEES: a 2048-token window
packed by segment counts under-fills by however much the merge stage
splits multi-token segments. This module runs the actual merge loop:

  * ``load_merges`` reads the standard merges.txt (one "a b" pair per
    rank line, optional ``#version`` header) — the format every GPT-2 /
    RoBERTa / CLIP vocabulary ships publicly;
  * byte-level alphabet via the public bytes→unicode trick (every byte
    mapped to a printable codepoint, so merges files round-trip as
    text) — identical tables to the GPT-2 reference implementation;
  * ``bpe_token_count_exact`` applies it corpus-wide as an Arrow-batched
    ``mapInPandas`` — the rank table is a plain broadcast variable
    (serialized once per executor, not per batch), the loop is
    per-SEGMENT (segments are words — tens of characters), and the
    output schema is the input plus one long column. This is the
    documented Pandas-UDF slow path, OPTIONAL by design: the default
    everywhere stays the zero-Python JVM approximation.

Pre-tokenization mirrors ``text.BPE_SPLIT_PATTERN`` (the RE2-safe GPT-2
pattern: contraction suffixes | space-prefixed letter runs | digit runs
| punct runs | whitespace runs), expressed in stdlib-``re`` syntax
(Python re has no \\p{L}; ``[^\\W\\d_]`` is the letter class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# stdlib-re rendering of the FULL GPT-2 pre-tokenizer (\p{L} ->
# [^\W\d_], \p{N} -> \d, "neither letter nor digit nor ws" -> [^\w\s]
# plus _), INCLUDING the `\s+(?!\S)` rule the JVM approximation
# (text.BPE_SPLIT_PATTERN) deliberately omits: on a multi-space run the
# real tokenizer keeps the LAST space glued to the following word
# ('a  b' -> ['a', ' ', ' b'], not ['a', '  ', 'b']) — it changes which
# merges fire on whitespace-heavy text (code, markdown). DuckDB's RE2
# has no lookahead, which is why the JVM/oracle approximation cannot
# carry this rule; the exact path is parity-tested, not SQL-oracled.
_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+|\s+(?!\S)|\s+"
)


def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte→printable-codepoint table: printable ASCII
    and Latin-1 blocks map to themselves, the remaining 68 bytes map to
    256+i — a bijection, so merges files are plain text."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def load_merges(path: str) -> dict[tuple[str, str], int]:
    """Rank map from a GPT-2-format merges.txt: line order IS the rank.
    Only the FIRST line is treated as an optional ``#version`` header —
    later '#'-starting lines are REAL merge rules (GPT-2's table merges
    '#' symbols; dropping them would over-count every document with
    markdown headers or shebangs). Line endings are stripped as
    ``\\r\\n``-safe (a CRLF checkout would otherwise leave ``\\r`` on
    every second symbol and no merge would ever fire)."""
    ranks: dict[tuple[str, str], int] = {}
    with open(path, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            line = line.rstrip("\r\n")
            if not line.strip() or (i == 0 and line.startswith("#")):
                continue
            # split on ANY whitespace run: byte-level BPE symbols never
            # contain literal spaces (space is 'Ġ'), so a space-padded
            # checkout must parse, and anything not exactly two fields
            # is a diagnosable corrupt rule, not an unpacking traceback
            parts = line.split()
            if len(parts) != 2:
                raise ValueError(
                    f"{path}:{i + 1}: expected a two-symbol merge rule "
                    f"'a b', got {line!r}"
                )
            a, b = parts
            ranks[(a, b)] = len(ranks)
    return ranks


def save_merges(
    merges: "list[tuple[str, str]] | dict[tuple[str, str], int]",
    path: str,
    spark=None,
) -> None:
    """Write a merge table as standard GPT-2-format merges.txt —
    ``#version`` header, one "a b" rule per line in RANK order — the
    round-trip companion of :func:`load_merges` (the byte↔unicode
    bijection keeps every symbol printable, so the file is plain text
    any GPT-2-compatible tokenizer can consume). This is the
    persistence step the learn→count/pack ladder needed: learn once on
    the corpus, ship the artifact, count/pack forever.

    With ``spark`` given, writes through the Hadoop FS atomically
    (`fsutil.write_text_atomic`: any scheme, never a torn file);
    without, plain local write."""
    if isinstance(merges, dict):
        pairs = [p for p, _ in sorted(merges.items(), key=lambda kv: kv[1])]
    else:
        pairs = list(merges)
    for p in pairs:
        if len(p) != 2 or any("\n" in s or " " in s or not s for s in p):
            raise ValueError(f"unwritable merge rule {p!r}")
    text = "#version: 0.2\n" + "".join(f"{a} {b}\n" for a, b in pairs)
    if spark is not None:
        from etl_edi_data_scrapper_spark.fsutil import write_text_atomic

        write_text_atomic(spark, path, text)
    else:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)


def bpe_segment_tokens(
    segment: str,
    ranks: dict[tuple[str, str], int],
    byte_enc: dict[int, str],
) -> list[str]:
    """The merge loop over one pre-tokenizer segment: start from the
    byte-encoded characters, repeatedly merge the lowest-rank adjacent
    pair until none is in the table. Segments are words (tens of
    symbols), so the quadratic inner scan is irrelevant."""
    word = [byte_enc[b] for b in segment.encode("utf-8")]
    while len(word) > 1:
        best, best_i = None, -1
        for i in range(len(word) - 1):
            r = ranks.get((word[i], word[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        word[best_i : best_i + 2] = [word[best_i] + word[best_i + 1]]
    return word


def bpe_count_text(
    text: str,
    ranks: dict[tuple[str, str], int],
    byte_enc: dict[int, str] | None = None,
) -> int:
    """Exact BPE token count of one document (driver-side / test use)."""
    import re

    byte_enc = byte_enc or bytes_to_unicode()
    return sum(
        len(bpe_segment_tokens(seg, ranks, byte_enc))
        for seg in re.findall(_PRETOKEN_RE, text or "")
    )


def bpe_token_count_exact(
    df: DataFrame,
    text_col: str = "text",
    merges: str | dict[tuple[str, str], int] = None,
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """df + ``out_col`` (long): exact BPE token count of ``text_col``
    under the given merges (a path to a GPT-2-format merges.txt, or a
    preloaded rank map). Arrow-batched ``mapInPandas``; the rank table
    rides a Spark broadcast variable so it serializes once per executor.
    The default pipeline counter remains the JVM approximation
    (`text.bpe_token_count`) — reach for this when budgets must be
    denominated in trainer-visible tokens."""
    import re

    if merges is None:
        raise ValueError(
            "bpe_token_count_exact needs merges= (a GPT-2-format "
            "merges.txt path or a preloaded rank dict)"
        )
    ranks = load_merges(merges) if isinstance(merges, str) else dict(merges)
    b_ranks = df.sparkSession.sparkContext.broadcast(ranks)
    pat = re.compile(_PRETOKEN_RE)
    byte_enc = bytes_to_unicode()

    fields = df.schema.fieldNames()
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} bigint"

    def count_batches(batches):
        r = b_ranks.value
        # per-task segment memo — the same optimization the public GPT-2
        # encoder ships (its bpe() cache): segment frequency is Zipf-
        # heavy, so most segments repeat and the merge loop runs once per
        # DISTINCT word, not once per occurrence. Bounded so a high-
        # cardinality corpus (random ids, base64 blobs) cannot grow
        # executor memory without limit.
        cache: dict[str, int] = {}

        def seg_count(seg: str) -> int:
            n = cache.get(seg)
            if n is None:
                n = len(bpe_segment_tokens(seg, r, byte_enc))
                if len(cache) >= 1 << 20:
                    cache.clear()
                cache[seg] = n
            return n

        for pdf in batches:
            pdf[out_col] = [
                sum(seg_count(seg) for seg in pat.findall(t or ""))
                for t in pdf[text_col]
            ]
            yield pdf[fields + [out_col]]

    return df.mapInPandas(count_batches, schema=out_schema)


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_count: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """LEARN a BPE merge table from the corpus (Sennrich/Haddow/Birch
    2016, "Neural Machine Translation of Rare Words with Subword Units"
    — the public algorithm every GPT-2-style vocabulary is built with).
    Completes the module's ladder: approximate count (`text.
    bpe_token_count`) → exact count under a given table
    (`bpe_token_count_exact`) → learn the table itself.

    Spark-first shape — the same one the reference trainers use: BPE
    learning never touches the corpus directly, it works on the WORD
    HISTOGRAM. One distributed aggregation builds it (pre-tokenizer
    segments via the JVM regex `text.BPE_SPLIT_PATTERN`, groupBy count —
    map-side combine makes the hot words cheap), then the greedy
    pair-merge loop runs driver-side over the bounded histogram —
    the `kmeans` driver-resident-state pattern, with the same explicit
    bound: ``min_count`` prunes the tail first and the call RAISES when
    more than ``max_words`` distinct segments survive (at web scale the
    long tail is typos/URLs — raise ``min_count``, don't raise the cap).

    Ties break by (count desc, pair lexicographic) so the learned table
    is deterministic across runs and partitionings. Returns merges in
    rank order — `dict(enumerate-inverted)` form is exactly what
    ``bpe_token_count_exact(merges=...)`` / ``pack_by_token_budget
    (tokenizer=...)`` accept via ``{pair: rank}``."""
    from pyspark.sql import functions as F

    from etl_edi_data_scrapper_spark.functions.text import BPE_SPLIT_PATTERN

    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    hist_df = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), 0)
            ).alias("seg")
        )
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= int(min_count))
    )
    # bounded-driver-state guard in the SAME job as the collect (a
    # separate count() would run the corpus-wide explode+aggregate twice
    # — r10 review): take one row past the cap and raise if it exists
    rows = hist_df.limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"learn_bpe_merges: more than {max_words} distinct segments "
            f"survive min_count={min_count}; raise min_count — the "
            "histogram must stay driver-resident. Survivors follow "
            "Heaps's law, measured in SCALE.md 'BPE histogram sizing': "
            "V_m ~ (0.8*N/m)^0.556 for N corpus tokens, so min_count >= "
            "0.8*N/max_words^1.8 bounds the histogram (a 100 TB corpus, "
            "~2.5e13 tokens, fits a 1M-word cap at min_count ~ 320); "
            "raising min_count shrinks survivors polynomially while "
            "raising the cap costs driver memory linearly"
        )
    byte_enc = bytes_to_unicode()
    hist: dict[tuple[str, ...], int] = {}
    for row in rows:
        word = tuple(byte_enc[b] for b in row["seg"].encode("utf-8"))
        hist[word] = hist.get(word, 0) + row["n"]
    return _greedy_merges(hist, int(n_merges), int(min_count))


def _greedy_merges(
    hist: dict[tuple[str, ...], int], n_merges: int, min_count: int
) -> list[tuple[str, str]]:
    """The greedy merge loop with INCREMENTAL pair-count maintenance —
    the optimization the public subword-nmt trainer ships as
    `update_pair_statistics` (Sennrich 2016 reference code). The naive
    loop recomputes every pair count from the whole histogram per merge:
    O(n_merges × Σ|word|) ≈ 10¹¹ Python ops at a production 32k-merge
    vocabulary over a 1M-word histogram — the r11 Heaps sizing's own
    operating point was unreachable by the loop it fed (r11 verdict).
    Here each merge touches ONLY the words that contain the merged pair
    (an inverted index pair → word-ids), and the argmax comes from a
    lazy-deletion heap, so total work is O(Σ|word| + Σ_merges
    Σ_{affected words} |word| + heap churn) — minutes, not hours, at
    32k merges (SCALE.md 'BPE 32k-merge timing').

    Semantics are BIT-IDENTICAL to the naive loop (parity-tested against
    an independent reference in tests/test_bpe.py and property-tested on
    random histograms): pair counts sum over ALL adjacent positions
    (overlaps included), replacement is greedy left-to-right, ties break
    (count desc, pair lexicographic), and the loop stops when the best
    surviving pair drops below max(min_count, 1).

    Heap invariant: every pair whose CURRENT count ≥ threshold has an
    accurate (-count, pair) entry (pushed at heapify or at the merge
    that last changed it); stale entries are discarded on pop by value
    mismatch. A merged pair never re-forms (symbols only concatenate),
    so popping its index entry is final."""
    import heapq

    threshold = max(min_count, 1)
    words: list[list] = [[list(w), n] for w, n in hist.items()]
    stats: dict[tuple[str, str], int] = {}
    indices: dict[tuple[str, str], set[int]] = {}
    for idx, (word, n) in enumerate(words):
        for i in range(len(word) - 1):
            p = (word[i], word[i + 1])
            stats[p] = stats.get(p, 0) + n
            indices.setdefault(p, set()).add(idx)
    heap = [(-c, p) for p, c in stats.items() if c >= threshold]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if -negc != stats.get(p, 0):
                continue  # stale: the accurate entry sorts elsewhere
            if -negc >= threshold:
                best = p
            break
        if best is None:
            break
        merges.append(best)
        a, b = best
        merged = a + b
        changed: set[tuple[str, str]] = set()
        for idx in indices.pop(best, ()):
            word, n = words[idx]
            # the index is maintained lazily (entries for pairs a word no
            # longer contains are never removed) — skip those cheaply
            if not any(
                word[i] == a and word[i + 1] == b
                for i in range(len(word) - 1)
            ):
                continue
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                stats[p] -= n
                changed.add(p)
            out: list[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            words[idx][0] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                stats[p] = stats.get(p, 0) + n
                indices.setdefault(p, set()).add(idx)
                changed.add(p)
        for p in changed:
            if p != best and stats.get(p, 0) >= threshold:
                heapq.heappush(heap, (-stats[p], p))
    return merges
