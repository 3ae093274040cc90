"""Cross-document duplicate-SPAN removal (the C4 / "ExactSubstr-lite"
cleanup): boilerplate passages — license headers, navigation chrome,
quoted templates — repeat verbatim across otherwise-distinct documents,
and document-level dedup never sees them. The C4 pipeline drops any
three-sentence span occurring more than once in the corpus; this module
is the same policy over fixed-width word spans (the synthetic corpus has
no sentence punctuation): every occurrence of a duplicated span except
the FIRST (smallest (doc_id, span_pos)) is cut out of its document.

Scale shape — the thing to get right at 100 TB:
  * spans are derived twice from the source text by the same narrow
    projection rather than carried through the shuffle: the wide
    span-occurrence join moves ONLY (16-byte md5, doc_id, pos) rows,
    never text;
  * the cut-list (positions to drop, per document) is aggregated to one
    array row per affected document — affected docs are the minority, so
    the join back to the corpus is small-side (AQE broadcasts it when it
    fits) and the text itself is shuffled at most once;
  * the rebuild is a single JVM lambda projection (filter spans by
    dropped index, flatten, join with spaces) — no Python, no second
    shuffle.

Determinism: ownership is min(struct(doc_id, pos)) — total order, no
ties; output text depends only on data, not partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _span_expr(text_col: str, width: int) -> str:
    """SQL expr producing the array of space-joined word spans of
    ``width`` tokens (last span may be shorter)."""
    return (
        f"transform(sequence(0, greatest(size(split({text_col}, ' ')) - 1, 0) DIV {width}), "
        f"i -> array_join(slice(split({text_col}, ' '), i * {width} + 1, {width}), ' '))"
    )


def dedup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
) -> DataFrame:
    """Remove every repeated occurrence of any ``width``-word span that
    appears more than once corpus-wide, keeping the first (smallest
    (doc_id, pos)) occurrence in place.

    Returns one row per input document: ``id_col``, ``n_spans``,
    ``n_spans_dropped``, ``clean_text`` (the document with dropped spans
    cut out; documents with no duplicated spans round-trip unchanged).
    """
    spans = docs.select(
        F.col(id_col),
        F.posexplode(F.expr(_span_expr(text_col, width))).alias("pos", "span"),
    )
    # occurrence table: hash + coordinates only — text never shuffles here
    occ = spans.select(id_col, "pos", F.md5(F.col("span")).alias("h"))
    owners = occ.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first_occ"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    drops = (
        occ.join(owners, "h")
        .filter(
            (F.col("n_occ") > 1)
            & (
                (F.col(id_col) != F.col(f"first_occ.{id_col}"))
                | (F.col("pos") != F.col("first_occ.pos"))
            )
        )
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("__drop_pos"))
    )
    rebuilt = (
        docs.join(drops, id_col, "left")
        .withColumn("__spans", F.expr(_span_expr(text_col, width)))
        .select(
            F.col(id_col),
            F.size("__spans").alias("n_spans"),
            # size(NULL) is -1 under non-ANSI Spark (never null), so guard
            # explicitly rather than coalescing
            F.when(F.col("__drop_pos").isNull(), F.lit(0))
            .otherwise(F.size("__drop_pos"))
            .alias("n_spans_dropped"),
            F.when(F.col("__drop_pos").isNull(), F.col(text_col))
            .otherwise(
                F.array_join(
                    F.filter(
                        "__spans",
                        lambda _s, i: ~F.array_contains(F.col("__drop_pos"), i),
                    ),
                    " ",
                )
            )
            .alias("clean_text"),
        )
    )
    return rebuilt


def span_dedup_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    hex_word_sql=None,
) -> str:
    """DuckDB oracle for :func:`dedup_spans` — same span windows, same
    first-occurrence ownership, same rebuild, expressed over list
    functions and one window. Column names match the Spark side."""
    return f"""
    WITH tok AS (
      SELECT {id_col}, {text_col} AS __text,
             string_split({text_col}, ' ') AS t
      FROM {table}),
    spans AS (
      SELECT {id_col}, pos,
             array_to_string(list_slice(t, pos * {width} + 1, pos * {width} + {width}), ' ') AS span
      FROM (SELECT {id_col}, t,
                   unnest(range(0, ((len(t) - 1) // {width}) + 1)) AS pos
            FROM tok)),
    occ AS (
      SELECT {id_col}, pos,
             count(*) OVER (PARTITION BY md5(span)) AS n_occ,
             row_number() OVER (PARTITION BY md5(span)
                                ORDER BY {id_col}, pos) AS rn
      FROM spans),
    drops AS (
      SELECT {id_col}, list(pos) AS dp
      FROM occ WHERE n_occ > 1 AND rn > 1 GROUP BY {id_col}),
    rebuilt AS (
      SELECT s.{id_col},
             string_agg(s.span, ' ' ORDER BY s.pos)
               FILTER (WHERE d.dp IS NULL OR NOT list_contains(d.dp, s.pos)) AS agg_text,
             count(*) AS n_spans
      FROM spans s LEFT JOIN drops d USING ({id_col})
      GROUP BY s.{id_col})
    SELECT t.{id_col},
           CAST(r.n_spans AS BIGINT) AS n_spans,
           CAST(coalesce(len(d.dp), 0) AS BIGINT) AS n_spans_dropped,
           CASE WHEN d.dp IS NULL THEN t.__text
                ELSE coalesce(r.agg_text, '') END AS clean_text
    FROM tok t
    JOIN rebuilt r USING ({id_col})
    LEFT JOIN drops d USING ({id_col})
    """
