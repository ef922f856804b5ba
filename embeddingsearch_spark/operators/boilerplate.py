"""Corpus-level boilerplate line removal (the C4/RefinedWeb cleanup):
lines that recur across many documents — nav bars, cookie banners,
license footers — are dropped from every document, keyed by the line's
content fingerprint.

Plan shape (what survives 100 TB):
  1. explode lines with their position (scan-stage posexplode);
  2. document frequency per line fingerprint — distinct (doc, fp) first
     (a doc repeating its own line counts once), then one
     hash-partitioned count per fp. The shuffle carries (fp, id) pairs,
     never text;
  3. join each line row to its fp's document frequency and keep rare
     lines — the df table is tiny relative to the corpus (unique lines ≪
     line instances) and AQE broadcasts it when it fits;
  4. reassemble surviving lines per doc ordered by original position —
     one groupBy on the doc id.

The reference engine has no corpus-cleanup surface (SURVEY.md §2); this
extends the training-data-pipeline layer (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.functions.text import fingerprint


def _doc_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, position, line); blank lines keep their slot so
    reassembly preserves paragraph structure."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def line_document_frequency(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Distinct-document count per line fingerprint: ``(line_fp, df)``."""
    return (
        _doc_lines(df, id_col, text_col)
        .select(F.col(id_col), fingerprint(F.col("line")).alias("line_fp"))
        .distinct()
        .groupBy("line_fp")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int = 2,
    min_line_tokens: int = 1,
) -> DataFrame:
    """Strip every line whose document frequency exceeds ``max_df`` and
    rebuild each document from its surviving lines (original order,
    ``\\n``-joined). Lines shorter than ``min_line_tokens`` whitespace
    tokens are exempt (blank/short separator lines are structure, not
    boilerplate). Docs whose every line is boilerplate survive with
    empty text (left join keeps the id). Output:
    ``(id, text, n_lines, n_removed)``."""
    lines = _doc_lines(df, id_col, text_col).withColumn(
        "line_fp", fingerprint(F.col("line"))
    )
    freq = line_document_frequency(df, id_col, text_col)
    short = F.size(F.split(F.trim(F.col("line")), r"\s+")) < min_line_tokens
    blank = F.length(F.trim(F.col("line"))) == 0
    tagged = lines.join(freq, "line_fp").withColumn(
        "keep", (F.col("df") <= max_df) | short | blank
    )
    rebuilt = (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_removed"),
        )
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce(text_col, F.lit("")).alias(text_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n\n",
) -> DataFrame:
    """Cross-document paragraph deduplication (the Gopher / SlimPajama
    repeated-paragraph pass — Rae et al. 2021, arXiv:2112.11446 §A1.2,
    public): every exact-duplicate paragraph (normalized fingerprint)
    keeps only its FIRST occurrence in (doc_id, pos) order; later
    occurrences are cut and each document is rebuilt from its surviving
    paragraphs. Unlike `remove_boilerplate_lines` (which drops frequent
    lines from EVERY doc), the first copy always survives — content is
    deduplicated, not deleted.

    Plan shape at 100 TB: paragraphs posexplode scan-side; the
    first-occurrence election groupBy carries only (fp, id, pos) — never
    text; only fingerprints occurring 2+ times enter the decision table,
    so the join back onto the paragraph stream has a small build side
    (duplicated paragraphs ≪ corpus) that AQE broadcasts when it fits.
    Blank paragraphs are structure, always kept. Output:
    ``(id, text, n_paragraphs, n_removed)``.
    """
    import re

    # sep is a LITERAL separator: escape it for the split regex (an
    # unescaped "||" parses as empty-alternation and splits between
    # every character) while array_join uses it verbatim
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), re.escape(sep))
        ).alias("pos", "para"),
    ).withColumn("para_fp", fingerprint(F.col("para")))
    blank = F.length(F.trim(F.col("para"))) == 0
    # election over non-blank paragraphs only: (fp) -> first (id, pos);
    # min(struct) is one map-side-combinable agg, no window needed
    firsts = (
        paras.filter(~blank)
        .groupBy("para_fp")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
        )
        .filter(F.col("_n") > 1)
        .select(
            "para_fp",
            F.col(f"_first.{id_col}").alias("_f_id"),
            F.col("_first.pos").alias("_f_pos"),
        )
    )
    tagged = paras.join(firsts, "para_fp", "left_outer").withColumn(
        "keep",
        F.col("_f_id").isNull()
        | ((F.col(id_col) == F.col("_f_id")) & (F.col("pos") == F.col("_f_pos")))
        | blank,
    )
    rebuilt = (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("pos"), F.col("para")),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                sep,
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_paragraphs"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_removed"),
        )
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce(text_col, F.lit("")).alias(text_col),
            F.coalesce("n_paragraphs", F.lit(0)).alias("n_paragraphs"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )
