"""Cleaning pipeline — re-expression of the reference's ``clean_prod``
(assess_changes.qmd:279-325) with R-compatible null semantics.

Pipeline shape: tolerant select → rename → lowercase → trim-all →
era-dependent NOT-IN filters → regex synonym strip. Each step is a pure
Catalyst projection/filter, so the whole pipeline fuses into one
codegen'd stage over the scan — no shuffles at any scale.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.strings import strip_synonym_suffix, trim_all_to_string


def tolerant_select(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """P9 — ``select(any_of(cols_keep))`` (assess_changes.qmd:287):
    keep whichever requested columns exist, silently skip the rest.
    Plan-construction-time logic, zero runtime cost."""
    have = set(df.columns)
    return df.select(*[c for c in cols if c in have])


def rename_map(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P10 — bulk rename (assess_changes.qmd:289-293)."""
    return df.withColumnsRenamed(mapping)


def not_in_keep_nulls(col: str | Column, values: list[str]) -> Column:
    """P6 — R's ``!x %in% set`` keeps NA rows (R returns FALSE for
    ``NA %in% set``, so the negation is TRUE); SQL ``NOT IN`` drops
    them. Reproduce R: ``NOT isin OR isNull`` (SURVEY.md §4.3 trap #2).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (~c.isin(values)) | c.isNull()


def clean_prod(
    df: DataFrame,
    *,
    keep_cols: Iterable[str],
    renames: dict[str, str],
    lower_cols: Iterable[str] = (),
    not_in: dict[str, list[str]] | None = None,
    strip_synonym_cols: Iterable[str] = (),
) -> DataFrame:
    """The reference cleaning pipeline, parameterized.

    Mirrors assess_changes.qmd:279-325 step-for-step:
      1. ``select(any_of(keep_cols))``        (:287)
      2. ``rename(...)``                      (:289-293)
      3. ``tolower(as.character(...))``       (:294-295)
      4. ``mutate_all(str_trim)``             (:297) — casts ALL to string
      5. ``filter(!col %in% values)`` per col (:298-316) — NA-keeping
      6. ``gsub(" \\(\\=.*", "")``            (:318-321)
    """
    out = tolerant_select(df, keep_cols)
    out = rename_map(out, {k: v for k, v in renames.items() if k in out.columns})
    for c in lower_cols:
        if c in out.columns:
            out = out.withColumn(c, F.lower(F.col(c).cast("string")))
    out = trim_all_to_string(out)
    for c, values in (not_in or {}).items():
        if c in out.columns:
            out = out.filter(not_in_keep_nulls(c, values))
    for c in strip_synonym_cols:
        if c in out.columns:
            out = out.withColumn(c, strip_synonym_suffix(F.col(c)))
    return out


def strip_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    doc_id_col: str = "doc_id",
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """C4-style boilerplate removal: drop every LINE that appears in
    more than ``max_df_ratio`` of the documents from the same source
    (nav menus, cookie banners, 'subscribe' footers — the template
    text a crawler captures on every page of a site), then reassemble
    each document from its surviving lines in original order.

    Plan shape (scales to 100 TB):
      * explode lines with position — narrow, inside the scan stage;
      * line document-frequency = groupBy(source, line) over DISTINCT
        (doc, line) pairs — one shuffle on the (source, line) key,
        map-side combined; counting distinct docs per line (not raw
        occurrences) so a line repeated inside ONE page is not
        mistaken for cross-document boilerplate;
      * per-source doc counts — a second tiny aggregate, broadcast
        back;
      * anti-filter + reassembly — one shuffle on doc_id with an
        order-preserving sort inside ``array_sort(collect_list(
        struct(pos, line)))``.
    The line table is (source, distinct-line)-bounded — far smaller
    than the corpus — and no step touches full text twice.

    Returns ``(doc_id, text, n_lines_removed)`` with ``text`` rebuilt
    from kept lines joined by ``\\n`` (a document whose every line is
    boilerplate keeps an empty string).
    """
    # NOTE: no spread_cpu_bound here — measured at sf0.1, the explode is
    # light string splitting and the repartition costs more than the
    # single-split serialization it would cure (2.08s vs 1.84s); the
    # guard pays only for CPU-heavy per-row work (shingles, signatures)
    lines = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    # document frequency per (source, line): distinct docs containing it
    df_counts = (
        lines.select("source", "line", "doc_id")
        .distinct()
        .groupBy("source", "line")
        .agg(F.count(F.lit(1)).alias("line_docs"))
    )
    src_counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("src_docs")
    )
    flagged = df_counts.join(F.broadcast(src_counts), "source").select(
        "source",
        "line",
        (
            F.col("line_docs") > F.col("src_docs") * F.lit(max_df_ratio)
        ).alias("is_boiler"),
    )
    tagged = lines.join(flagged, ["source", "line"], "left").select(
        "doc_id",
        "pos",
        "line",
        F.coalesce("is_boiler", F.lit(False)).alias("is_boiler"),
    )
    # collect_list drops nulls, so boilerplate rows (when with no
    # otherwise) vanish before the position sort
    kept = F.array_sort(
        F.collect_list(
            F.when(~F.col("is_boiler"), F.struct("pos", "line"))
        )
    )
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(kept, lambda s: s["line"]), "\n"
            ).alias("text"),
            F.sum(F.col("is_boiler").cast("bigint")).alias(
                "n_lines_removed"
            ),
        )
    )


def collapse_repeated_lines(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """IN-document repetition removal (the C4 repeated-span rule at
    line granularity): collapse CONSECUTIVE duplicate lines to one
    occurrence, preserving order — scraped pages repeat headers,
    cookie banners and list fragments back-to-back, and a generation
    model trained on them learns to loop.

    Complements ``strip_boilerplate_lines`` (CROSS-document template
    removal): this one needs no corpus statistics, so it is a pure
    per-document window — explode lines with position, keep a line
    iff it differs from its predecessor (lag over the doc partition),
    reassemble in original order.  Millions of small window groups,
    no global state, no shuffle beyond the doc_id partition.

    Returns (doc_id, n_lines_before, n_lines_after, text).
    """
    from pyspark.sql.window import Window

    lines = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "line_idx", "line"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("line_idx")
    kept = lines.withColumn("prev", F.lag("line").over(w)).filter(
        F.col("prev").isNull() | (F.col("line") != F.col("prev"))
    )
    total = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines_before")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines_after"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("line_idx", "line"))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text"),
    )
    return total.join(rebuilt, on="doc_id")
