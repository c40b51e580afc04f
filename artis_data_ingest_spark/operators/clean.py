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
