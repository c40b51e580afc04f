"""Report/table render sink (SURVEY.md §2.1 S13).

The reference renders changelog tables with kableExtra and conditional
prose (``assess_changes.qmd:215-218, 243-261``). Engine equivalent:
collect a (small, already-aggregated) DataFrame and render markdown —
presentation only, explicitly driver-side. The guard rail is the row
cap: this sink is for *report-sized* results; anything bigger belongs in
a parquet sink, not a document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_markdown(df: DataFrame, max_rows: int = 1000) -> str:
    """Render a small DataFrame as a GitHub-style markdown table."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"report sink refuses >{max_rows} rows — aggregate first or "
            "write parquet instead"
        )
    cols = df.columns
    out = ["| " + " | ".join(cols) + " |",
           "|" + "|".join("---" for _ in cols) + "|"]
    for r in rows:
        out.append(
            "| " + " | ".join("" if v is None else str(v) for v in r) + " |"
        )
    return "\n".join(out)


def conditional_prose(
    df: DataFrame, predicate_col: str, if_any: str, if_none: str
) -> str:
    """The reference's report-gating idiom (qmd:215-218):
    ``if (any(x)) cat(msgA) else cat(msgB)`` — an ANY aggregate driving
    which prose the report gets."""
    from pyspark.sql import functions as F

    any_true = df.agg(F.bool_or(F.col(predicate_col))).collect()[0][0]
    return if_any if any_true else if_none
