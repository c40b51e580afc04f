"""MERGE INTO / upsert semantics as a single full-outer join.

The reference's update cycle is "download the newest snapshot, compare,
adopt" (scrape_newest_baci_data.R:20-80, assess_changes.qmd:50-375);
a warehouse expresses the *adopt* step as MERGE: update matched keys,
insert new keys, optionally delete keys the source marks dead. Spark
has no MERGE statement outside table formats, but the semantics are one
relational expression — a full-outer join on the merge keys with a
source-wins projection — so Catalyst plans and optimizes it like any
other join.

Scale notes (100 TB):
  * One shuffle per side on the merge key — the same cost any MERGE
    implementation pays. With the target bucketed/partitioned by key at
    rest, the target side's exchange disappears.
  * The typical deployment writes the result with dynamic partition
    overwrite, so only partitions the source touches are rewritten;
    the relational core here is unchanged by that.
  * Source-wins is expressed with WHEN(present) rather than COALESCE so
    a legitimately-NULL source value still overwrites the target.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PRESENT = "__src_present"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    null_safe_keys: bool = False,
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys``.

    Matched keys take the source row (update); source-only keys are
    inserted; target-only keys are kept. If ``delete_col`` names a
    boolean column of ``source``, keys whose source row has it true are
    dropped from the result (and never inserted) — the column itself
    does not appear in the output.

    Both frames must share the non-key column set (source may add
    ``delete_col``). Standard MERGE semantics assume non-null merge
    keys, and plain ``==`` comparison lets the full-outer join REUSE
    the hash partitioning of upstream aggregates on the same keys
    (null-safe comparison plans different partitioning expressions and
    forces both sides to re-shuffle); pass ``null_safe_keys=True`` only
    if keys can genuinely be NULL.
    """
    value_cols = [c for c in target.columns if c not in keys]
    t = target.alias("t")
    s = source.withColumn(_PRESENT, F.lit(True)).alias("s")
    cmp = (
        (lambda a, b: a.eqNullSafe(b)) if null_safe_keys
        else (lambda a, b: a == b)
    )
    cond = functools.reduce(
        operator.and_,
        [cmp(F.col(f"t.{k}"), F.col(f"s.{k}")) for k in keys],
    )
    joined = t.join(s, cond, "full_outer")
    present = F.coalesce(F.col(f"s.{_PRESENT}"), F.lit(False))
    out_cols: list[Column] = [
        F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys
    ] + [
        F.when(present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in value_cols
    ]
    if delete_col is not None:
        joined = joined.filter(
            ~F.coalesce(F.col(f"s.{delete_col}"), F.lit(False))
        )
    return joined.select(*out_cols)
