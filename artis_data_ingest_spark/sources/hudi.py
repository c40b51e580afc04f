"""Apache Hudi copy-on-write table READER — the third open table
format a lake ingest meets (after Delta and Iceberg; together the
three cover effectively every managed lake table in the wild).

Implemented from the public Hudi storage layout documentation
(https://hudi.apache.org/docs/ and the RFC-governed timeline/file-
layout specs) — no hudi-spark bundle jar in this image:

  * ``.hoodie/`` holds the TIMELINE: one ``{instant}.commit`` (or
    ``.replacecommit``/``.deltacommit``) file per completed write,
    where ``instant`` is a monotonically increasing timestamp string
    (e.g. ``20240101120000000``).  Requested-but-unfinished writes
    appear as ``{instant}.commit.requested`` / ``.inflight`` — those
    must be IGNORED (uncommitted data may already sit in the
    partition dirs; reading it would surface torn writes).
  * Data lives in partition dirs as base files named
    ``{fileId}_{writeToken}_{instantTime}.parquet``.  All files with
    the same ``fileId`` in the same partition form a FILE GROUP —
    successive versions (file slices) of the same logical rows,
    written copy-on-write.
  * A snapshot read at instant T = for every file group, the newest
    base file whose ``instantTime`` ≤ T AND is a COMPLETED instant;
    older slices in the group are superseded, never read.
  * ``.replacecommit`` instants (clustering / insert-overwrite)
    additionally REPLACE whole file groups: their JSON carries
    ``partitionToReplaceFileIds`` — replaced groups are dead from
    that instant on even though their files remain on disk.

Merge-on-read tables (``.log`` Avro delta files that must be merged
into the base at read time) REFUSE loudly — a COW-only reader that
silently ignored log files would return stale rows.

Scale posture: the timeline walk and file-group resolution are
driver-side metadata (exactly the Hudi client's file-system view);
the data path is ONE distributed parquet scan over the selected base
files.  Time travel = pass an earlier completed ``instant``.

Reference tie-in: same courtesy as sources/delta.py — read the
upstream's format in place, no conversion pass.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

_BASE_RE = re.compile(
    r"^(?P<file_id>[^_]+(?:-[^_]*)*)_(?P<token>[^_]+)_"
    r"(?P<instant>\d+)\.parquet$"
)
_COMMIT_RE = re.compile(
    r"^(?P<instant>\d+)\.(?P<kind>commit|replacecommit|deltacommit)$"
)


class HudiProtocolError(ValueError):
    """Table uses Hudi features this reader does not implement."""


def _completed_instants(table_dir: str) -> list[tuple[str, str]]:
    """→ [(instant, kind)] for COMPLETED instants only, sorted."""
    hoodie = os.path.join(table_dir, ".hoodie")
    if not os.path.isdir(hoodie):
        raise HudiProtocolError(f"no .hoodie under {table_dir}")
    out = []
    for name in os.listdir(hoodie):
        m = _COMMIT_RE.match(name)
        if m:
            out.append((m.group("instant"), m.group("kind")))
    return sorted(out)


def _replaced_file_ids(
    table_dir: str, instants: list[tuple[str, str]]
) -> set[tuple[str, str]]:
    """(partition, file_id) pairs killed by replacecommits ≤ the
    requested instant."""
    dead: set[tuple[str, str]] = set()
    hoodie = os.path.join(table_dir, ".hoodie")
    for instant, kind in instants:
        if kind != "replacecommit":
            continue
        with open(os.path.join(hoodie, f"{instant}.{kind}"),
                  encoding="utf-8") as fh:
            try:
                meta = json.load(fh)
            except json.JSONDecodeError as ex:
                raise HudiProtocolError(
                    f"unparseable replacecommit {instant}"
                ) from ex
        for part, fids in (
            meta.get("partitionToReplaceFileIds") or {}
        ).items():
            for fid in fids:
                dead.add((part, fid))
    return dead


def _walk_base_files(table_dir: str):
    """→ iterator of (partition_rel, file_name, match) over base
    files; refuses on .log delta files (merge-on-read)."""
    for root, dirs, files in os.walk(table_dir):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        rel = os.path.relpath(root, table_dir)
        rel = "" if rel == "." else rel
        for name in files:
            if ".log." in name or name.endswith(".log"):
                raise HudiProtocolError(
                    f"merge-on-read delta log {name!r} present — "
                    "this reader handles copy-on-write tables only"
                )
            m = _BASE_RE.match(name)
            if m and name.endswith(".parquet"):
                yield rel, name, m


def read_hudi(
    spark: SparkSession,
    table_dir: str,
    as_of_instant: str | None = None,
) -> DataFrame:
    """Snapshot-scan a Hudi COW table at the latest (or a pinned)
    completed instant: newest committed file slice per file group,
    replaced groups dropped, uncommitted slices invisible."""
    instants = _completed_instants(table_dir)
    if not instants:
        raise HudiProtocolError(
            f"no completed instants in {table_dir}/.hoodie"
        )
    if as_of_instant is not None:
        instants = [i for i in instants if i[0] <= str(as_of_instant)]
        if not instants:
            raise HudiProtocolError(
                f"no completed instant ≤ {as_of_instant}"
            )
    committed = {i for i, _ in instants}
    ceiling = max(committed)
    dead = _replaced_file_ids(table_dir, instants)

    # newest committed slice per (partition, file_id)
    best: dict[tuple[str, str], tuple[str, str]] = {}
    for part, name, m in _walk_base_files(table_dir):
        instant = m.group("instant")
        if instant not in committed or instant > ceiling:
            continue  # uncommitted / future slice — invisible
        key = (part, m.group("file_id"))
        if key in dead:
            continue
        cur = best.get(key)
        if cur is None or instant > cur[0]:
            best[key] = (instant, os.path.join(table_dir, part, name))
    if not best:
        raise HudiProtocolError("no live base files resolved")
    paths = sorted(p for _, p in best.values())
    return spark.read.parquet(*paths)


def hudi_timeline(spark: SparkSession, table_dir: str) -> DataFrame:
    """The completed timeline as a DataFrame — Hudi's
    ``show_commits``, metadata only."""
    rows = [(i, k) for i, k in _completed_instants(table_dir)]
    return spark.createDataFrame(rows, "instant string, kind string")
