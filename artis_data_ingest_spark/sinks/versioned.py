"""Versioned parquet tables: atomic commits, optimistic concurrency,
time travel — the lakehouse-lite snapshot layer the reference's whole
workflow gestures at (assess_changes.qmd diffs two raw-data snapshot
DIRECTORIES at file/schema/value level; here snapshots become
first-class versions of one table instead of ad-hoc folder pairs).

Layout under ``table_dir``:

    data/<version>-<token>/part-*.parquet   immutable data segments
    _manifests/v{N}.json                    {"version", "parent",
                                             "files", "mode", "note"}

Semantics:

  * a commit writes its segment directory FIRST, then publishes the
    manifest via write-to-temp + ``os.replace`` — readers either see
    version N fully or not at all (the parquet job's own _SUCCESS
    guards the segment, the rename guards the manifest);
  * ``mode="append"`` carries the parent's file list forward plus the
    new segment; ``mode="overwrite"`` starts the list fresh —
    copy-on-write at file granularity, so time travel needs no data
    duplication;
  * optimistic concurrency: the caller states which version it built
    on (``expect_version``); if another commit got there first the
    manifest for N+1 already exists and the commit RAISES instead of
    clobbering (`os.replace` would silently last-write-win otherwise);
  * orphan segments from crashed commits (segment written, manifest
    never published) are invisible to readers — only files listed in
    a manifest are ever read — and ``vacuum`` removes them.

At 100 TB the manifest is the only driver-side object (a file list —
thousands of entries, not data), reads prune to exactly the listed
files, and segments never rewrite: the same shape real table formats
(Iceberg/Delta) use, reduced to the stdlib.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class VersionConflict(RuntimeError):
    """Another writer committed the version this commit expected to
    create — rebase and retry."""


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_manifest_dir(table_dir), f"v{version}.json")


def latest_version(table_dir: str) -> int | None:
    md = _manifest_dir(table_dir)
    if not os.path.isdir(md):
        return None
    versions = [
        int(f[1:-5])
        for f in os.listdir(md)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def commit(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    note: str = "",
    expect_version: int | None = None,
) -> int:
    """Write ``df`` as a new version; returns the version number.

    ``expect_version``: the version this writer based its work on
    (None for "table must not exist yet").  Raises VersionConflict if
    someone else published that successor first.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    cur = latest_version(table_dir)
    if expect_version is None:
        expect_version = cur
    if cur != expect_version:
        raise VersionConflict(
            f"expected to build on v{expect_version}, table is at v{cur}"
        )
    new_version = (cur if cur is not None else -1) + 1
    seg = os.path.join(
        table_dir, "data", f"{new_version:06d}-{uuid.uuid4().hex[:8]}"
    )
    df.write.mode("errorifexists").parquet(seg)
    seg_files = sorted(
        os.path.join(seg, f)
        for f in os.listdir(seg)
        if f.endswith(".parquet")
    )
    if mode == "append" and cur is not None:
        files = _read_manifest(table_dir, cur)["files"] + seg_files
    else:
        files = seg_files
    manifest = {
        "version": new_version,
        "parent": cur,
        "mode": mode,
        "note": note,
        "files": files,
    }
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)
    tmp = _manifest_path(table_dir, new_version) + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    final = _manifest_path(table_dir, new_version)
    # publish atomically: os.link REFUSES if the target exists, so two
    # racing writers cannot both claim version N — exactly one link
    # succeeds and the loser raises.  (An exists-check + rename would
    # be a TOCTOU race: both could pass the check, and os.replace
    # silently last-write-wins.)
    try:
        os.link(tmp, final)
    except FileExistsError:
        os.unlink(tmp)
        raise VersionConflict(
            f"v{new_version} was published concurrently"
        ) from None
    os.unlink(tmp)
    return new_version


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the file set of ``version`` (default latest)."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no versions in {table_dir}")
    files = _read_manifest(table_dir, version)["files"]
    if not files:
        raise FileNotFoundError(f"v{version} has no files")
    return spark.read.parquet(*files)


def history(spark: SparkSession, table_dir: str) -> DataFrame:
    """(version, parent, mode, note, n_files) — the commit log."""
    rows = []
    v = latest_version(table_dir)
    seen = set()
    while v is not None and v not in seen:
        seen.add(v)
        m = _read_manifest(table_dir, v)
        rows.append(
            (m["version"], m["parent"], m["mode"], m["note"],
             len(m["files"]))
        )
        v = m["parent"]
    return spark.createDataFrame(
        rows,
        "version bigint, parent bigint, mode string, note string, "
        "n_files bigint",
    )


def vacuum(table_dir: str) -> list[str]:
    """Remove orphan segment directories no manifest references
    (crashed commits); returns the removed paths.  Never touches a
    referenced file, at any version — time travel stays intact."""
    import shutil

    md = _manifest_dir(table_dir)
    data_root = os.path.join(table_dir, "data")
    if not (os.path.isdir(md) and os.path.isdir(data_root)):
        return []
    referenced: set[str] = set()
    for f in os.listdir(md):
        if f.startswith("v") and f.endswith(".json"):
            m = _read_manifest(table_dir, int(f[1:-5]))
            for path in m["files"]:
                referenced.add(os.path.dirname(os.path.abspath(path)))
    removed = []
    for seg in sorted(os.listdir(data_root)):
        p = os.path.abspath(os.path.join(data_root, seg))
        if p not in referenced:
            shutil.rmtree(p)
            removed.append(p)
    return removed


def change_feed(
    spark: SparkSession, table_dir: str, since: int | None = None
) -> "DataFrame":
    """Incremental change feed: for every version after ``since``, the
    rows its commit ADDED, tagged with the version — consumed by
    reading only that version's delta files (the file-set difference
    against the parent manifest), so catching up on K new commits
    costs O(changed data), never a table scan.  Overwrite commits
    surface their full new file set (a rewrite IS its own delta).
    """
    from pyspark.sql import functions as F

    latest = latest_version(table_dir)
    if latest is None:
        raise FileNotFoundError(f"no versions in {table_dir}")
    out = None
    for v in range(0 if since is None else since + 1, latest + 1):
        m = _read_manifest(table_dir, v)
        parent_files = (
            set(_read_manifest(table_dir, m["parent"])["files"])
            if m["parent"] is not None and m["mode"] == "append"
            else set()
        )
        delta = [f for f in m["files"] if f not in parent_files]
        if not delta:
            continue
        part = spark.read.parquet(*delta).withColumn(
            "_version", F.lit(v).cast("bigint")
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise FileNotFoundError(f"no changes after v{since}")
    return out
