"""Zip-archive ingestion (SURVEY.md §2.1 S10).

The reference feeds ``GlobalProduction_*.zip`` archives to external
rebuild functions (assess_changes.qmd:267-275). Zip is not splittable
and has no native Spark source, so the scale-correct design is:

  binaryFile scan (one row per archive) → mapInPandas decode
  (one task per archive — the natural parallelism unit for an
  unsplittable format) → explode member CSVs to rows.

Each archive is processed wholly inside one task; with thousands of
archives the job parallelizes across executors while any single 100 GB
archive is bounded by one task (the format's own limit — document and
re-shard upstream if archives are huge).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("archive", T.StringType()),
        T.StructField("member", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def list_zip_members(spark: SparkSession, path_glob: str) -> DataFrame:
    """Inventory of members across archives: archive path, member name,
    uncompressed size. One task per archive via mapInPandas."""
    bins = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(path_glob)
        .select("path", "content")
    )

    def _members(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for info in zf.infolist():
                        if not info.is_dir():
                            out.append((path, info.filename, info.file_size))
            yield pd.DataFrame(
                out, columns=["archive", "member", "n_bytes"]
            )

    return bins.mapInPandas(_members, MEMBER_SCHEMA)


def read_zipped_csv(
    spark: SparkSession,
    path_glob: str,
    member_pattern: str = ".csv",
    csv_schema: T.StructType | None = None,
) -> DataFrame:
    """S10 — read CSV members out of zip archives as one DataFrame.

    When ``csv_schema`` is None the schema is inferred driver-side from
    the first member of the first archive (mirrors the reference's
    inference-everywhere stance, SURVEY.md §1.3), then applied uniformly
    so the distributed decode returns a consistent schema.
    """
    bins = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(path_glob)
        .select("path", "content")
    )
    if csv_schema is None:
        first = bins.select("content").limit(1).collect()
        if not first:
            raise FileNotFoundError(f"no zip archives under {path_glob}")
        with zipfile.ZipFile(io.BytesIO(first[0][0])) as zf:
            name = next(
                n for n in zf.namelist() if member_pattern in n.lower()
            )
            sample = pd.read_csv(io.BytesIO(zf.read(name)))
        csv_schema = spark.createDataFrame(sample.head(100)).schema

    fields = [f.name for f in csv_schema.fields]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for name in zf.namelist():
                        if member_pattern in name.lower():
                            out = pd.read_csv(io.BytesIO(zf.read(name)))
                            yield out[[c for c in fields if c in out.columns]]

    return bins.mapInPandas(_decode, csv_schema)


def list_tar_members(spark: SparkSession, path_glob: str) -> DataFrame:
    """Tar twin of list_zip_members (r14): inventory of members across
    ``*.tar`` archives — archive basename, member name, size.  One
    task per archive (tar is unsplittable without an index); handles
    whatever tarfile does (ustar/pax/gnu), so WebDataset shards and
    plain backups both inventory with the same call."""
    import os
    import tarfile

    bins = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path_glob)
        .select("path", "content")
    )

    def _members(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
                    for info in tf:
                        if info.isfile():
                            out.append((
                                os.path.basename(path), info.name,
                                info.size,
                            ))
            yield pd.DataFrame(
                out, columns=["archive", "member", "n_bytes"]
            )

    return bins.mapInPandas(_members, MEMBER_SCHEMA)
