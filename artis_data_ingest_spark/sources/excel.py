"""Excel ingestion (SURVEY.md §2.1 S9) — pandas bridge.

Spark has no core Excel reader (``read_xlsx(skip = 1)``,
assess_changes.qmd:131-132). Strategy: xlsx files are small config-like
inputs in the reference's world, so a driver-side pandas read feeding
``createDataFrame`` is the right scale trade-off; for many files, the
paths are parallelized with a binaryFile listing + mapInPandas decode.

The engine import-gates openpyxl/xlrd: absent in this container, the
reader raises a clear error while the rest of the engine works.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession


def _pandas_excel_available() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


def read_excel(
    spark: SparkSession, path: str, skip_rows: int = 1, **kwargs
) -> DataFrame:
    """S9 — ``read_xlsx(file, skip = 1)`` equivalent.

    skip_rows=1 mirrors the reference's header-skipping default.
    """
    if not _pandas_excel_available():
        raise NotImplementedError(
            "Excel ingestion requires openpyxl, which is not installed in "
            "this environment. The Spark-side plumbing (pandas bridge → "
            "createDataFrame) is exercised by tests via a fake workbook."
        )
    import pandas as pd

    pdf = pd.read_excel(path, skiprows=skip_rows, **kwargs)
    return spark.createDataFrame(pdf)


def dataframe_from_pandas_bytes(
    spark: SparkSession, raw: bytes, reader
) -> DataFrame:
    """Bridge used by tests and by archive ingestion: parse bytes with a
    pandas reader callable and lift the result into a DataFrame."""
    pdf = reader(io.BytesIO(raw))
    return spark.createDataFrame(pdf)
