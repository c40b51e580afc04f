"""Config-file corpus ingest — INI and TOML, stdlib only.

Code-model corpora are full of configuration: ``pyproject.toml`` /
``Cargo.toml`` across modern repos, ``.ini`` / ``.properties``-style
files across the Java and legacy-Python worlds.  Flattened
key/value rows are what a curation or analysis pipeline wants (count
dependency keys, find secrets-shaped values, cluster projects by
their tool sections) — and both formats parse with the stdlib:

  * INI via ``configparser`` (interpolation OFF — raw '%' values in
    the wild would otherwise raise),
  * TOML via ``tomllib`` (3.11+), nested tables and arrays-of-tables
    flattened to dotted paths, arrays to per-index paths
    (``deps.0``), scalars rendered to strings with the type kept in
    its own column.

One row per (section, key) in document order; one task per file;
malformed files yield a single ``_corrupt`` row (the PERMISSIVE
contract shared with every text source here).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .files import transparent_decompress

CONFIG_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("section", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("value", T.StringType()),
    T.StructField("value_type", T.StringType()),
    T.StructField("_corrupt", T.BooleanType()),
])


def _toml_scalar(v) -> tuple[str, str]:
    if isinstance(v, bool):
        return ("true" if v else "false"), "bool"
    if isinstance(v, int):
        return str(v), "int"
    if isinstance(v, float):
        return repr(v), "float"
    return str(v), type(v).__name__ if not isinstance(v, str) \
        else "str"


def parse_config(blob: bytes, name: str) -> list[dict]:
    """→ rows per CONFIG_SCHEMA (without the ``file`` column)."""
    text = transparent_decompress(blob).decode(
        "utf-8", errors="replace"
    )
    rows: list[dict] = []
    if name.endswith((".toml", ".toml.gz")):
        import tomllib

        data = tomllib.loads(text)

        def walk(node, prefix: str):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, f"{prefix}.{k}" if prefix else k)
            elif isinstance(node, list):
                for i, v in enumerate(node):
                    walk(v, f"{prefix}.{i}")
            else:
                val, typ = _toml_scalar(node)
                section, _, key = prefix.rpartition(".")
                rows.append({
                    "format": "toml", "section": section, "key": key,
                    "value": val, "value_type": typ,
                    "_corrupt": False,
                })

        walk(data, "")
        return rows
    import configparser

    cp = configparser.ConfigParser(interpolation=None)
    cp.read_string(text)
    for section in cp.sections():
        for key, value in cp.items(section):
            rows.append({
                "format": "ini", "section": section, "key": key,
                "value": value, "value_type": "str",
                "_corrupt": False,
            })
    return rows


def read_configs(
    spark: SparkSession,
    in_dir: str,
    glob: str = "*.{toml,ini,cfg,toml.gz,ini.gz}",
) -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(in_dir)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        for pdf in batches:
            out: list[dict] = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                try:
                    for row in parse_config(bytes(blob), name):
                        row["file"] = name
                        out.append(row)
                except Exception:
                    out.append({
                        "file": name, "format": None, "section": None,
                        "key": None, "value": None,
                        "value_type": None, "_corrupt": True,
                    })
            yield pd.DataFrame(
                {f.name: [r.get(f.name) for r in out]
                 for f in CONFIG_SCHEMA.fields}
            )

    return files.mapInPandas(_parse, schema=CONFIG_SCHEMA)
