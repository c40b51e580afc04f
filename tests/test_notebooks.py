"""Jupyter notebook ingest tests (sources/notebooks.py)."""

from __future__ import annotations

import json

from artis_data_ingest_spark.sources.notebooks import (
    parse_notebook,
    read_notebooks,
)


def _nb(cells, lang="python"):
    return json.dumps({
        "nbformat": 4, "nbformat_minor": 5,
        "metadata": {"language_info": {"name": lang}},
        "cells": cells,
    }).encode()


def test_source_spellings_flatten_identically():
    as_list = _nb([{"cell_type": "code",
                    "source": ["a = 1\n", "b = 2"],
                    "execution_count": 1, "outputs": []}])
    as_str = _nb([{"cell_type": "code", "source": "a = 1\nb = 2",
                   "execution_count": 1, "outputs": []}])
    r1 = parse_notebook(as_list)[0]
    r2 = parse_notebook(as_str)[0]
    assert r1["source"] == r2["source"] == "a = 1\nb = 2"
    assert r1["n_lines"] == 2 and r1["n_chars"] == 11


def test_outputs_counted_never_ingested():
    nb = _nb([{
        "cell_type": "code", "source": "print(1)",
        "execution_count": 3,
        "outputs": [
            {"output_type": "stream",
             "text": "secret traceback with /home/user paths"},
            {"output_type": "execute_result",
             "data": {"text/plain": "1"}},
        ],
    }])
    r = parse_notebook(nb)[0]
    assert r["n_outputs"] == 2
    assert "secret" not in r["source"]
    assert r["execution_count"] == 3


def test_kernelspec_language_fallback_and_empty_cell():
    nb = json.dumps({
        "nbformat": 4,
        "metadata": {"kernelspec": {"language": "julia"}},
        "cells": [{"cell_type": "code", "source": "",
                   "outputs": []}],
    }).encode()
    r = parse_notebook(nb)[0]
    assert r["language"] == "julia"
    assert r["n_lines"] == 0 and r["n_chars"] == 0
    assert r["execution_count"] is None


def test_read_notebooks_distributed_with_corrupt(spark, tmp_path):
    (tmp_path / "a.ipynb").write_bytes(
        _nb([{"cell_type": "markdown", "source": "# hi"}])
    )
    (tmp_path / "b.ipynb").write_bytes(b"{torn json")
    df = read_notebooks(spark, str(tmp_path))
    rows = {(r["notebook"], r["cell_type"], r["_corrupt"])
            for r in df.collect()}
    assert rows == {("a.ipynb", "markdown", False),
                    ("b.ipynb", None, True)}
