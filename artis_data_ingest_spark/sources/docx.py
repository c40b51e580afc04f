"""DOCX text extraction (stdlib OOXML, the sources/excel.py pattern).

A .docx file is a zip holding ``word/document.xml``; visible text lives
in ``<w:t>`` runs inside ``<w:r>`` inside ``<w:p>`` paragraphs, with
``<w:tab/>`` and ``<w:br/>`` as explicit whitespace marks — everything
a text-corpus ingest needs, parsed with ``zipfile`` + ``xml.etree``
(this container has no python-docx, and the reference's scraper domain
downloads exactly this kind of document alongside its PDFs).

Scale shape: the document, not the paragraph, is the parallelism unit
for an unsplittable container — ``read_docx_fleet`` lists files with
the binaryFile source and parses each inside an executor task via
mapInPandas, identical to the xlsx fleet reader and the zip-archive
source.  Malformed members degrade to empty text with ``ok=false``,
never an exception (corrupt-tolerant ingest, the S-series discipline).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

DOCX_SCHEMA = (
    "path string, ok boolean, n_paragraphs bigint, n_words bigint, "
    "text string"
)


def parse_docx_bytes(blob: bytes) -> tuple[bool, list[str]]:
    """→ (ok, paragraph texts).  Paragraphs join their runs in
    document order; tabs and breaks become '\\t' / '\\n'."""
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            raw = zf.read("word/document.xml")
        root = ET.fromstring(raw)
    except (zipfile.BadZipFile, KeyError, ET.ParseError, OSError):
        return False, []
    paras = []
    for p in root.iter(f"{_W}p"):
        parts: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W}t":
                parts.append(node.text or "")
            elif node.tag == f"{_W}tab":
                parts.append("\t")
            elif node.tag == f"{_W}br":
                parts.append("\n")
        paras.append("".join(parts))
    return True, paras


def read_docx_fleet(spark: SparkSession, glob: str) -> DataFrame:
    """One row per .docx file: (path, ok, n_paragraphs, n_words,
    text) — text is paragraphs joined by newlines."""
    import os

    import pandas as pd

    files = spark.read.format("binaryFile").load(glob).select(
        "path", "content"
    )

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                ok, paras = parse_docx_bytes(bytes(blob))
                text = "\n".join(paras)
                rows.append(
                    {
                        "path": os.path.basename(path),
                        "ok": ok,
                        "n_paragraphs": len(paras),
                        "n_words": len(text.split()),
                        "text": text,
                    }
                )
            yield pd.DataFrame(rows)

    return files.mapInPandas(_parse, DOCX_SCHEMA)


def write_docx(path: str, paragraphs: list[str]) -> None:
    """Minimal structurally-valid .docx writer for fixtures: the three
    package parts a conformant reader needs ([Content_Types],
    package rels, document.xml).  Tabs/newlines in a paragraph become
    real <w:tab/>/<w:br/> marks, exercising the reader's whitespace
    handling."""
    doc_parts = []
    for para in paragraphs:
        runs = []
        for piece in para.replace("\n", "\x00\n\x00").replace(
            "\t", "\x00\t\x00"
        ).split("\x00"):
            if piece == "\t":
                runs.append("<w:r><w:tab/></w:r>")
            elif piece == "\n":
                runs.append("<w:r><w:br/></w:r>")
            elif piece:
                esc = (
                    piece.replace("&", "&amp;")
                    .replace("<", "&lt;")
                    .replace(">", "&gt;")
                )
                runs.append(
                    f'<w:r><w:t xml:space="preserve">{esc}</w:t></w:r>'
                )
        doc_parts.append(f"<w:p>{''.join(runs)}</w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(doc_parts)
        + "</w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.wordprocessingml.document.'
        'main+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/"
        'officeDocument" Target="word/document.xml"/></Relationships>'
    )
    def _entry(name: str) -> zipfile.ZipInfo:
        # fixed timestamp → byte-reproducible fixtures (the xlsx
        # writer's pattern, sources/excel.py)
        info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
        info.compress_type = zipfile.ZIP_DEFLATED
        info.external_attr = 0o600 << 16
        return info

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_entry("[Content_Types].xml"), content_types)
        zf.writestr(_entry("_rels/.rels"), rels)
        zf.writestr(_entry("word/document.xml"), document)
