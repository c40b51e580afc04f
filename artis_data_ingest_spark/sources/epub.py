"""EPUB book-corpus ingest — stdlib zipfile + ElementTree + html.

Book corpora (Project Gutenberg, Standard Ebooks, library scans)
arrive as EPUB: a zip whose reading order lives in an OPF package
document found via ``META-INF/container.xml`` (the OCF spec).  The
chapters are XHTML.  All of it parses with the stdlib:

  * container.xml → the OPF ``rootfile`` path;
  * OPF: ``dc:title`` metadata, the ``manifest`` (id → href), the
    ``spine`` (ordered ``idref``s — READING ORDER, which directory
    order does not give you);
  * each spine chapter: XHTML → text (block-level tags become
    newlines so paragraphs survive; inline markup is stripped;
    entities unescaped via ``html.unescape``; script/style dropped).

Spark mapping: ``binaryFile`` scan of ``*.epub`` (one task per book —
the archive is unsplittable, same story as zip/tar/mbox) →
Arrow-batched ``mapInPandas`` → one row per SPINE CHAPTER in reading
order.  A book whose container/OPF is malformed yields a single
``_corrupt`` row (PERMISSIVE contract); a single bad chapter yields a
corrupt row for that chapter while its siblings land.
"""

from __future__ import annotations

import html as _html
import io
import posixpath
import re
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EPUB_SCHEMA = T.StructType([
    T.StructField("book", T.StringType()),
    T.StructField("book_title", T.StringType()),
    T.StructField("spine_pos", T.LongType()),
    T.StructField("chapter", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("_corrupt", T.BooleanType()),
])

_NS_RE = re.compile(r"\{[^}]*\}")
_BLOCK_RE = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|tr|blockquote|section|article)\b[^>]*>",
    re.IGNORECASE,
)
_DROP_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t]+")
_NL_RE = re.compile(r"\n{2,}")


def xhtml_to_text(markup: str) -> str:
    """Block tags → newlines, inline tags stripped, entities
    unescaped, whitespace normalized."""
    body = re.search(r"<body\b[^>]*>(.*)</body>", markup,
                     re.IGNORECASE | re.DOTALL)
    if body:
        markup = body.group(1)
    markup = _DROP_RE.sub("", markup)
    markup = _BLOCK_RE.sub("\n", markup)
    markup = _TAG_RE.sub("", markup)
    text = _html.unescape(markup)
    text = _WS_RE.sub(" ", text)
    text = "\n".join(ln.strip() for ln in text.split("\n"))
    return _NL_RE.sub("\n", text).strip()


def _local(tag: str) -> str:
    return _NS_RE.sub("", tag)


def parse_epub(blob: bytes) -> tuple[str | None, list[tuple[str, str]]]:
    """→ (dc:title, [(chapter href, chapter text)] in spine order)."""
    import xml.etree.ElementTree as ET

    zf = zipfile.ZipFile(io.BytesIO(blob))
    container = ET.fromstring(zf.read("META-INF/container.xml"))
    opf_path = None
    for el in container.iter():
        if _local(el.tag) == "rootfile":
            opf_path = el.attrib.get("full-path")
            break
    if not opf_path:
        raise ValueError("container.xml names no rootfile")
    opf = ET.fromstring(zf.read(opf_path))
    base = posixpath.dirname(opf_path)
    title = None
    manifest: dict[str, str] = {}
    spine: list[str] = []
    for el in opf.iter():
        tag = _local(el.tag)
        if tag == "title" and title is None:
            title = (el.text or "").strip() or None
        elif tag == "item":
            manifest[el.attrib.get("id", "")] = el.attrib.get(
                "href", ""
            )
        elif tag == "itemref":
            spine.append(el.attrib.get("idref", ""))
    chapters: list[tuple[str, str]] = []
    for idref in spine:
        href = manifest.get(idref)
        if not href:
            continue
        path = posixpath.join(base, href) if base else href
        markup = zf.read(path).decode("utf-8", errors="replace")
        chapters.append((href, xhtml_to_text(markup)))
    return title, chapters


def read_epub(spark: SparkSession, in_dir: str) -> DataFrame:
    """One row per spine chapter across every ``*.epub``."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.epub")
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
                    title, chapters = parse_epub(bytes(blob))
                except Exception:
                    out.append({
                        "book": name, "book_title": None,
                        "spine_pos": None, "chapter": None,
                        "text": None, "n_chars": None,
                        "_corrupt": True,
                    })
                    continue
                for pos, (href, text) in enumerate(chapters, 1):
                    out.append({
                        "book": name, "book_title": title,
                        "spine_pos": pos, "chapter": href,
                        "text": text, "n_chars": len(text),
                        "_corrupt": False,
                    })
            yield pd.DataFrame(
                {f.name: [r.get(f.name) for r in out]
                 for f in EPUB_SCHEMA.fields}
            )

    return files.mapInPandas(_parse, schema=EPUB_SCHEMA)


def write_minimal_epub(
    title: str, chapters: list[tuple[str, str]]
) -> bytes:
    """Fixture writer: a spec-shaped OCF container (mimetype stored
    first uncompressed, container.xml, OPF with manifest + spine,
    XHTML chapters) — deterministic bytes (zeroed timestamps)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        def put(name: str, data: str, compress=zipfile.ZIP_DEFLATED):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = compress
            zf.writestr(info, data)

        put("mimetype", "application/epub+zip", zipfile.ZIP_STORED)
        put(
            "META-INF/container.xml",
            '<?xml version="1.0"?>\n'
            '<container version="1.0" xmlns="urn:oasis:names:tc:'
            'opendocument:xmlns:container">\n'
            '  <rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/></rootfiles>'
            "\n</container>",
        )
        items = "\n".join(
            f'    <item id="c{i}" href="{href}" '
            'media-type="application/xhtml+xml"/>'
            for i, (href, _) in enumerate(chapters)
        )
        refs = "\n".join(
            f'    <itemref idref="c{i}"/>'
            for i in range(len(chapters))
        )
        put(
            "OEBPS/content.opf",
            '<?xml version="1.0"?>\n'
            '<package xmlns="http://www.idpf.org/2007/opf" '
            'version="3.0" unique-identifier="uid">\n'
            '  <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
            f"\n    <dc:title>{title}</dc:title>\n"
            '    <dc:identifier id="uid">fixture</dc:identifier>\n'
            "  </metadata>\n"
            f"  <manifest>\n{items}\n  </manifest>\n"
            f"  <spine>\n{refs}\n  </spine>\n"
            "</package>",
        )
        for href, body_html in chapters:
            put(
                f"OEBPS/{href}",
                '<?xml version="1.0"?>\n'
                '<html xmlns="http://www.w3.org/1999/xhtml">'
                f"<head><title>x</title></head>"
                f"<body>{body_html}</body></html>",
            )
    return buf.getvalue()
