"""DOCX text extraction (stdlib OOXML, the sources/excel.py pattern).

A .docx file is a zip holding ``word/document.xml``; visible text lives
in ``<w:t>`` runs inside ``<w:r>`` inside ``<w:p>`` paragraphs, with
``<w:tab/>`` and ``<w:br/>`` as explicit whitespace marks — plus the
content a report-style document hides outside the plain paragraph
stream, all covered here (r11, closing the r9/r10 verdict's "silently
skipped" gap):

  * TABLES (``<w:tbl>``): walked row by row in document order — each
    ``<w:tr>`` renders as one line, cells (``<w:tc>``) joined by tabs,
    a cell's own block content (paragraphs, nested tables) joined by
    newlines — so tabular report data lands in the text stream instead
    of vanishing;
  * HEADERS / FOOTERS (``word/header*.xml`` / ``word/footer*.xml``):
    their paragraphs prepend / append to the body text in member-name
    order (header1 < header2 …), the order a reader sees the page;
  * FOOTNOTES / ENDNOTES (``word/footnotes.xml``,
    ``word/endnotes.xml`` — r13): paragraph text appended after the
    body, footnotes first (Word's separator/continuation stubs carry
    no ``w:t`` and contribute lines only when they hold actual text);
  * LIST NUMBERING (r12): ``w:numPr`` resolved against
    ``word/numbering.xml`` (``w:num`` → ``w:abstractNum`` → per-level
    numFmt/lvlText/start) renders the VISIBLE marker — decimal
    counters per (numId, ilvl) in document order with outline resets,
    ``%N`` placeholders, bullets — prefixed to the paragraph text;
  * TEXT BOXES (r12): ``w:txbxContent`` (VML ``v:textbox`` and
    DrawingML ``wps:txbx`` both wrap it) renders its block content as
    separate lines after the host paragraph;
  * CONTENT CONTROLS (r12): block-level wrappers like
    ``w:sdt``/``w:sdtContent`` are recursed, not dropped.

Everything is parsed with ``zipfile`` + ``xml.etree`` (this container
has no python-docx, and the reference's scraper domain downloads
exactly this kind of document alongside its PDFs).

Scale shape: the document, not the paragraph, is the parallelism unit
for an unsplittable container — ``read_docx_fleet`` lists files with
the binaryFile source and parses each inside an executor task via
mapInPandas, identical to the xlsx fleet reader and the zip-archive
source.  Malformed members degrade to empty text with ``ok=false``,
never an exception (corrupt-tolerant ingest, the S-series discipline).
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

DOCX_SCHEMA = (
    "path string, ok boolean, n_paragraphs bigint, n_tables bigint, "
    "n_words bigint, text string"
)


def _para_text(p: ET.Element) -> str:
    parts: list[str] = []

    def walk(node: ET.Element) -> None:
        for child in node:
            if child.tag == f"{_W}txbxContent":
                continue  # text-box blocks are emitted as own lines
            if child.tag == f"{_W}t":
                parts.append(child.text or "")
            elif child.tag == f"{_W}tab":
                parts.append("\t")
            elif child.tag == f"{_W}br":
                parts.append("\n")
            else:
                walk(child)

    walk(p)
    return "".join(parts)


def _parse_numbering(raw: bytes) -> dict:
    """word/numbering.xml → {numId: {ilvl: (numFmt, lvlText, start)}}
    — w:num indirects through w:abstractNum, the two-level shape Word
    always writes."""
    root = ET.fromstring(raw)
    abstract: dict[str, dict[int, tuple]] = {}
    for an in root.findall(f"{_W}abstractNum"):
        aid = an.get(f"{_W}abstractNumId")
        lvls: dict[int, tuple] = {}
        for lvl in an.findall(f"{_W}lvl"):
            try:
                il = int(lvl.get(f"{_W}ilvl", "0"))
            except ValueError:
                continue
            fmt_el = lvl.find(f"{_W}numFmt")
            fmt = (
                fmt_el.get(f"{_W}val") if fmt_el is not None
                else "decimal"
            )
            lt_el = lvl.find(f"{_W}lvlText")
            lt = lt_el.get(f"{_W}val") if lt_el is not None else ""
            st_el = lvl.find(f"{_W}start")
            try:
                st = (
                    int(st_el.get(f"{_W}val"))
                    if st_el is not None else 1
                )
            except (TypeError, ValueError):
                st = 1
            lvls[il] = (fmt, lt, st)
        if aid is not None:
            abstract[aid] = lvls
    out: dict = {}
    for num in root.findall(f"{_W}num"):
        nid = num.get(f"{_W}numId")
        ref = num.find(f"{_W}abstractNumId")
        if nid is not None and ref is not None:
            out[nid] = abstract.get(ref.get(f"{_W}val"), {})
    return out


def _num_marker(p: ET.Element, counts: dict) -> str:
    """The visible list marker ('1. ', '2.1. ', '• ') for a paragraph
    with w:pPr/w:numPr, resolved against numbering.xml.  Decimal
    counters sequence per (numId, ilvl) in document order; stepping a
    level resets the deeper ones (outline semantics); %N placeholders
    in lvlText take the CURRENT counter of level N-1.  Unknown
    formats render like decimal (degrade, don't drop)."""
    numbering = counts.get("numbering")
    if not numbering:
        return ""
    ppr = p.find(f"{_W}pPr")
    numpr = ppr.find(f"{_W}numPr") if ppr is not None else None
    if numpr is None:
        return ""
    nid_el = numpr.find(f"{_W}numId")
    il_el = numpr.find(f"{_W}ilvl")
    nid = nid_el.get(f"{_W}val") if nid_el is not None else None
    try:
        il = int(il_el.get(f"{_W}val")) if il_el is not None else 0
    except (TypeError, ValueError):
        il = 0
    lvls = numbering.get(nid)
    if not lvls or il not in lvls:
        return ""
    fmt, lt, start = lvls[il]
    if fmt == "bullet":
        return (lt or "•") + " "
    cs = counts.setdefault("counters", {}).setdefault(nid, {})
    cs[il] = cs.get(il, start - 1) + 1
    for deeper in [k for k in cs if k > il]:
        del cs[deeper]

    def repl(m: "re.Match[str]") -> str:
        lvl_idx = int(m.group(1)) - 1
        if lvl_idx in cs:
            return str(cs[lvl_idx])
        return str(lvls.get(lvl_idx, ("decimal", "", 1))[2])

    return re.sub(r"%(\d)", repl, lt or "%1.") + " "


def _top_level_txbx(p: ET.Element) -> list[ET.Element]:
    """The w:txbxContent elements under ``p`` that have NO
    w:txbxContent ancestor — the walk stops descending at the first
    box it finds, leaving nested boxes to the recursion that renders
    the outer box's own paragraphs."""
    out: list[ET.Element] = []

    def walk(node: ET.Element) -> None:
        for child in node:
            if child.tag == f"{_W}txbxContent":
                out.append(child)
            else:
                walk(child)

    walk(p)
    return out


def _blocks(parent: ET.Element, counts: dict) -> Iterator[str]:
    """One text line per block-level element of ``parent`` (a body or
    a table cell), in document order: a paragraph is its run text, a
    table contributes one line per row (cells tab-joined, each cell's
    own blocks newline-joined — recursion covers nested tables)."""
    for child in parent:
        if child.tag == f"{_W}p":
            yield _num_marker(child, counts) + _para_text(child)
            # text boxes anchored in this paragraph's runs
            # (v:textbox / wps:txbx both wrap w:txbxContent): their
            # block content renders as its own lines after the host.
            # Only TOP-LEVEL boxes here — a box nested inside another
            # box is emitted by the recursion on its host paragraph,
            # so descending past the first w:txbxContent would emit
            # it twice (r13, ADVICE r12).
            for tx in _top_level_txbx(child):
                yield from _blocks(tx, counts)
        elif child.tag == f"{_W}tbl":
            counts["tables"] += 1
            for tr in child.findall(f"{_W}tr"):
                cells = [
                    "\n".join(_blocks(tc, counts))
                    for tc in tr.findall(f"{_W}tc")
                ]
                yield "\t".join(cells)
        elif child.tag == f"{_W}sectPr":
            continue  # section properties carry no text
        else:
            # block-level wrapper (w:sdt content controls via
            # w:sdtContent, customXml, …): recurse so wrapped
            # paragraphs/tables aren't silently dropped — real
            # report-style documents wrap whole sections in sdt
            yield from _blocks(child, counts)


def parse_docx_bytes(blob: bytes) -> tuple[bool, list[str], int]:
    """→ (ok, text lines, n_tables).  Lines are header paragraphs,
    then body blocks (paragraphs and table rows), then footer and
    footnote paragraphs; see module docstring."""
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            names = set(zf.namelist())
            raw = zf.read("word/document.xml")
            root = ET.fromstring(raw)
            numbering: dict = {}
            if "word/numbering.xml" in names:
                try:
                    numbering = _parse_numbering(
                        zf.read("word/numbering.xml")
                    )
                except ET.ParseError:
                    numbering = {}  # lists lose markers, never the text
            side: dict[str, list[ET.Element]] = {
                "header": [], "footer": [], "footnotes": [],
                "endnotes": [],
            }
            for name in sorted(names):
                m = re.fullmatch(
                    r"word/(header\d*|footer\d*|footnotes|endnotes)"
                    r"\.xml",
                    name,
                )
                if not m:
                    continue
                kind = re.sub(r"\d+$", "", m.group(1))
                try:
                    side[kind].append(ET.fromstring(zf.read(name)))
                except ET.ParseError:
                    continue  # a broken side part never loses the body
    except (zipfile.BadZipFile, KeyError, ET.ParseError, OSError):
        return False, [], 0
    counts: dict = {"tables": 0, "numbering": numbering}
    lines: list[str] = []
    for hdr in side["header"]:
        lines.extend(_blocks(hdr, counts))
    body = root.find(f"{_W}body")
    lines.extend(_blocks(body if body is not None else root, counts))
    for ftr in side["footer"]:
        lines.extend(_blocks(ftr, counts))
    for fn in side["footnotes"]:
        lines.extend(
            t for t in _blocks(fn, counts) if t
        )  # skip Word's empty separator stubs
    for en in side["endnotes"]:
        lines.extend(
            t for t in _blocks(en, counts) if t
        )  # endnotes.xml: same wiring, renders after the footnotes
    return True, lines, counts["tables"]


def read_docx_fleet(spark: SparkSession, glob: str) -> DataFrame:
    """One row per .docx file: (path, ok, n_paragraphs, n_tables,
    n_words, text) — text is extracted lines joined by newlines."""
    import os

    import pandas as pd

    files = spark.read.format("binaryFile").load(glob).select(
        "path", "content"
    )

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                ok, paras, n_tables = parse_docx_bytes(bytes(blob))
                text = "\n".join(paras)
                rows.append(
                    {
                        "path": os.path.basename(path),
                        "ok": ok,
                        "n_paragraphs": len(paras),
                        "n_tables": n_tables,
                        "n_words": len(text.split()),
                        "text": text,
                    }
                )
            yield pd.DataFrame(rows)

    return files.mapInPandas(_parse, DOCX_SCHEMA)


# --------------------------------------------------------------------------
# Fixture writer.
# --------------------------------------------------------------------------


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _para_xml(
    para: str,
    num: tuple | None = None,
    txbx: list[str] | None = None,
) -> str:
    runs = []
    if num is not None:
        num_id, ilvl = num
        runs.append(
            f'<w:pPr><w:numPr><w:ilvl w:val="{ilvl}"/>'
            f'<w:numId w:val="{num_id}"/></w:numPr></w:pPr>'
        )
    for piece in para.replace("\n", "\x00\n\x00").replace(
        "\t", "\x00\t\x00"
    ).split("\x00"):
        if piece == "\t":
            runs.append("<w:r><w:tab/></w:r>")
        elif piece == "\n":
            runs.append("<w:r><w:br/></w:r>")
        elif piece:
            runs.append(
                f'<w:r><w:t xml:space="preserve">{_esc(piece)}</w:t></w:r>'
            )
    if txbx:
        # a box line may itself be a dict {"text", "txbx"} — a text
        # box nested inside a text box (the r13 double-emit fixture)
        inner = "".join(
            _para_xml(line)
            if isinstance(line, str)
            else _para_xml(line.get("text", ""), txbx=line.get("txbx"))
            for line in txbx
        )
        runs.append(
            '<w:r><w:pict><v:shape xmlns:v='
            '"urn:schemas-microsoft-com:vml"><v:textbox>'
            f"<w:txbxContent>{inner}</w:txbxContent>"
            "</v:textbox></v:shape></w:pict></w:r>"
        )
    return f"<w:p>{''.join(runs)}</w:p>"


def _numbering_xml(numbering: dict) -> str:
    """``numbering`` = {numId: [(numFmt, lvlText), ...]} (list index =
    ilvl) → a minimal word/numbering.xml with one abstractNum per
    numId."""
    parts = []
    for k, (num_id, lvls) in enumerate(sorted(numbering.items())):
        lvl_xml = "".join(
            f'<w:lvl w:ilvl="{il}"><w:start w:val="1"/>'
            f'<w:numFmt w:val="{fmt}"/>'
            f'<w:lvlText w:val="{_esc(text)}"/></w:lvl>'
            for il, (fmt, text) in enumerate(lvls)
        )
        parts.append(
            f'<w:abstractNum w:abstractNumId="{k}">{lvl_xml}'
            "</w:abstractNum>"
        )
    for k, (num_id, _lvls) in enumerate(sorted(numbering.items())):
        parts.append(
            f'<w:num w:numId="{num_id}">'
            f'<w:abstractNumId w:val="{k}"/></w:num>'
        )
    return _WRAP.format(root="numbering", inner="".join(parts))


def _tbl_xml(rows: list[list[str]]) -> str:
    trs = []
    for row in rows:
        tcs = "".join(
            f"<w:tc>{_para_xml(cell)}</w:tc>" for cell in row
        )
        trs.append(f"<w:tr>{tcs}</w:tr>")
    return f"<w:tbl>{''.join(trs)}</w:tbl>"


_WRAP = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<w:{root} xmlns:w="http://schemas.openxmlformats.org/'
    'wordprocessingml/2006/main">{inner}</w:{root}>'
)


def write_docx(
    path: str,
    paragraphs: list,
    headers: list[str] | None = None,
    footers: list[str] | None = None,
    numbering: dict | None = None,
    footnotes: list[str] | None = None,
    endnotes: list[str] | None = None,
) -> None:
    """Minimal structurally-valid .docx writer for fixtures.  Each
    ``paragraphs`` item is a str (one paragraph; tabs/newlines become
    real <w:tab/>/<w:br/> marks), a list of rows (a table, each row
    a list of cell strings), or a dict {"text": str, "num":
    (numId, ilvl)?, "txbx": [str, ...]?} — ``num`` attaches the
    paragraph to a list from ``numbering`` ({numId: [(numFmt,
    lvlText), ...]}, written as word/numbering.xml), ``txbx`` anchors
    a VML text box whose lines are block content.  ``headers``/
    ``footers`` write word/header1.xml / word/footer1.xml paragraph
    parts."""
    doc_parts = []
    for item in paragraphs:
        if isinstance(item, str):
            doc_parts.append(_para_xml(item))
        elif isinstance(item, dict):
            doc_parts.append(
                _para_xml(
                    item.get("text", ""),
                    num=item.get("num"),
                    txbx=item.get("txbx"),
                )
            )
        else:
            doc_parts.append(_tbl_xml(item))
    document = _WRAP.format(
        root="document", inner=f"<w:body>{''.join(doc_parts)}</w:body>"
    )
    overrides = [
        '<Override PartName="/word/document.xml" ContentType="application/'
        "vnd.openxmlformats-officedocument.wordprocessingml.document."
        'main+xml"/>'
    ]
    extra_parts: list[tuple[str, str]] = []
    if headers:
        extra_parts.append((
            "word/header1.xml",
            _WRAP.format(
                root="hdr",
                inner="".join(_para_xml(h) for h in headers),
            ),
        ))
        overrides.append(
            '<Override PartName="/word/header1.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'wordprocessingml.header+xml"/>'
        )
    if footers:
        extra_parts.append((
            "word/footer1.xml",
            _WRAP.format(
                root="ftr",
                inner="".join(_para_xml(f) for f in footers),
            ),
        ))
        overrides.append(
            '<Override PartName="/word/footer1.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'wordprocessingml.footer+xml"/>'
        )
    if numbering:
        extra_parts.append((
            "word/numbering.xml", _numbering_xml(numbering),
        ))
        overrides.append(
            '<Override PartName="/word/numbering.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            'wordprocessingml.numbering+xml"/>'
        )
    for kind, items in (("footnotes", footnotes), ("endnotes", endnotes)):
        if not items:
            continue
        # real Word nests each note's paragraphs in a w:footnote /
        # w:endnote wrapper with an id; the parser recurses wrappers
        inner = "".join(
            f'<w:{kind[:-1]} w:id="{i + 1}">{_para_xml(t)}</w:{kind[:-1]}>'
            for i, t in enumerate(items)
        )
        extra_parts.append((
            f"word/{kind}.xml", _WRAP.format(root=kind, inner=inner),
        ))
        overrides.append(
            f'<Override PartName="/word/{kind}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.'
            f'wordprocessingml.{kind}+xml"/>'
        )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        + "".join(overrides)
        + "</Types>"
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
        for name, xml in extra_parts:
            zf.writestr(_entry(name), xml)
