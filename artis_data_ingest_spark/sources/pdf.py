"""PDF text extraction — stdlib-pure (zlib IS stdlib), fixture-scoped
to the classic text-operator subset.

The reference's scraper keeps exactly ``\\.(zip|pdf)$`` links
(scrape_newest_baci_data.R) — it DOWNLOADS PDFs but never reads them;
a corpus pipeline has to.  This reader covers the dominant simple-PDF
shape without a PDF library:

  * objects located by a tolerant ``N G obj … endobj`` scan (no xref
    dependence — truncated or rewritten files still yield whatever
    objects survive);
  * streams un-filtered when their dict declares ``/FlateDecode``
    (``zlib.decompress``), raw otherwise;
  * text from content streams (any decoded stream containing a BT/ET
    block): ``(string) Tj`` shows one chunk, ``[(a) -120 (b)] TJ``
    concatenates its string parts (kerning numbers dropped), with full
    PDF string escapes (\\\\ \\( \\) \\n \\r \\t and octal \\ddd);
    chunks join with newlines (the fixture writes one text op per
    line, the common one-line-per-Td layout);
  * page count = ``/Type /Page`` objects; files with no parseable
    object → ``ok=false``, empty text — never an exception.

DECLARED SCOPE (loudly, not silently): no CMap/Unicode fonts, no
cross-reference streams, no encryption — WinAnsi/ASCII simple-font
documents, which the formula fixtures are.  The writer half emits
spec-correct PDF 1.4 (objects, xref table, trailer, optional
FlateDecode page streams) so the reader is exercised against real
structure, not against its own assumptions.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

PDF_SCHEMA = (
    "path string, ok boolean, n_pages bigint, n_text_ops bigint, "
    "n_words bigint, text string"
)

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_STR_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*Tj|\[(?:[^\]\\]|\\.)*\]\s*TJ")
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \d, \dd, \ddd
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1  # lone backslash: drop, per spec
            continue
        out += c
        i += 1
    return bytes(out)


def extract_pdf_text(blob: bytes) -> dict:
    objs = list(_OBJ_RE.finditer(blob))
    n_pages = 0
    chunks: list[str] = []
    n_ops = 0
    for m in objs:
        body = m.group(3)
        if re.search(rb"/Type\s*/Page\b(?!s)", body):
            n_pages += 1
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        data = sm.group(1)
        head = body[: sm.start()]
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        if b"BT" not in data:
            continue
        for op in _STR_TJ_RE.finditer(data):
            n_ops += 1
            parts = [
                _unescape_pdf_string(s.group(0)[1:-1])
                for s in _STR_RE.finditer(op.group(0))
            ]
            chunks.append(
                b"".join(parts).decode("latin-1", errors="replace")
            )
    text = "\n".join(chunks)
    return {
        "ok": bool(objs),
        "n_pages": n_pages,
        "n_text_ops": n_ops,
        "n_words": len(text.split()),
        "text": text,
    }


def read_pdf_fleet(spark: SparkSession, glob: str) -> DataFrame:
    import os

    import pandas as pd

    files = spark.read.format("binaryFile").load(glob).select(
        "path", "content"
    )

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                m = extract_pdf_text(bytes(blob))
                rows.append({"path": os.path.basename(path), **m})
            yield pd.DataFrame(rows)

    return files.mapInPandas(_parse, PDF_SCHEMA)


# --------------------------------------------------------------------------
# Fixture writer: spec-correct minimal PDF 1.4.
# --------------------------------------------------------------------------


def _escape_pdf_string(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1")


def write_pdf(path: str, pages: list[list[str]], compress: bool = False) -> None:
    """``pages`` = list of pages, each a list of text lines.  Every
    line becomes one Tj at its own Td position (alternate lines use a
    TJ array split mid-line, exercising the array path)."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    font = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    page_ids = []
    content_ids = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 760 Td"]
        for li, line in enumerate(lines):
            if li:
                ops.append(b"0 -14 Td")
            if li % 2 == 1 and len(line) > 3:
                a, b = line[: len(line) // 2], line[len(line) // 2 :]
                ops.append(
                    b"[" + b"(" + _escape_pdf_string(a) + b") -120 ("
                    + _escape_pdf_string(b) + b")] TJ"
                )
            else:
                ops.append(b"(" + _escape_pdf_string(line) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if compress:
            zs = zlib.compress(stream)
            cid = add(
                b"<< /Length " + str(len(zs)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + zs
                + b"\nendstream"
            )
        else:
            cid = add(
                b"<< /Length " + str(len(stream)).encode()
                + b" >>\nstream\n" + stream + b"\nendstream"
            )
        content_ids.append(cid)
        page_ids.append(None)  # placeholder; filled after pages obj
    pages_id = len(objects) + len(pages) + 1
    for k, cid in enumerate(content_ids):
        page_ids[k] = add(
            b"<< /Type /Page /Parent " + str(pages_id).encode()
            + b" 0 R /MediaBox [0 0 612 792] /Contents "
            + str(cid).encode() + b" 0 R /Resources << /Font << /F1 "
            + str(font).encode() + b" 0 R >> >> >>"
        )
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    real_pages_id = add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(pages)).encode() + b" >>"
    )
    assert real_pages_id == pages_id
    catalog = add(
        b"<< /Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R >>"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R >>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )
    with open(path, "wb") as f:
        f.write(bytes(out))
