#!/usr/bin/env python
"""Regenerate the committed DOCX and PDF ingest fixtures
(data/docx/*.docx, data/pdf/*.pdf) from the same closed-form formulas
the q_docx_ingest / q_pdf_ingest oracles reconstruct in SQL — so the
committed binary bytes are reproducible from the repo alone (the
pattern tools/make_excel_fixtures.py established).

Deterministic: the package writers (sources/docx.py:write_docx,
sources/pdf.py:write_pdf) embed no timestamps or randomness, so a
rerun is byte-identical to the committed fixtures; `--check` verifies
that without writing.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from artis_data_ingest_spark.sources.docx import write_docx  # noqa: E402
from artis_data_ingest_spark.sources.pdf import (  # noqa: E402
    write_pdf,
    write_pdf_15,
)


def docx_fixture_set() -> dict[str, list[str] | bytes]:
    """doc-i has 2+i paragraphs; paragraph p = 3+2p tokens
    'w{i}p{p}t{k}'; p==1 turns its FIRST space into a tab (<w:tab/>
    — DuckDB regexp_replace is first-match-only, and the oracle's
    shaped CTE is the formula), p==2 on i>=2 appends a
    <w:br/>-wrapped line."""
    out: dict[str, list[str] | bytes] = {}
    for i in range(4):
        paras = []
        for p in range(2 + i):
            body = " ".join(f"w{i}p{p}t{k}" for k in range(3 + 2 * p))
            if p == 1:
                body = body.replace(" ", "\t", 1)
            elif p == 2 and i >= 2:
                body += "\nwrapped"
            paras.append(body)
        out[f"doc-{i}.docx"] = paras
    # r11: a report-style document — header + footer parts and a
    # body table between two paragraphs (rows render tab-joined)
    out["report.docx"] = {
        "paragraphs": [
            "intro para alpha",
            [["name", "qty"], ["fish", "12"], ["crab", "7"]],
            "closing para omega",
        ],
        "headers": ["hdr quarterly report"],
        "footers": ["ftr page one"],
    }
    # r12: list numbering (decimal outline + bullets, resolved against
    # word/numbering.xml) and a VML text box whose lines are block
    # content after the host paragraph
    out["listbox.docx"] = {
        "paragraphs": [
            "intro",
            {"text": "alpha", "num": ("1", 0)},
            {"text": "beta", "num": ("1", 0)},
            {"text": "beta-sub", "num": ("1", 1)},
            {"text": "gamma", "num": ("1", 0)},
            {"text": "dot one", "num": ("2", 0)},
            {"text": "dot two", "num": ("2", 0)},
            {"text": "host para",
             "txbx": ["boxed line one", "boxed line two"]},
            "outro",
        ],
        "numbering": {
            "1": [("decimal", "%1."), ("decimal", "%1.%2.")],
            "2": [("bullet", "•")],
        },
    }
    # r13: footnotes + endnotes parts, and a text box NESTED inside
    # another text box — emitted exactly once (the ADVICE r12
    # double-emit fix)
    out["notes.docx"] = {
        "paragraphs": [
            "body start",
            {"text": "outer host", "txbx": [
                "outer box line",
                {"text": "inner host", "txbx": ["inner box line"]},
            ]},
            "body end",
        ],
        "footnotes": ["fn alpha", "fn beta"],
        "endnotes": ["en omega"],
    }
    out["broken.docx"] = b"PK\x03\x04 not a real zip"
    return out


def pdf_fixture_set() -> dict[str, tuple[list[list[str]], bool] | bytes]:
    """report-i has 1+(i%2) pages; page p = 2+p+i lines
    'f{i}p{p}l{k} token{k}'; report-3 page 0 appends a line with
    PDF-escaped specials; odd i compress (FlateDecode) so both raw
    and Flate streams are exercised — exactly the q_pdf_ingest
    oracle's `shaped` CTE."""
    out: dict[str, tuple[list[list[str]], bool] | bytes] = {}
    for i in range(4):
        pages = []
        for p in range(1 + (i % 2)):
            lines = [f"f{i}p{p}l{k} token{k}" for k in range(2 + p + i)]
            if i == 3 and p == 0:
                lines.append("special (x) \\ done")
            pages.append(lines)
        out[f"report-{i}.pdf"] = (pages, i % 2 == 1)
    out["broken.pdf"] = b"%PDF-1.4 truncated garbage without any object"
    # r12: an /Encrypt-bearing file — the reader must refuse with
    # reason='encrypted' (decryption is out of declared scope)
    out["locked.pdf"] = ([["secret line"]], False, True)
    # r13: REAL empty-user-password encryption the reader decrypts —
    # RC4-40 raw and AES-128-CBC over a Flate stream
    out["secure-rc4.pdf"] = (
        [["secure rc4 forty", "still owner locked"]], False, "rc4-40",
    )
    out["secure-aes.pdf"] = (
        [["secure aes line", "with padding blocks"]], True, "aes-128",
    )
    out["secure-aes256.pdf"] = (
        [["aes two fifty six", "hardened hash r6"]], True, "aes-256",
    )
    return out


def pdf15_fixture_set() -> dict[str, tuple | bytes]:
    """modern-i has 2-(i%2) pages; page p = 2+p+i lines.  i in
    {0,1,3} use a Type0/Identity-H font with a /ToUnicode CMap and
    HEX strings (line = 'm{i}p{p}l{k} café éñ€{k}' — all chars in
    CMAP_ALPHABET); i=3 hangs the CMap off the DESCENDANT CIDFont
    (font_kind='cid', the r12 wild-writer variant); i=2 uses
    /WinAnsiEncoding literal strings with cp1252-only specials
    ('M{i}p{p}l{k} — déjà €{k}').  Predictor alternates (i != 1) so
    both raw and PNG-Up xref streams are committed — exactly the
    q_pdf_modern oracle's formula."""
    out: dict[str, tuple | bytes] = {}
    for i in range(4):
        pages = []
        for p in range(2 - (i % 2)):
            if i != 2:
                lines = [
                    f"m{i}p{p}l{k} café éñ€{k}" for k in range(2 + p + i)
                ]
            else:
                lines = [
                    f"M{i}p{p}l{k} — déjà €{k}" for k in range(2 + p + i)
                ]
            pages.append(lines)
        kinds = {2: "winansi", 3: "cid"}
        out[f"modern-{i}.pdf"] = (pages, kinds.get(i, "cmap"), i != 1)
    out["modern-broken.pdf"] = b"%PDF-1.5 garbage with no object at all"
    # r13: RC4-128 (V2/R3) empty-user-password encryption over the
    # full 1.5 shape — ObjStm payload and content/CMap streams RC4'd
    # per object, the xref stream clear, offsets byte-exact
    out["modern-rc4.pdf"] = (
        [["rc4 page one a", "owner only b"], ["rc4 page two c"]],
        "cmap", True, "rc4-128",
    )
    return out


def _emit(path: str, make) -> bytes:
    make(path)
    with open(path, "rb") as f:
        return f.read()


def main(check_only: bool) -> int:
    import tempfile

    failures = []
    jobs: list[tuple[str, object]] = []
    for name, spec in docx_fixture_set().items():
        jobs.append((os.path.join(REPO, "data", "docx", name), spec))
    for name, spec in pdf_fixture_set().items():
        jobs.append((os.path.join(REPO, "data", "pdf", name), spec))
    for name, spec in pdf15_fixture_set().items():
        jobs.append((os.path.join(REPO, "data", "pdf15", name), spec))
    for target, spec in jobs:
        with tempfile.TemporaryDirectory() as d:
            tmp = os.path.join(d, os.path.basename(target))
            if isinstance(spec, bytes):
                with open(tmp, "wb") as f:
                    f.write(spec)
            elif target.endswith(".docx"):
                if isinstance(spec, dict):
                    write_docx(tmp, **spec)
                else:
                    write_docx(tmp, spec)
            elif os.sep + "pdf15" + os.sep in target:
                pages, font_kind, predictor, *enc = spec
                write_pdf_15(
                    tmp, pages, font_kind=font_kind, predictor=predictor,
                    encrypt=enc[0] if enc else None,
                )
            else:
                pages, compress, *enc = spec
                write_pdf(
                    tmp, pages, compress=compress,
                    encrypt=enc[0] if enc else False,
                )
            with open(tmp, "rb") as f:
                fresh = f.read()
        if check_only:
            with open(target, "rb") as f:
                committed = f.read()
            status = "OK" if committed == fresh else "MISMATCH"
            if status == "MISMATCH":
                failures.append(target)
            print(f"{status:9s} {os.path.relpath(target, REPO)}")
        else:
            os.makedirs(os.path.dirname(target), exist_ok=True)
            with open(target, "wb") as f:
                f.write(fresh)
            print(f"wrote     {os.path.relpath(target, REPO)}")
    if failures:
        print(f"\n{len(failures)} fixture(s) diverge from the generator")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(check_only="--check" in sys.argv))
