"""PDF text extraction — stdlib-pure (zlib IS stdlib), covering both
the classic PDF 1.4 shape and the modern (PDF 1.5+) structures that
dominate wild documents.

The reference's scraper keeps exactly ``\\.(zip|pdf)$`` links
(scrape_newest_baci_data.R:35) — it DOWNLOADS PDFs but never reads
them; a corpus pipeline has to, and most PDFs produced after ~2005
use compressed cross-reference/object streams and non-trivial font
encodings.  This reader covers:

  * objects located TWO ways, merged: a tolerant ``N G obj … endobj``
    scan (truncated or rewritten files still yield whatever objects
    survive) plus the cross-reference STREAM chain (PDF 1.5 §7.5.8:
    ``startxref`` → ``/Type /XRef`` stream, ``/W`` field widths,
    ``/Index`` subsections, PNG predictors 0/1/2 per
    ``/DecodeParms /Predictor``, ``/Prev`` chain for incremental
    updates) — type-1 entries parse objects at their exact offsets,
    catching bodies the regex scan would mis-split;
  * OBJECT STREAMS (``/Type /ObjStm``, §7.5.7): the container stream
    is inflated, its ``/N`` (num, offset) header pairs sliced, and
    every embedded object joins the object table — this is where
    modern writers put the catalog/pages/fonts;
  * stream payloads sliced by ``/Length`` when it verifies against
    the ``endstream`` marker (binary Flate data may contain the
    marker bytes), regex-fallback otherwise; ``/FlateDecode``
    inflated via zlib;
  * FONT DECODING: each page's ``/Resources /Font`` map is resolved
    (indirect refs followed, object streams included) and every
    ``/Fn size Tf`` operator switches the active decoder —
    ``/ToUnicode`` CMap streams (bfchar + bfrange, both array and
    contiguous forms, 1- or 2-byte codes per the source hex width,
    UTF-16BE targets) beat ``/Encoding /WinAnsiEncoding`` (cp1252)
    beat the latin-1 default; content streams not reachable from a
    page fall back to the union of all pages' font maps;
  * text from ``(literal)`` AND ``<hex>`` strings in Tj/TJ (kerning
    numbers dropped), full PDF string escapes
    (\\\\ \\( \\) \\n \\r \\t and octal \\ddd); chunks join with
    newlines;
  * page count = ``/Type /Page`` objects (object-stream residents
    included); files with no parseable object → ``ok=false``, empty
    text — never an exception.

Type0/CID composite fonts (r12): the ToUnicode CMap is found on the
Type0 dict OR through /DescendantFonts on the CIDFont (both array
forms); Identity-H with no CMap anywhere decodes 2-byte codes as
UTF-16BE.

Encryption (r13, sources/pdf_crypt.py): the standard security
handler's EMPTY-user-password case — owner-locked files, the majority
of wild "encrypted" PDFs — decrypts transparently (RC4-40/128,
AES-128 and AES-256, /V 1-5 /R 2-6, pure stdlib); detection is
scoped to the LAST
trailer / xref-stream dict so stray '/Encrypt N G R' bytes in content
never misfire.  Genuinely user-password-protected or
unsupported-handler files are refused loudly — ok=false with
``reason='encrypted'`` — and every failure carries a ``reason``
('no objects', 'encrypted', 'parse error').  Remaining declared
scope: no external CID-keyed CMap files (rare outside CJK print
workflows).  The writer half emits spec-correct
PDF 1.4 (xref table) AND PDF 1.5 (object streams + predictor-coded
xref streams + ToUnicode CMaps + hex strings + the descendant-CMap
Type0 variant), both optionally REALLY encrypted, so the reader is
exercised against real structure, not against its own assumptions.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

PDF_SCHEMA = (
    "path string, ok boolean, n_pages bigint, n_text_ops bigint, "
    "n_words bigint, text string, reason string"
)

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
# one text-showing op: font switch, literal/hex Tj, or TJ array
_TEXTOP_RE = re.compile(
    rb"/(\w+)\s+[\d.]+\s+Tf"
    rb"|(?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)\s*Tj"
    rb"|\[(?:[^\]\\]|\\.)*\]\s*TJ"
)
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>")

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


# --------------------------------------------------------------------------
# Object table construction: tolerant scan + xref-stream chain + ObjStm.
# --------------------------------------------------------------------------


def _stream_payload(body: bytes) -> bytes | None:
    """The (decoded) stream payload of an object body, or None.
    ``/Length`` slices exactly when it verifies against the
    ``endstream`` marker; otherwise the lazy-regex fallback."""
    sm = re.search(rb"stream\r?\n", body)
    if not sm:
        return None
    start = sm.end()
    head = body[: sm.start()]
    data = None
    lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", head)
    if lm:
        n = int(lm.group(1))
        if body[start + n : start + n + 20].lstrip().startswith(b"endstream"):
            data = body[start : start + n]
    if data is None:
        em = body.find(b"endstream", start)
        if em < 0:
            return None
        data = body[start:em].rstrip(b"\r\n")
    if b"/FlateDecode" in head:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    return data


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """PNG predictors over 1-byte samples (the xref-stream case:
    /DecodeParms /Predictor >= 10, filters None/Sub/Up per row)."""
    rowlen = columns + 1
    prev = bytearray(columns)
    out = bytearray()
    for r in range(0, len(data) - rowlen + 1, rowlen):
        ft = data[r]
        row = bytearray(data[r + 1 : r + rowlen])
        if ft == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 1:  # Sub (bpp = 1)
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft != 0:  # unsupported filter — bail to the scan path
            raise ValueError(f"PNG filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _object_at(blob: bytes, offset: int) -> tuple[int | None, bytes]:
    """Parse ``N G obj … endobj`` at an exact xref offset, skipping a
    stream payload via its verified ``/Length`` — robust to compressed
    payloads that happen to contain the ``endobj`` marker bytes (which
    would truncate the lazy-regex scan)."""
    hm = re.match(rb"\s*(\d+)\s+(\d+)\s+obj\b", blob[offset : offset + 64])
    if not hm:
        return None, b""
    start = offset + hm.end()
    em = blob.find(b"endobj", start)
    sm = re.compile(rb"stream\r?\n").search(blob, start)
    if sm and (em < 0 or sm.start() < em):
        head = blob[start : sm.start()]
        lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", head)
        if lm:
            dend = sm.end() + int(lm.group(1))
            if blob[dend : dend + 20].lstrip().startswith(b"endstream"):
                em = blob.find(b"endobj", dend)
    if em < 0:
        return None, b""
    return int(hm.group(1)), blob[start:em]


def _parse_xref_stream_at(blob: bytes, offset: int) -> dict[int, tuple]:
    """Decode one xref STREAM object at ``offset``: {objnum: (type,
    f2, f3)} plus the /Prev chain, or {} on any malformation (the
    tolerant scan is the safety net)."""
    entries: dict[int, tuple] = {}
    seen_offsets: set[int] = set()
    while 0 <= offset < len(blob) and offset not in seen_offsets:
        seen_offsets.add(offset)
        _, body = _object_at(blob, offset)
        if b"/XRef" not in body:
            return entries
        wm = re.search(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]", body)
        if not wm:
            return entries
        w = tuple(int(x) for x in wm.groups())
        data = _stream_payload(body)
        if data is None:
            return entries
        pm = re.search(rb"/Predictor\s+(\d+)", body[: body.find(b"stream")])
        if pm and int(pm.group(1)) >= 10:
            cm = re.search(rb"/Columns\s+(\d+)", body)
            cols = int(cm.group(1)) if cm else sum(w)
            try:
                data = _png_unpredict(data, cols)
            except ValueError:
                return entries
        im = re.search(rb"/Index\s*\[([^\]]*)\]", body)
        if im:
            toks = im.group(1).split()
            if not all(t.isdigit() for t in toks):
                return entries  # malformed /Index: scan path takes over
            idx = [int(x) for x in toks]
        else:
            sm2 = re.search(rb"/Size\s+(\d+)", body)
            idx = [0, int(sm2.group(1))] if sm2 else [0, 0]
        ew = sum(w)
        pos = 0
        for k in range(0, len(idx) - 1, 2):
            start, count = idx[k], idx[k + 1]
            for num in range(start, start + count):
                if pos + ew > len(data):
                    break
                f = []
                for width in w:
                    f.append(
                        int.from_bytes(data[pos : pos + width], "big")
                        if width
                        else 1  # omitted type field defaults to 1
                    )
                    pos += width
                entries.setdefault(num, tuple(f))
        prevm = re.search(rb"/Prev\s+(\d+)", body)
        offset = int(prevm.group(1)) if prevm else -1
    return entries


def _collect_objects(blob: bytes) -> dict[int, bytes]:
    """num → body, merged from the tolerant scan, the xref-stream
    chain's type-1 offsets, and every object stream's residents."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(blob):
        objs.setdefault(int(m.group(1)), m.group(3))
    # xref stream (PDF 1.5): exact offsets + /Length-verified slices
    # beat the scan (whose lazy regex a binary payload can truncate)
    sx = blob.rfind(b"startxref")
    if sx >= 0:
        om = re.match(rb"\s*(\d+)", blob[sx + 9 :])
        if om:
            for num, f in _parse_xref_stream_at(blob, int(om.group(1))).items():
                if f and f[0] == 1:
                    got, body = _object_at(blob, f[1])
                    if got == num:
                        objs[num] = body
    # object streams: expand residents (catalog/pages/fonts live here)
    for body in list(objs.values()):
        if b"/ObjStm" not in body:
            continue
        data = _stream_payload(body)
        if data is None:
            continue
        head = body[: body.find(b"stream")]
        nm = re.search(rb"/N\s+(\d+)", head)
        fm = re.search(rb"/First\s+(\d+)", head)
        if not (nm and fm):
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        header = data[:first].split()
        if len(header) < 2 * n or not all(
            t.isdigit() for t in header[: 2 * n]
        ):
            continue  # malformed ObjStm header: skip, never raise
        pairs = [
            (int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)
        ]
        for i, (num, off) in enumerate(pairs):
            end = first + pairs[i + 1][1] if i + 1 < n else len(data)
            objs.setdefault(num, data[first + off : end])
    return objs


# --------------------------------------------------------------------------
# Font decoding: ToUnicode CMap > WinAnsiEncoding > latin-1.
# --------------------------------------------------------------------------

_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _u16(hexbytes: bytes) -> str:
    if len(hexbytes) % 2:  # odd hex digit count: imply trailing 0
        hexbytes += b"0"
    b = bytes.fromhex(hexbytes.decode("ascii"))
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _parse_tounicode(cmap: bytes) -> tuple[dict[int, str], int]:
    """(code → str, code width in bytes) from bfchar/bfrange
    sections; width from the widest source hex seen (Identity-H
    Type0 fonts use 2-byte codes, simple fonts 1)."""
    table: dict[int, str] = {}
    width = 1
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for sm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", sec.group(1)
        ):
            src, dst = sm.groups()
            width = max(width, len(src) // 2)
            table[int(src, 16)] = _u16(dst)
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        for rm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(<[0-9A-Fa-f]+>|\[(?:[^\]]*)\])",
            sec.group(1),
        ):
            lo, hi, dst = rm.groups()
            width = max(width, len(lo) // 2)
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if dst.startswith(b"["):
                dsts = _HEXPAIR_RE.findall(dst)
                for k, d in enumerate(dsts):
                    if lo_i + k <= hi_i:
                        table[lo_i + k] = _u16(d)
            else:
                base_hex = dst[1:-1]
                base = int(base_hex, 16)
                for k in range(hi_i - lo_i + 1):
                    table[lo_i + k] = _u16(
                        f"{base + k:0{len(base_hex)}x}".encode()
                    )
    return table, width


class _FontDecoder:
    """Maps one text-string's bytes to str under a font's encoding."""

    __slots__ = ("table", "width", "codec")

    def __init__(self, table=None, width=1, codec="latin-1"):
        self.table, self.width, self.codec = table, width, codec

    def decode(self, raw: bytes) -> str:
        if self.table is None:
            return raw.decode(self.codec, errors="replace")
        w = self.width
        out = []
        for i in range(0, len(raw) - w + 1, w):
            code = int.from_bytes(raw[i : i + w], "big")
            out.append(self.table.get(code, "�"))
        return "".join(out)


_DEFAULT_DECODER = _FontDecoder()

#: Adobe Glyph List subset covering the names wild simple-font
#: /Differences arrays actually use outside full AGL territory; names
#: of the form uniXXXX / uXXXX(XX) and single-char names resolve
#: programmatically in _glyph_to_char.
_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&",
    "quotesingle": "'", "parenleft": "(", "parenright": ")",
    "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2",
    "three": "3", "four": "4", "five": "5", "six": "6", "seven": "7",
    "eight": "8", "nine": "9", "colon": ":", "semicolon": ";",
    "less": "<", "equal": "=", "greater": ">", "question": "?",
    "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "asciicircum": "^", "underscore": "_",
    "grave": "`", "braceleft": "{", "bar": "|", "braceright": "}",
    "asciitilde": "~", "Euro": "€", "emdash": "—", "endash": "–",
    "bullet": "•", "ellipsis": "…", "degree": "°",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "eacute": "é", "egrave": "è", "agrave": "à", "acircumflex": "â",
    "ecircumflex": "ê", "icircumflex": "î", "ocircumflex": "ô",
    "ucircumflex": "û", "adieresis": "ä", "odieresis": "ö",
    "udieresis": "ü", "Adieresis": "Ä", "Odieresis": "Ö",
    "Udieresis": "Ü", "ntilde": "ñ", "Ntilde": "Ñ", "ccedilla": "ç",
    "Ccedilla": "Ç", "Eacute": "É", "aacute": "á", "iacute": "í",
    "oacute": "ó", "uacute": "ú", "germandbls": "ß", "oslash": "ø",
    "aring": "å", "ae": "æ", "oe": "œ", "sterling": "£", "yen": "¥",
    "cent": "¢", "copyright": "©", "registered": "®",
    "trademark": "™", "section": "§", "paragraph": "¶",
    "plusminus": "±", "multiply": "×", "divide": "÷",
}


def _glyph_to_char(name: str) -> str | None:
    if len(name) == 1:
        return name  # /a /B /0 etc. name themselves
    if name in _GLYPH_NAMES:
        return _GLYPH_NAMES[name]
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        try:
            return chr(int(m.group(1), 16))
        except ValueError:
            return None
    return None


def _differences_decoder(enc_body: bytes) -> _FontDecoder | None:
    """Simple-font /Encoding dict with a /Differences array (PDF
    §9.6.5): start from the /BaseEncoding (WinAnsi, else latin-1) and
    overlay code→glyph-name assignments.  Unknown glyph names keep
    the base mapping (degrade, don't drop)."""
    dm = re.search(rb"/Differences\s*\[([^\]]*)\]", enc_body, re.S)
    if not dm:
        return None
    base = "cp1252" if b"/WinAnsiEncoding" in enc_body else "latin-1"
    table = {}
    for code in range(256):
        try:
            table[code] = bytes([code]).decode(base)
        except UnicodeDecodeError:
            table[code] = "�"
    code = 0
    for tok in re.finditer(rb"(\d+)|/([^\s/\[\]<>()]+)", dm.group(1)):
        if tok.group(1) is not None:
            code = int(tok.group(1))
            continue
        ch = _glyph_to_char(tok.group(2).decode("latin-1"))
        if ch is not None:
            table[code] = ch
        code += 1
    return _FontDecoder(table=table, width=1)


def _ref_num(body: bytes, key: bytes) -> int | None:
    m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _tounicode_decoder(
    objs: dict[int, bytes], body: bytes
) -> _FontDecoder | None:
    tu = _ref_num(body, rb"/ToUnicode")
    if tu is not None and tu in objs:
        data = _stream_payload(objs[tu])
        if data:
            table, width = _parse_tounicode(data)
            if table:
                return _FontDecoder(table=table, width=width)
    return None


def _build_font_decoder(objs: dict[int, bytes], fnum: int) -> _FontDecoder:
    body = objs.get(fnum, b"")
    dec = _tounicode_decoder(objs, body)
    if dec is not None:
        return dec
    # Type0 composite font (PDF §9.7): some writers hang the ToUnicode
    # CMap off the DESCENDANT CIDFont instead of the Type0 dict — the
    # array may be inline (/DescendantFonts [N 0 R]) or itself an
    # indirect ref to a one-element array
    if re.search(rb"/Subtype\s*/Type0\b", body):
        dm = re.search(rb"/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R", body)
        if dm is None:
            arr = _ref_num(body, rb"/DescendantFonts")
            if arr is not None and arr in objs:
                dm = re.search(rb"\[\s*(\d+)\s+\d+\s+R", objs[arr])
        if dm is not None:
            dec = _tounicode_decoder(objs, objs.get(int(dm.group(1)), b""))
            if dec is not None:
                return dec
        if b"/Identity-H" in body or b"/Identity-V" in body:
            # no CMap anywhere: Identity means code == CID; decode the
            # 2-byte codes as UTF-16BE (the standard best-effort when
            # CID == Unicode, e.g. Identity-keyed subset fonts) rather
            # than splitting them into latin-1 byte pairs
            return _FontDecoder(codec="utf-16-be", width=2)
    # /Encoding as a dict (inline or indirect) with /Differences
    enc_ref = _ref_num(body, rb"/Encoding")
    enc_body = objs.get(enc_ref, b"") if enc_ref is not None else body
    em = re.search(rb"/Encoding\s*<<(.*?)>>", body, re.S)
    if em is not None:
        enc_body = em.group(1)
    if b"/Differences" in enc_body:
        dec = _differences_decoder(enc_body)
        if dec is not None:
            return dec
    if b"/WinAnsiEncoding" in body or b"/WinAnsiEncoding" in enc_body:
        return _FontDecoder(codec="cp1252")
    return _DEFAULT_DECODER


def _font_map(
    objs: dict[int, bytes], page_body: bytes, cache: dict
) -> dict[bytes, _FontDecoder]:
    """Resource name (e.g. b'F1') → decoder for one page; /Resources
    may be inline or an indirect ref."""
    res = page_body
    rnum = _ref_num(page_body, rb"/Resources")
    if rnum is not None:
        res = objs.get(rnum, b"")
    fm = re.search(rb"/Font\s*<<(.*?)>>", res, re.S)
    if not fm:
        return {}
    out = {}
    for nm in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fm.group(1)):
        name, num = nm.group(1), int(nm.group(2))
        if num not in cache:
            cache[num] = _build_font_decoder(objs, num)
        out[name] = cache[num]
    return out


# --------------------------------------------------------------------------
# Text extraction.
# --------------------------------------------------------------------------


def _decode_string_token(tok: bytes, dec: _FontDecoder) -> str:
    if tok.startswith(b"("):
        return dec.decode(_unescape_pdf_string(tok[1:-1]))
    hexstr = re.sub(rb"\s+", b"", tok[1:-1])
    if len(hexstr) % 2:
        hexstr += b"0"  # odd count: trailing 0 implied, per spec
    return dec.decode(bytes.fromhex(hexstr.decode("ascii")))


def _extract_stream_text(
    data: bytes, fonts: dict[bytes, _FontDecoder]
) -> tuple[list[str], int]:
    chunks: list[str] = []
    n_ops = 0
    cur = _DEFAULT_DECODER
    for m in _TEXTOP_RE.finditer(data):
        if m.group(1) is not None:  # /Fn size Tf
            cur = fonts.get(m.group(1), _DEFAULT_DECODER)
            continue
        n_ops += 1
        parts = [
            _decode_string_token(s.group(0), cur)
            for s in _STR_RE.finditer(m.group(0))
        ]
        chunks.append("".join(parts))
    return chunks, n_ops


def extract_pdf_text(blob: bytes) -> dict:
    """Tolerant top-level entry: the parse paths below assume nothing
    about the bytes, but wild malformations are endless (odd-length
    CMap hex, junk /Index tokens, corrupt ObjStm headers, …) — the
    module contract is ok=false, never an exception, so one corrupt
    document can't fail a whole fleet task."""
    try:
        from .pdf_crypt import decrypt_pdf, trailer_encrypt_ref

        if trailer_encrypt_ref(blob) is not None:
            # r13: the standard security handler's empty-USER-password
            # case (owner-locked files — most wild "encrypted" PDFs)
            # decrypts transparently: RC4-40/128 and AES-128, /V 1-4.
            # Genuinely password-protected or unsupported handlers
            # still degrade loudly with the reason a curation pipeline
            # can filter/report on.  Detection is TRAILER-scoped (the
            # LAST trailer/xref-stream dict decides), so '/Encrypt N
            # G R' bytes inside an uncompressed content stream or a
            # superseded incremental-update trailer no longer misfire.
            blob = decrypt_pdf(blob)
            if blob is None:
                return _failure("encrypted")
        return _extract_pdf_text_unsafe(blob)
    except Exception:
        return _failure("parse error")


def _failure(reason: str) -> dict:
    return {
        "ok": False,
        "n_pages": 0,
        "n_text_ops": 0,
        "n_words": 0,
        "text": "",
        "reason": reason,
    }


def _extract_pdf_text_unsafe(blob: bytes) -> dict:
    objs = _collect_objects(blob)
    font_cache: dict[int, _FontDecoder] = {}
    n_pages = 0
    chunks: list[str] = []
    n_ops = 0
    claimed: set[int] = set()
    merged_fonts: dict[bytes, _FontDecoder] = {}
    # pass 1: pages, in object-number order (writers emit pages in
    # document order; the classic scan preserved file order the same way)
    pages = [
        (num, body)
        for num, body in sorted(objs.items())
        if re.search(rb"/Type\s*/Page\b(?!s)", body)
    ]
    for _, body in pages:
        n_pages += 1
        fonts = _font_map(objs, body, font_cache)
        merged_fonts.update(fonts)
        cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        content_nums = [int(cm.group(1))] if cm else []
        am = re.search(rb"/Contents\s*\[([^\]]*)\]", body)
        if am:
            content_nums = [
                int(x.group(1))
                for x in re.finditer(rb"(\d+)\s+\d+\s+R", am.group(1))
            ]
        for cn in content_nums:
            if cn not in objs:
                continue
            claimed.add(cn)
            data = _stream_payload(objs[cn])
            if data is None or b"BT" not in data:
                continue
            got, ops = _extract_stream_text(data, fonts)
            chunks.extend(got)
            n_ops += ops
    # pass 2 (tolerant): BT-bearing streams no page claims — a damaged
    # page tree still yields its text, with the union font map
    for num, body in sorted(objs.items()):
        if num in claimed or b"/ObjStm" in body or b"/XRef" in body:
            continue
        data = _stream_payload(body)
        if data is None or b"BT" not in data:
            continue
        got, ops = _extract_stream_text(data, merged_fonts)
        chunks.extend(got)
        n_ops += ops
    if not objs:
        return _failure("no objects")
    text = "\n".join(chunks)
    return {
        "ok": True,
        "n_pages": n_pages,
        "n_text_ops": n_ops,
        "n_words": len(text.split()),
        "text": text,
        "reason": "",
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


def write_pdf(
    path: str,
    pages: list[list[str]],
    compress: bool = False,
    encrypt: "bool | str" = False,
) -> None:
    """``pages`` = list of pages, each a list of text lines.  Every
    line becomes one Tj at its own Td position (alternate lines use a
    TJ array split mid-line, exercising the array path).

    ``encrypt``:
      * ``True`` — a structural /Encrypt dict with unverifiable zero
        /O//U entries and no /ID: emulates a genuinely
        password-protected file the reader must REFUSE (streams stay
        plaintext; nothing can decrypt them legitimately);
      * ``"rc4-40"`` / ``"rc4-128"`` / ``"aes-128"`` /
        ``"aes-256"`` (r13) — REAL standard-security-handler
        encryption with owner password 'owner' and an EMPTY user
        password (V1/R2, V2/R3, V4/R4+AESV2, V5/R6+AESV3): streams
        are actually enciphered (per-object keys for V<5, the file
        key directly for V5), /O//U//OE//UE//Perms computed per the
        spec algorithms, a deterministic /ID emitted — the
        empty-user-password shape the reader decrypts
        transparently."""
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
    encrypt_id = None
    file_id = b""
    if encrypt is True:
        encrypt_id = add(
            b"<< /Filter /Standard /V 1 /R 2 /O <"
            + b"00" * 32 + b"> /U <" + b"00" * 32 + b"> /P -44 >>"
        )
    elif encrypt:
        import hashlib
        import struct as _struct

        from .pdf_crypt import (
            aes_cbc_encrypt,
            aes_encrypt_block,
            compute_key,
            make_owner_entry,
            make_user_entry,
            object_key,
            rc4,
            v5_make_entries,
        )

        v, r, bits = {
            "rc4-40": (1, 2, 40),
            "rc4-128": (2, 3, 128),
            "aes-128": (4, 4, 128),
            "aes-256": (5, 6, 256),
        }[encrypt]
        nbytes, p = bits // 8, -44
        id0 = hashlib.md5(b"fixture-id:" + encrypt.encode()).digest()
        file_id = id0
        if v == 5:
            key = hashlib.sha256(b"fixture-filekey").digest()
            salts = [
                hashlib.md5(b"salt:%d" % i).digest()[:8]
                for i in range(4)
            ]
            u, ue, o, oe = v5_make_entries(
                key, b"", b"owner", r, *salts
            )
            perms = aes_encrypt_block(
                key,
                _struct.pack("<i", p) + b"\xff\xff\xff\xffTadbfix!",
            )
            encrypt_id = add(
                b"<< /Filter /Standard /V 5 /R " + str(r).encode()
                + b" /Length 256"
                + b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                + b" /StmF /StdCF /StrF /StdCF"
                + b" /O <" + o.hex().encode()
                + b"> /U <" + u.hex().encode()
                + b"> /OE <" + oe.hex().encode()
                + b"> /UE <" + ue.hex().encode()
                + b"> /Perms <" + perms.hex().encode()
                + b"> /P " + str(p).encode() + b" >>"
            )
        else:
            o = make_owner_entry(b"owner", b"", r, nbytes)
            key = compute_key(b"", o, p, id0, r, nbytes)
            u = make_user_entry(key, id0, r)
            extra = b" /Length " + str(bits).encode() if v >= 2 else b""
            if v == 4:
                extra += (
                    b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                    b" /StmF /StdCF /StrF /StdCF"
                )
            encrypt_id = add(
                b"<< /Filter /Standard /V " + str(v).encode()
                + b" /R " + str(r).encode() + extra
                + b" /O <" + o.hex().encode()
                + b"> /U <" + u.hex().encode()
                + b"> /P " + str(p).encode() + b" >>"
            )
        stream_re = re.compile(rb"stream\n(.*?)\nendstream", re.S)
        for idx in range(len(objects)):
            num = idx + 1
            if num == encrypt_id:
                continue
            m = stream_re.search(objects[idx])
            if not m:
                continue
            if v == 5:  # AESV3: the file key directly, no object salt
                iv = hashlib.md5(b"iv:%d" % num).digest()
                enc = aes_cbc_encrypt(key, m.group(1), iv)
            elif v == 4:
                ok = object_key(key, num, 0, True)
                iv = hashlib.md5(b"iv:%d" % num).digest()
                enc = aes_cbc_encrypt(ok, m.group(1), iv)
            else:
                enc = rc4(object_key(key, num, 0, False), m.group(1))
            body = (
                objects[idx][: m.start(1)] + enc + objects[idx][m.end(1):]
            )
            objects[idx] = re.sub(
                rb"/Length\s+\d+",
                b"/Length " + str(len(enc)).encode(),
                body,
                count=1,
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
    enc = (
        b" /Encrypt " + str(encrypt_id).encode() + b" 0 R"
        if encrypt_id is not None
        else b""
    )
    if file_id:
        h = file_id.hex().encode()
        enc += b" /ID [<" + h + b"> <" + h + b">]"
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root " + str(catalog).encode() + b" 0 R" + enc
        + b" >>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )
    with open(path, "wb") as f:
        f.write(bytes(out))


# --------------------------------------------------------------------------
# Fixture writer: spec-correct PDF 1.5 — object streams, xref stream
# (optionally PNG-Up predicted), ToUnicode CMap / WinAnsi fonts, hex
# strings.  The modern shape wild PDFs actually have.
# --------------------------------------------------------------------------

#: fixed 2-byte-code alphabet for the Type0/ToUnicode fixture: a..z via
#: one bfrange, the rest via bfchar entries (digits, space, accents)
CMAP_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 éñ€"
_CMAP_BASE = 0x0101


def _cmap_codes(s: str) -> bytes:
    out = bytearray()
    for ch in s:
        idx = CMAP_ALPHABET.index(ch)
        out += (_CMAP_BASE + idx).to_bytes(2, "big")
    return bytes(out)


def _tounicode_cmap() -> bytes:
    lines = [b"/CIDInit /ProcSet findresource begin", b"begincmap"]
    # a..z as ONE contiguous bfrange
    lines.append(b"1 beginbfrange")
    lines.append(
        b"<%04x> <%04x> <%04x>"
        % (_CMAP_BASE, _CMAP_BASE + 25, ord("a"))
    )
    lines.append(b"endbfrange")
    # the rest as bfchar entries (incl. an array-form bfrange for digits)
    rest = CMAP_ALPHABET[26:]
    digits, tail = rest[:10], rest[10:]
    arr = b" ".join(b"<%04x>" % ord(c) for c in digits)
    lines.append(b"1 beginbfrange")
    lines.append(
        b"<%04x> <%04x> [%s]"
        % (_CMAP_BASE + 26, _CMAP_BASE + 35, arr)
    )
    lines.append(b"endbfrange")
    lines.append(b"%d beginbfchar" % len(tail))
    for k, ch in enumerate(tail):
        dst = ch.encode("utf-16-be").hex().encode()
        lines.append(b"<%04x> <%s>" % (_CMAP_BASE + 36 + k, dst))
    lines.append(b"endbfchar")
    lines += [b"endcmap", b"end"]
    return b"\n".join(lines)


def write_pdf_15(
    path: str,
    pages: list[list[str]],
    font_kind: str = "cmap",
    predictor: bool = True,
    encrypt: str | None = None,
) -> None:
    """Emit a PDF 1.5 file: catalog/pages/page/font dicts inside an
    OBJECT STREAM, content (+CMap) streams top-level, and a
    cross-reference STREAM (``/W [1 2 2]``, PNG-Up predictor when
    ``predictor``) instead of an xref table.

    ``font_kind``: ``"cmap"`` — a Type0 font with Identity-H 2-byte
    codes and a /ToUnicode CMap; content uses HEX strings (every
    char of every line must be in :data:`CMAP_ALPHABET`).
    ``"cid"`` — same Type0/Identity-H shape, but the /ToUnicode CMap
    hangs off the DESCENDANT CIDFontType2 dict (the wild-writer
    variant the reader resolves through /DescendantFonts).
    ``"winansi"`` — a simple font with /Encoding /WinAnsiEncoding;
    content uses literal strings (cp1252 bytes, so é/€ round-trip).

    ``encrypt="rc4-128"`` (r13): real V2/R3 standard-security-handler
    encryption, owner password 'owner', EMPTY user password — every
    top-level stream and the object-stream payload are RC4'd with
    per-object keys (the xref stream stays clear per spec); RC4
    preserves byte length, so the xref stream's offsets remain exact
    over the encrypted bytes."""
    import hashlib as _hashlib

    from .pdf_crypt import (
        compute_key as _ck,
        make_owner_entry as _moe,
        make_user_entry as _mue,
        object_key as _okey,
        rc4 as _rc4,
    )

    enc_key = enc_id0 = enc_o = enc_u = None
    if encrypt is not None:
        if encrypt != "rc4-128":
            raise ValueError("write_pdf_15 supports encrypt='rc4-128'")
        enc_id0 = _hashlib.md5(b"fixture15-id").digest()
        enc_o = _moe(b"owner", b"", 3, 16)
        enc_key = _ck(b"", enc_o, -44, enc_id0, 3, 16)
        enc_u = _mue(enc_key, enc_id0, 3)

    streams: list[bytes] = []  # top-level stream objects, in order

    def add_stream(head: bytes, payload: bytes) -> int:
        num = len(streams) + 1  # object numbers 1..len(streams)
        if enc_key is not None:
            payload = _rc4(_okey(enc_key, num, 0, False), payload)
        streams.append(
            head[:-2].rstrip() + b" /Length " + str(len(payload)).encode()
            + b" >>\nstream\n" + payload + b"\nendstream"
        )
        return num

    content_nums = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 760 Td"]
        for li, line in enumerate(lines):
            if li:
                ops.append(b"0 -14 Td")
            if font_kind in ("cmap", "cid"):
                hexstr = _cmap_codes(line).hex().encode()
                if li % 2 == 1 and len(hexstr) > 8:
                    # split mid-line across a TJ array, hex both parts
                    cut = (len(hexstr) // 8) * 4
                    ops.append(
                        b"[<" + hexstr[:cut] + b"> -120 <"
                        + hexstr[cut:] + b">] TJ"
                    )
                else:
                    ops.append(b"<" + hexstr + b"> Tj")
            else:
                raw = line.encode("cp1252")
                esc = (
                    raw.replace(b"\\", b"\\\\")
                    .replace(b"(", b"\\(")
                    .replace(b")", b"\\)")
                )
                ops.append(b"(" + esc + b") Tj")
        ops.append(b"ET")
        payload = zlib.compress(b"\n".join(ops))
        content_nums.append(
            add_stream(b"<< /Filter /FlateDecode >>", payload)
        )

    cmap_num = None
    if font_kind in ("cmap", "cid"):
        cmap_num = add_stream(b"<< >>", _tounicode_cmap())

    # dict objects live in the object stream; number them after streams
    # (the /Encrypt dict may not live in an object stream, so it takes
    # the first top-level slot when encryption is on)
    encrypt_num = len(streams) + 1 if enc_key is not None else None
    objstm_num = len(streams) + (2 if enc_key is not None else 1)
    xref_num = objstm_num + 1
    first_dict = xref_num + 1
    font_num = first_dict
    n_font_dicts = 2 if font_kind == "cid" else 1
    descendant_num = first_dict + 1 if font_kind == "cid" else None
    page_nums = [
        first_dict + n_font_dicts + k for k in range(len(pages))
    ]
    pages_num = first_dict + n_font_dicts + len(pages)
    catalog_num = pages_num + 1

    dict_objs: list[tuple[int, bytes]] = []
    if font_kind == "cmap":
        font_body = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture"
            b" /Encoding /Identity-H /ToUnicode "
            + str(cmap_num).encode() + b" 0 R >>"
        )
    elif font_kind == "cid":
        # the ToUnicode hangs off the descendant CIDFont, not the
        # Type0 dict — the shape _build_font_decoder resolves through
        # /DescendantFonts
        font_body = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCID"
            b" /Encoding /Identity-H /DescendantFonts ["
            + str(descendant_num).encode() + b" 0 R] >>"
        )
        dict_objs.append((
            descendant_num,
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont"
            b" /FixtureCID /ToUnicode "
            + str(cmap_num).encode() + b" 0 R >>",
        ))
    else:
        font_body = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"
        )
    dict_objs.insert(0, (font_num, font_body))
    for k, cn in enumerate(content_nums):
        dict_objs.append((
            page_nums[k],
            b"<< /Type /Page /Parent " + str(pages_num).encode()
            + b" 0 R /MediaBox [0 0 612 792] /Contents "
            + str(cn).encode() + b" 0 R /Resources << /Font << /F1 "
            + str(font_num).encode() + b" 0 R >> >> >>",
        ))
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_nums)
    dict_objs.append((
        pages_num,
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(pages)).encode() + b" >>",
    ))
    dict_objs.append((
        catalog_num,
        b"<< /Type /Catalog /Pages " + str(pages_num).encode() + b" 0 R >>",
    ))

    # assemble the object stream: header pairs then bodies
    bodies = b""
    pairs = []
    for num, body in dict_objs:
        pairs.append((num, len(bodies)))
        bodies += body + b"\n"
    header = b" ".join(
        b"%d %d" % (num, off) for num, off in pairs
    ) + b"\n"
    objstm_payload = zlib.compress(header + bodies)
    if enc_key is not None:
        objstm_payload = _rc4(
            _okey(enc_key, objstm_num, 0, False), objstm_payload
        )
    objstm_head = (
        b"<< /Type /ObjStm /N " + str(len(dict_objs)).encode()
        + b" /First " + str(len(header)).encode()
        + b" /Filter /FlateDecode /Length "
        + str(len(objstm_payload)).encode() + b" >>"
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num, body in enumerate(streams, start=1):
        offsets[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    if encrypt_num is not None:
        offsets[encrypt_num] = len(out)
        out += (
            str(encrypt_num).encode()
            + b" 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128"
            + b" /O <" + enc_o.hex().encode()
            + b"> /U <" + enc_u.hex().encode()
            + b"> /P -44 >>\nendobj\n"
        )
    offsets[objstm_num] = len(out)
    out += (
        str(objstm_num).encode() + b" 0 obj\n" + objstm_head
        + b"\nstream\n" + objstm_payload + b"\nendstream\nendobj\n"
    )

    # xref stream: W [1 2 2]; entries for 0..catalog_num + self
    size = catalog_num + 1
    xref_at = len(out)
    rows = []
    rows.append((0, 0, 65535))
    for num in range(1, objstm_num + 1):
        rows.append((1, offsets[num], 0))
    rows.append((1, xref_at, 0))  # the xref stream itself
    for k, (num, _) in enumerate(dict_objs):
        rows.append((2, objstm_num, k))
    # rows are in object-number order 0..size-1 by construction
    raw = b"".join(
        bytes([t]) + f2.to_bytes(2, "big") + f3.to_bytes(2, "big")
        for t, f2, f3 in rows
    )
    parms = b""
    if predictor:
        cols = 5
        pred = bytearray()
        prev = bytearray(cols)
        for r in range(0, len(raw), cols):
            row = bytearray(raw[r : r + cols])
            enc = bytearray([2]) + bytearray(
                (row[i] - prev[i]) & 0xFF for i in range(cols)
            )
            pred += enc
            prev = row
        raw = bytes(pred)
        parms = b" /DecodeParms << /Predictor 12 /Columns 5 >>"
    xref_payload = zlib.compress(raw)  # the xref stream is never encrypted
    enc_trailer = b""
    if encrypt_num is not None:
        h = enc_id0.hex().encode()
        enc_trailer = (
            b" /Encrypt " + str(encrypt_num).encode()
            + b" 0 R /ID [<" + h + b"> <" + h + b">]"
        )
    out += (
        str(xref_num).encode() + b" 0 obj\n<< /Type /XRef /Size "
        + str(size).encode() + b" /W [1 2 2] /Root "
        + str(catalog_num).encode() + b" 0 R" + enc_trailer
        + b" /Filter /FlateDecode"
        + parms + b" /Length " + str(len(xref_payload)).encode()
        + b" >>\nstream\n" + xref_payload + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    with open(path, "wb") as f:
        f.write(bytes(out))
