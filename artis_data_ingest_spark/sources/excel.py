"""Excel ingestion (SURVEY.md §2.1 S9) — stdlib xlsx parser.

The reference ingests FAO snapshot workbooks with ``read_xlsx(file,
skip = 1)`` (assess_changes.qmd:131-132, 137-138).  Spark has no core
Excel reader and this container has no openpyxl, so the reader here
parses the OOXML container directly with ``zipfile`` + ``xml.etree``:
a .xlsx file is a zip holding ``xl/worksheets/sheet1.xml`` (cell grid),
``xl/sharedStrings.xml`` (string pool) — nothing more is needed for
the reference's tabular snapshots.

Scale shape: xlsx files are small config-like inputs in the reference's
world, so a driver-side parse feeding ``createDataFrame`` is the right
trade-off; for many files, list them with the binaryFile source and
move ``parse_xlsx_bytes`` into a ``mapInPandas`` decode so each archive
parses inside an executor task (same pattern as ``sources/archives.py``).
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'B7' → 1, 'AA3' → 26."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(raw)
    out = []
    for si in root.findall(f"{_NS}si"):
        # rich-text runs split one string across several <t> nodes
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(cell: ET.Element, shared: list[str]):
    """Decode one <c> element to a Python scalar (str/int/float/bool/None)."""
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{_NS}t")) or None
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    text = v.text
    if ctype == "s":
        return shared[int(text)]
    if ctype in ("str",):  # formula result stored as text
        return text
    if ctype == "b":
        return text == "1"
    try:
        return int(text)
    except ValueError:
        try:
            return float(text)
        except ValueError:
            return text


def parse_xlsx_bytes(
    raw: bytes, skip_rows: int = 0
) -> tuple[list[str], list[list]]:
    """Parse the first worksheet of an xlsx payload into
    ``(header, rows)``, skipping ``skip_rows`` leading rows before the
    header — the semantics of the reference's ``read_xlsx(skip = 1)``.

    Sparse rows are densified from cell references so a missing cell
    becomes ``None`` in its column position.
    """
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        sheets = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
            key=lambda n: int(re.search(r"\d+", n.rsplit("/", 1)[1]).group()),
        )
        if not sheets:
            raise ValueError("xlsx payload has no worksheets")
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(sheets[0]))

    grid: list[list] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for pos, cell in enumerate(row.findall(f"{_NS}c")):
            ref = cell.get("r")
            ci = _col_index(ref) if ref else pos
            cells[ci] = _cell_value(cell, shared)
        width = max(cells) + 1 if cells else 0
        grid.append([cells.get(i) for i in range(width)])

    grid = grid[skip_rows:]
    if not grid:
        raise ValueError("xlsx sheet has no rows after skip_rows")
    header = [str(h) if h is not None else f"_c{i}"
              for i, h in enumerate(grid[0])]
    width = len(header)
    rows = [r[:width] + [None] * (width - len(r)) for r in grid[1:]]
    return header, rows


def _column_type(values: list) -> T.DataType:
    seen = {type(v) for v in values if v is not None}
    if not seen:
        return T.StringType()
    if seen <= {bool}:
        return T.BooleanType()
    if seen <= {int}:
        return T.LongType()
    if seen <= {int, float}:
        return T.DoubleType()
    return T.StringType()


def read_excel(
    spark: SparkSession, path: str, skip_rows: int = 1
) -> DataFrame:
    """S9 — ``read_xlsx(file, skip = 1)`` equivalent
    (assess_changes.qmd:131-132): skip ``skip_rows`` rows, treat the
    next as header, infer long/double/boolean/string per column.

    Accepts plain paths or the ``file:`` URIs the binaryFile listing
    yields (changelog stage 5 feeds those straight in).
    """
    if path.startswith("file:"):
        path = re.sub("^file:/+", "/", path)
    with open(path, "rb") as f:
        raw = f.read()
    header, rows = parse_xlsx_bytes(raw, skip_rows=skip_rows)
    cols = list(zip(*rows)) if rows else [()] * len(header)
    types = [_column_type(list(c)) for c in cols]
    schema = T.StructType(
        [T.StructField(n, t, True) for n, t in zip(header, types)]
    )

    def _coerce(v, dtype):
        if v is None:
            return None
        if isinstance(dtype, T.DoubleType):
            return float(v)
        if isinstance(dtype, T.StringType):
            return str(v)
        return v

    data = [
        tuple(_coerce(v, t) for v, t in zip(r, types)) for r in rows
    ]
    return spark.createDataFrame(data, schema=schema)


def write_minimal_xlsx(target, rows: list[list]) -> None:
    """Fixture/test helper: write ``rows`` (lists of str/int/float/bool/
    None) as a single-sheet xlsx using only the stdlib.  Strings go
    inline (no shared-string pool); numbers/booleans as native cells.
    ``target`` is a path or binary file object.
    """

    def _cell(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        s = (str(v).replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;"))
        return f'<c r="{ref}" t="inlineStr"><is><t>{s}</t></is></c>'

    def _ref(ci: int, ri: int) -> str:
        letters = ""
        ci += 1
        while ci:
            ci, rem = divmod(ci - 1, 26)
            letters = chr(ord("A") + rem) + letters
        return f"{letters}{ri + 1}"

    body = "".join(
        f'<row r="{ri + 1}">'
        + "".join(_cell(_ref(ci, ri), v) for ci, v in enumerate(row))
        + "</row>"
        for ri, row in enumerate(rows)
    )
    ns = _NS[1:-1]
    sheet = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             f'<worksheet xmlns="{ns}"><sheetData>{body}</sheetData>'
             f'</worksheet>')
    workbook = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats.'
        f'org/officeDocument/2006/relationships"><sheets>'
        f'<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/officeDocument"'
        ' Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/><Default Extension='
        '"xml" ContentType="application/xml"/><Override PartName='
        '"/xl/workbook.xml" ContentType="application/vnd.openxmlformats-'
        'officedocument.spreadsheetml.sheet.main+xml"/><Override PartName='
        '"/xl/worksheets/sheet1.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    close = False
    if isinstance(target, (str, bytes)):
        target = open(target, "wb")
        close = True
    try:
        with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("[Content_Types].xml", content_types)
            zf.writestr("_rels/.rels", root_rels)
            zf.writestr("xl/workbook.xml", workbook)
            zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
            zf.writestr("xl/worksheets/sheet1.xml", sheet)
    finally:
        if close:
            target.close()


def dataframe_from_pandas_bytes(
    spark: SparkSession, raw: bytes, reader
) -> DataFrame:
    """Bridge used by tests and by archive ingestion: parse bytes with a
    pandas reader callable and lift the result into a DataFrame."""
    pdf = reader(io.BytesIO(raw))
    return spark.createDataFrame(pdf)
