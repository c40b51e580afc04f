"""EPUB ingest tests (sources/epub.py)."""

from __future__ import annotations

import io
import zipfile

import pytest

from artis_data_ingest_spark.sources.epub import (
    parse_epub,
    read_epub,
    write_minimal_epub,
    xhtml_to_text,
)


def test_xhtml_to_text_blocks_entities_and_noise():
    text = xhtml_to_text(
        "<html><head><style>p{color:red}</style></head><body>"
        "<h1>Title &amp; More</h1>"
        "<p>first <i>styled</i> line</p>"
        "<script>alert(1)</script>"
        "<p>second&nbsp;line</p></body></html>"
    )
    lines = text.split("\n")
    assert lines[0] == "Title & More"
    assert lines[1] == "first styled line"
    assert "alert" not in text and "color" not in text
    assert "second\xa0line" in lines[2] or "second line" in lines[2]


def test_spine_order_wins_over_manifest_order():
    # manifest lists ch1 before ch0; the spine says ch0 first
    blob = io.BytesIO()
    with zipfile.ZipFile(blob, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "META-INF/container.xml",
            '<container xmlns="urn:x"><rootfiles><rootfile '
            'full-path="content.opf"/></rootfiles></container>',
        )
        zf.writestr(
            "content.opf",
            '<package xmlns="urn:y">'
            '<metadata xmlns:dc="urn:dc"><dc:title>T</dc:title>'
            "</metadata><manifest>"
            '<item id="b" href="ch1.xhtml"/>'
            '<item id="a" href="ch0.xhtml"/>'
            '</manifest><spine><itemref idref="a"/>'
            '<itemref idref="b"/></spine></package>',
        )
        zf.writestr("ch0.xhtml", "<body><p>zero</p></body>")
        zf.writestr("ch1.xhtml", "<body><p>one</p></body>")
    title, chapters = parse_epub(blob.getvalue())
    assert title == "T"
    assert [c[0] for c in chapters] == ["ch0.xhtml", "ch1.xhtml"]
    assert [c[1] for c in chapters] == ["zero", "one"]


def test_opf_relative_paths_resolve():
    blob = write_minimal_epub("B", [("sub/ch.xhtml",
                                     "<p>nested dir</p>")])
    # write_minimal_epub roots chapters under OEBPS/ — the OPF base
    _, chapters = parse_epub(blob)
    assert chapters == [("sub/ch.xhtml", "nested dir")]


def test_parse_epub_rejects_garbage():
    with pytest.raises(Exception):
        parse_epub(b"PK\x03\x04 not really an epub")


def test_read_epub_distributed_with_corrupt_sentinel(spark, tmp_path):
    good = write_minimal_epub("G", [("c.xhtml", "<p>hello</p>")])
    (tmp_path / "good.epub").write_bytes(good)
    (tmp_path / "bad.epub").write_bytes(b"not a zip at all")
    df = read_epub(spark, str(tmp_path))
    rows = {(r["book"], r["text"], r["_corrupt"])
            for r in df.collect()}
    assert rows == {
        ("good.epub", "hello", False),
        ("bad.epub", None, True),
    }
    good_row = next(r for r in df.collect() if r["book"] == "good.epub")
    assert good_row["book_title"] == "G" and good_row["spine_pos"] == 1
