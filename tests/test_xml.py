"""XML ingest tests (sources/xml.py)."""

from __future__ import annotations

from artis_data_ingest_spark.sources.xml import (
    parse_xml_rows,
    read_xml,
)


def test_paths_attributes_and_namespaces():
    blob = (
        b'<root xmlns="http://example/ns" xmlns:x="http://other">\n'
        b'  <item x:kind="a"><name>one</name>'
        b'<meta><score unit="pt">10</score></meta></item>\n'
        b'  <item kind="b"><name>two</name><meta/></item>\n'
        b"</root>"
    )
    rows, ok = parse_xml_rows(blob, "item", {
        "name": "name",
        "kind": "@kind",
        "score": "meta/score",
        "unit": "meta/score/@unit",
    })
    assert ok
    assert rows == [
        {"name": "one", "kind": "a", "score": "10", "unit": "pt"},
        {"name": "two", "kind": "b", "score": None, "unit": None},
    ]


def test_sitemap_shape():
    blob = (
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://a/1</loc><lastmod>2024-01-01</lastmod>"
        b"</url><url><loc>https://a/2</loc></url></urlset>"
    )
    rows, ok = parse_xml_rows(
        blob, "url", {"loc": "loc", "lastmod": "lastmod"}
    )
    assert ok and [r["loc"] for r in rows] == \
        ["https://a/1", "https://a/2"]
    assert rows[1]["lastmod"] is None


def test_truncated_document_salvages_prefix():
    blob = (
        b"<r><row><v>1</v></row><row><v>2</v></row><row><v>3"
    )
    rows, ok = parse_xml_rows(blob, "row", {"v": "v"})
    assert not ok
    assert [r["v"] for r in rows] == ["1", "2"]


def test_read_xml_distributed_with_corrupt_sentinel(spark, tmp_path):
    (tmp_path / "a.xml").write_bytes(
        b"<r><row><v>1</v></row></r>"
    )
    (tmp_path / "b.xml").write_bytes(b"<r><row><v>2</v></row><row>")
    (tmp_path / "skip.txt").write_bytes(b"not xml, not matched")
    df = read_xml(spark, str(tmp_path), "row", {"v": "v"})
    rows = {(r["_source"], r["v"], r["_corrupt"])
            for r in df.collect()}
    assert rows == {
        ("a.xml", "1", False),
        ("b.xml", "2", False),
        ("b.xml", None, True),
    }
