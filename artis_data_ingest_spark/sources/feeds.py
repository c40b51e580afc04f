"""RSS 2.0 / Atom feed ingest — stdlib ``xml.etree`` only, the
syndication-shaped half of the web-scrape surface (sources/html.py
scrapes pages, sources/xml.py reads dumps; feeds are how NEW content
announces itself, and a crawl pipeline tails them for freshness).

``read_feeds`` reads a directory (or explicit list) of feed
documents — one task per file, format AUTO-DETECTED per document by
root element (``<rss>``/``<feed>``) — and emits one NORMALIZED row
per item/entry:

  ``_source, format, feed_title, entry_seq, guid, title, link,
  published_ts, summary_chars, n_categories, _corrupt``

with the two formats' vocabularies folded together (RSS
``guid``/``pubDate``/``description`` ↔ Atom ``id``/``published`` or
``updated``/``summary``; Atom links resolve the ``rel="alternate"``
(or rel-less) ``href``).  Dates: RFC 822 for RSS
(``email.utils.parsedate_to_datetime``), ISO 8601 for Atom — both
normalized to UTC; unparseable dates yield null, not a crash.
Malformed documents contribute one ``_corrupt`` row carrying the
file name (the permissive contract shared with the JSONL / media /
mailbox / XML sources) — a crawl must never lose a shard silently.

Namespace handling is local-name-insensitive, like read_xml: real
feeds carry Atom/DC/content namespaces in every flavor of prefix.

Scale: one task per feed document via ``binaryFile`` (feeds are
small, the corpus is many of them); full-document parse, O(one
feed) memory per task.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = (
    "_source string, format string, feed_title string, "
    "entry_seq bigint, guid string, title string, link string, "
    "published_ts timestamp, summary_chars bigint, "
    "n_categories bigint, _corrupt boolean"
)


def _local(tag) -> str:
    t = tag if isinstance(tag, str) else ""
    return t.rsplit("}", 1)[-1].lower()


def _child_text(elem, name: str) -> str | None:
    for c in elem:
        if _local(c.tag) == name:
            return (c.text or "").strip() or None
    return None


def _parse_rss_date(s: str | None):
    if not s:
        return None
    import datetime
    from email.utils import parsedate_to_datetime

    try:
        dt = parsedate_to_datetime(s)
    except (TypeError, ValueError):
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return dt.astimezone(datetime.timezone.utc)


def _parse_atom_date(s: str | None):
    if not s:
        return None
    import datetime

    try:
        dt = datetime.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return dt.astimezone(datetime.timezone.utc)


def _parse_feed(name: str, data: bytes) -> list[tuple]:
    """One feed document → normalized rows (or one _corrupt row)."""
    import xml.etree.ElementTree as ET

    corrupt = (name, None, None, None, None, None, None, None, None,
               None, True)
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return [corrupt]
    rows: list[tuple] = []
    kind = _local(root.tag)
    if kind == "rss":
        channel = next(
            (c for c in root if _local(c.tag) == "channel"), None
        )
        if channel is None:
            return [corrupt]
        feed_title = _child_text(channel, "title")
        seq = 0
        for item in channel:
            if _local(item.tag) != "item":
                continue
            seq += 1
            desc = _child_text(item, "description")
            cats = sum(
                1 for c in item if _local(c.tag) == "category"
            )
            rows.append((
                name, "rss", feed_title, seq,
                _child_text(item, "guid"),
                _child_text(item, "title"),
                _child_text(item, "link"),
                _parse_rss_date(_child_text(item, "pubdate")),
                len(desc) if desc is not None else None,
                cats, False,
            ))
    elif kind == "feed":
        feed_title = _child_text(root, "title")
        seq = 0
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            seq += 1
            link = None
            for c in entry:
                if _local(c.tag) == "link":
                    rel = c.get("rel") or "alternate"
                    if rel == "alternate":
                        link = c.get("href")
                        break
            published = (
                _child_text(entry, "published")
                or _child_text(entry, "updated")
            )
            summary = (
                _child_text(entry, "summary")
                or _child_text(entry, "content")
            )
            cats = sum(
                1 for c in entry if _local(c.tag) == "category"
            )
            rows.append((
                name, "atom", feed_title, seq,
                _child_text(entry, "id"),
                _child_text(entry, "title"),
                link,
                _parse_atom_date(published),
                len(summary) if summary is not None else None,
                cats, False,
            ))
    else:
        return [corrupt]
    return rows


def read_feeds(
    spark: SparkSession, path: str, glob: str = "*.xml"
) -> DataFrame:
    """Normalized item rows from every feed document under ``path``
    (RSS 2.0 and Atom, auto-detected per file)."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def _parse(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        cols = [
            "_source", "format", "feed_title", "entry_seq", "guid",
            "title", "link", "published_ts", "summary_chars",
            "n_categories", "_corrupt",
        ]
        for pdf in batches:
            rows: list[tuple] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    _parse_feed(os.path.basename(p), bytes(content))
                )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(_parse, schema=_SCHEMA)
