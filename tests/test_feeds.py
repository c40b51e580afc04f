"""RSS/Atom feed ingest (sources/feeds.py)."""

from __future__ import annotations

import datetime
import os

from artis_data_ingest_spark.sources.feeds import read_feeds

_RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Example Blog</title>
  <item>
    <title>First post</title>
    <link>https://ex.org/1</link>
    <guid>tag:1</guid>
    <pubDate>Mon, 01 Apr 2024 10:30:00 GMT</pubDate>
    <description>hello world</description>
    <category>a</category><category>b</category>
  </item>
  <item>
    <title>Second</title>
    <link>https://ex.org/2</link>
    <guid>tag:2</guid>
    <pubDate>not a date</pubDate>
  </item>
</channel></rss>
"""

_ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Feed</title>
  <entry>
    <id>urn:e1</id>
    <title>Entry one</title>
    <link rel="self" href="https://ex.org/self"/>
    <link rel="alternate" href="https://ex.org/e1"/>
    <published>2024-04-02T08:00:00Z</published>
    <summary>sum</summary>
    <category term="x"/>
  </entry>
  <entry>
    <id>urn:e2</id>
    <title>Entry two</title>
    <link href="https://ex.org/e2"/>
    <updated>2024-04-03T09:15:00+02:00</updated>
    <content>longer content here</content>
  </entry>
</feed>
"""


def _write(d, name, text):
    with open(os.path.join(d, name), "w") as fh:
        fh.write(text)


def test_rss_and_atom_normalize(spark, tmp_path):
    d = str(tmp_path)
    _write(d, "blog.xml", _RSS)
    _write(d, "atom.xml", _ATOM)
    _write(d, "broken.xml", "<rss><channel><item>")
    rows = {
        (r["_source"], r["format"], r["entry_seq"], r["guid"],
         r["link"], r["published_ts"], r["summary_chars"],
         r["n_categories"], r["_corrupt"])
        for r in read_feeds(spark, d).collect()
    }
    utc = datetime.timezone.utc
    # session tz is UTC, so naive collected values are UTC wall times
    assert ("blog.xml", "rss", 1, "tag:1", "https://ex.org/1",
            datetime.datetime(2024, 4, 1, 10, 30), 11, 2,
            False) in rows
    # unparseable date -> null ts, missing description -> null chars
    assert ("blog.xml", "rss", 2, "tag:2", "https://ex.org/2",
            None, None, 0, False) in rows
    # atom: alternate link wins over self; Z-suffix date
    assert ("atom.xml", "atom", 1, "urn:e1", "https://ex.org/e1",
            datetime.datetime(2024, 4, 2, 8, 0), 3, 1,
            False) in rows
    # rel-less link is alternate; +02:00 normalized to UTC;
    # content falls back for summary
    assert ("atom.xml", "atom", 2, "urn:e2", "https://ex.org/e2",
            datetime.datetime(2024, 4, 3, 7, 15), 19, 0,
            False) in rows
    assert ("broken.xml", None, None, None, None, None, None, None,
            True) in rows
    assert len(rows) == 5
    del utc


def test_feed_titles_carried(spark, tmp_path):
    d = str(tmp_path)
    _write(d, "blog.xml", _RSS)
    titles = {r["feed_title"]
              for r in read_feeds(spark, d).collect()}
    assert titles == {"Example Blog"}


def test_non_feed_xml_is_corrupt_row(spark, tmp_path):
    d = str(tmp_path)
    _write(d, "notafeed.xml", "<html><body>nope</body></html>")
    rows = read_feeds(spark, d).collect()
    assert len(rows) == 1 and rows[0]["_corrupt"]
