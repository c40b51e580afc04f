"""HTML link extraction (SURVEY.md §2.1 S1-S4) — the scraper front-end.

The reference fetches one CEPII page and XPath-extracts download links
(``scrape_newest_baci_data.R:20-29``). Spark-first shape: the fetch is a
driver-side side effect (one URL — no cluster needed); parsing is the
SQL ``xpath`` function family over the fetched text, so the same
extraction works distributed when given millions of crawled pages.

No network calls here: ``fetch`` is injectable, and tests pass static
HTML.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import absolutize_url


def default_fetch(url: str) -> str:  # pragma: no cover - network
    from urllib.request import Request, urlopen

    req = Request(url, headers={"User-Agent": "artis-data-ingest-spark"})
    with urlopen(req, timeout=60) as resp:
        return resp.read().decode("utf-8", errors="replace")


def extract_links(
    spark: SparkSession,
    html_df: DataFrame,
    html_col: str = "html",
    section_xpath: str | None = None,
) -> DataFrame:
    """S2-S4 — XPath href extraction: ``xpath(html, '//a/@href')`` →
    explode to one row per link. ``section_xpath`` optionally scopes the
    search to a page section first (the reference anchors on
    ``//div[@id='telechargement']``, scrape_newest_baci_data.R:23)."""
    path = (section_xpath or "") + "//a/@href"
    # call_function + lit keeps the xpath out of SQL-string space, so
    # quotes in the expression can't break (or inject into) the parse
    return html_df.select(
        "*",
        F.explode(
            F.call_function("xpath", F.col(html_col), F.lit(path))
        ).alias("href"),
    ).drop(html_col)


def scrape_links(
    spark: SparkSession,
    url: str,
    fetch: Callable[[str], str] = default_fetch,
    keep_pattern: str = r"(?i)\.(zip|pdf)$",
    base_url: str = "https://www.cepii.fr",
) -> DataFrame:
    """The full scraper pipeline (scrape_newest_baci_data.R:17-41):
    fetch → xpath hrefs → drop nulls → regex keep → absolutize →
    distinct."""
    html = fetch(url)
    html_df = spark.createDataFrame([(url, html)], ["source_url", "html"])
    return (
        extract_links(spark, html_df)
        .filter(F.col("href").isNotNull())
        .filter(F.col("href").rlike(keep_pattern))
        .select(
            "source_url", absolutize_url("href", base_url).alias("url")
        )
        .distinct()
    )
