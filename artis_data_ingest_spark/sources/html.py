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


BLOCK_SPLIT_RE = r"(?i)</(?:p|div|li|h[1-6]|nav|footer|section|article|td)>"
TAG_RE = r"<[^>]*>"
ANCHOR_TEXT_RE = r"<a[^>]*>([^<]*)</a>"


def extract_main_content(
    html_df: DataFrame,
    html_col: str = "html",
    min_block_chars: int = 25,
    max_link_density_thirds: int = 1,
) -> DataFrame:
    """Boilerpipe-style main-content extraction (Kohlschütter et al.
    2010, simplified to its load-bearing signals) — the crawl step
    between fetching a page and cleaning its text: navigation chrome,
    ad units and footers must not reach the training corpus.

    Pipeline (pure codegen, zero UDFs, mirrored op-for-op by the
    q_html_main_content oracle):
      1. drop <script>/<style> payloads;
      2. split into blocks at block-level closing tags;
      3. per block: visible text = tag-strip + whitespace collapse,
         and LINK DENSITY = anchor-text chars / text chars — the one
         signal that separates nav/footer link farms from prose;
      4. keep blocks with >= ``min_block_chars`` visible chars and
         link density < ``max_link_density_thirds``/3 (integer
         comparison — no float threshold).

    Returns one row per kept block: (doc_id, block_idx, btext).
    Aggregate downstream (the query sums lengths + md5-prefix
    checksums, a production job feeds btext into the cleaning stack).
    Regex subset is shared Java-regex/RE2 (lazy dotall for script
    payloads, no lookarounds), so Spark and DuckDB split identically.
    """
    nos = html_df.withColumn(
        html_col,
        F.regexp_replace(
            F.regexp_replace(
                F.col(html_col), r"(?is)<script.*?</script>", " "
            ),
            r"(?is)<style.*?</style>",
            " ",
        ),
    )
    blocks = nos.select(
        "doc_id",
        F.posexplode(F.split(F.col(html_col), BLOCK_SPLIT_RE)).alias(
            "block_idx", "chunk"
        ),
    )
    btext = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("chunk"), TAG_RE, " "), r"\s+", " "
        )
    )
    link_len = F.aggregate(
        F.transform(
            F.expr(f"regexp_extract_all(chunk, '{ANCHOR_TEXT_RE}', 1)"),
            lambda x: F.length(x).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = blocks.select(
        "doc_id",
        "block_idx",
        btext.alias("btext"),
        link_len.alias("link_len"),
    )
    return scored.filter(
        (F.length("btext") >= min_block_chars)
        & (
            3 * F.col("link_len")
            < max_link_density_thirds * F.length("btext")
        )
    ).select("doc_id", "block_idx", "btext")
