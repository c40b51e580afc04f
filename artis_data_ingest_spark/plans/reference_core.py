"""Oracle-checked queries covering the reference's own operator surface
(SURVEY.md §2: P1-P12, F1-F10, E1-E5, J1, A1-A4, R1-R2, U1).

The fixture tables stand in for the reference's file listings and FAO
production tables; where the reference's inputs have properties the
fixtures lack (nulls, relative URLs, version-suffixed filenames), we
derive them deterministically from fixture columns inside the query —
identically in the Spark plan and the DuckDB oracle — so the operator
semantics under test are real even though the substrate is synthetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import (
    absolutize_url,
    basename,
    standardize_key,
    standardize_key_sql,
)
from ..operators.clean import clean_prod, not_in_keep_nulls
from ..operators.diff import (
    column_set_diff,
    dataset_diff,
    pivot_align,
    size_delta,
    snapshot_align,
    union_tag,
)
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Scraper pipeline (scrape_newest_baci_data.R:20-41): synth hrefs →
# drop-NA (P1) → case-insensitive regex keep (P2) → absolutize (P11/F9/
# F10) → distinct (E1).
# ---------------------------------------------------------------------------


@register(
    "q_scraper_links",
    oracle="""
WITH hrefs AS (
  SELECT CASE
    WHEN doc_id % 7 = 0 THEN NULL
    WHEN doc_id % 3 = 0 THEN 'http://download.example/' || source || '.zip'
    WHEN doc_id % 3 = 1 THEN '/bdd_modele/' || source || '.PDF'
    ELSE '/presentation/' || source || '.html'
  END AS href
  FROM documents
)
SELECT DISTINCT
  CASE WHEN regexp_matches(href, '^http')
       THEN href
       ELSE 'https://www.cepii.fr' || href END AS url
FROM hrefs
WHERE href IS NOT NULL
  AND regexp_matches(href, '(?i)\\.(zip|pdf)$')
ORDER BY url
""",
    doc="Full scraper pipeline re-expression (scrape_newest_baci_data.R:29-41): "
    "not-null filter, (?i) regex keep, conditional URL absolutization, distinct.",
)
def q_scraper_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    href = (
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("http://download.example/"), F.col("source"), F.lit(".zip")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("/bdd_modele/"), F.col("source"), F.lit(".PDF")),
        )
        .otherwise(
            F.concat(F.lit("/presentation/"), F.col("source"), F.lit(".html"))
        )
    )
    return (
        docs.select(href.alias("href"))
        .filter(F.col("href").isNotNull())  # P1 (R:32)
        .filter(F.col("href").rlike(r"(?i)\.(zip|pdf)$"))  # P2 (R:35)
        .select(absolutize_url("href").alias("url"))  # P11/F9/F10 (R:38)
        .distinct()  # E1 (R:41)
        .orderBy("url")
    )


# ---------------------------------------------------------------------------
# Standardization key (F1-F6 chain, assess_changes.qmd:84-94).
# ---------------------------------------------------------------------------


@register(
    "q_slugify_key",
    oracle=f"""
WITH inv AS (
  SELECT p_partkey,
    'data/raw/filtered_' || p_name ||
      CASE WHEN p_partkey % 5 = 0 THEN '_V202301_backup_V202401a.csv'
           WHEN p_partkey % 3 = 0 THEN '_V2024015b.xlsx'
           ELSE '_V202401a.csv' END AS full_path
  FROM part
)
SELECT p_partkey,
       regexp_extract(full_path, '([^/]*)$', 1) AS files,
       {standardize_key_sql('full_path')} AS files_std
FROM inv
ORDER BY p_partkey
""",
    doc="Filename-standardization key derivation: basename → strip "
    "'filtered_' prefix → strip _V###### version → strip extension → "
    "slugify → lowercase (assess_changes.qmd:84-94). Whole chain is one "
    "codegen'd projection.",
)
def q_slugify_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # %5 branch: TWO version-like substrings — str_remove drops only
    # the first, so '_backup_v202401a' must survive in the key
    full_path = F.concat(
        F.lit("data/raw/filtered_"),
        F.col("p_name"),
        F.when(
            F.col("p_partkey") % 5 == 0, F.lit("_V202301_backup_V202401a.csv")
        )
        .when(F.col("p_partkey") % 3 == 0, F.lit("_V2024015b.xlsx"))
        .otherwise(F.lit("_V202401a.csv")),
    )
    return (
        part.select("p_partkey", full_path.alias("full_path"))
        .select(
            "p_partkey",
            basename("full_path").alias("files"),
            standardize_key("full_path").alias("files_std"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Union-tag (E2) and alignment (J1) — the changelog skeleton.
# ---------------------------------------------------------------------------


@register(
    "q_union_tag",
    oracle="""
SELECT c_custkey, c_name, 'new' AS directory
FROM customer WHERE c_custkey % 2 <> 0
UNION ALL
SELECT c_custkey, c_name, 'old' AS directory
FROM customer WHERE c_custkey % 3 <> 0
""",
    doc="Tagged UNION ALL of two snapshot listings "
    "(assess_changes.qmd:82-86).",
)
def q_union_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    new = cust.filter(F.col("c_custkey") % 2 != 0)
    old = cust.filter(F.col("c_custkey") % 3 != 0)
    return union_tag(new, old)


@register(
    "q_fullouter_align",
    oracle="""
WITH old AS (
  SELECT p_partkey, p_retailprice / 1000 AS size_mb
  FROM part WHERE p_partkey % 7 <> 0
), new AS (
  SELECT p_partkey, p_retailprice * 1.01 / 1000 AS size_mb
  FROM part WHERE p_partkey % 5 <> 0
)
SELECT p_partkey,
       old.size_mb AS size_mb_old,
       new.size_mb AS size_mb_new,
       old.size_mb IS NOT NULL AS exists_in_old,
       new.size_mb IS NOT NULL AS exists_in_new,
       CASE WHEN old.size_mb IS NOT NULL AND new.size_mb IS NOT NULL
            THEN new.size_mb - old.size_mb END AS size_change_mb
FROM old FULL OUTER JOIN new USING (p_partkey)
ORDER BY p_partkey
""",
    doc="Snapshot alignment as a full-outer join on the standardized key "
    "with existence flags and conditional size delta "
    "(assess_changes.qmd:97-114). Idiomatic-Spark form of pivot_wider.",
)
def q_fullouter_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    old = part.filter(F.col("p_partkey") % 7 != 0).select(
        "p_partkey", (F.col("p_retailprice") / 1000).alias("size_mb")
    )
    new = part.filter(F.col("p_partkey") % 5 != 0).select(
        "p_partkey", (F.col("p_retailprice") * 1.01 / 1000).alias("size_mb")
    )
    aligned = snapshot_align(old, new, key="p_partkey", value_cols=["size_mb"])
    return size_delta(aligned, "size_mb_old", "size_mb_new").orderBy("p_partkey")


@register(
    "q_pivot_align",
    oracle="""
WITH stacked AS (
  SELECT p_partkey, 'new' AS directory, 'new/' || p_name AS full_path
  FROM part WHERE p_partkey % 5 <> 0
  UNION ALL
  SELECT p_partkey, 'old' AS directory, 'old/' || p_name AS full_path
  FROM part WHERE p_partkey % 7 <> 0
)
SELECT p_partkey,
       MAX(CASE WHEN directory = 'new' THEN full_path END) AS new,
       MAX(CASE WHEN directory = 'old' THEN full_path END) AS old
FROM stacked
GROUP BY p_partkey
ORDER BY p_partkey
""",
    doc="J1 literal form — groupBy().pivot().agg() reproduction of the "
    "reference's pivot_wider (assess_changes.qmd:97-103).",
)
def q_pivot_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    new = part.filter(F.col("p_partkey") % 5 != 0).select(
        "p_partkey",
        F.concat(F.lit("new/"), F.col("p_name")).alias("full_path"),
    )
    old = part.filter(F.col("p_partkey") % 7 != 0).select(
        "p_partkey",
        F.concat(F.lit("old/"), F.col("p_name")).alias("full_path"),
    )
    stacked = union_tag(new, old)
    return pivot_align(stacked, key="p_partkey").orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Set operations (E1, E3, E4, E5).
# ---------------------------------------------------------------------------


@register(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    doc="Distinct (E1, scrape_newest_baci_data.R:41).",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
        .orderBy("c_mktsegment")
    )


@register(
    "q_except_distinct",
    oracle="""
SELECT c_name FROM customer WHERE c_custkey <= 900
EXCEPT
SELECT c_name FROM customer WHERE c_custkey > 300
ORDER BY c_name
""",
    doc="Two-sided value diff via EXCEPT-distinct, mirroring R setdiff of "
    "unique country/species sets (assess_changes.qmd:335-338; distinct "
    "semantics per SURVEY.md §4.3 trap #3).",
)
def q_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    old = cust.filter(F.col("c_custkey") <= 900)
    new = cust.filter(F.col("c_custkey") > 300)
    return column_set_diff(old, new, "c_name", "c_name").orderBy("c_name")


@register(
    "q_intersect",
    oracle="""
SELECT p_brand FROM part WHERE p_partkey % 2 = 0
INTERSECT
SELECT p_brand FROM part WHERE p_partkey % 2 <> 0
ORDER BY p_brand
""",
    doc="Intersect (E5 — completeness builtin).",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    even = part.filter(F.col("p_partkey") % 2 == 0).select("p_brand")
    odd = part.filter(F.col("p_partkey") % 2 != 0).select("p_brand")
    return even.intersect(odd).orderBy("p_brand")


@register(
    "q_union_names",
    oracle="""
SELECT p_type FROM part WHERE p_size <= 25
UNION
SELECT p_type FROM part WHERE p_size > 25
ORDER BY p_type
""",
    doc="Distinct set union of two name sets (E4, assess_changes.qmd:161).",
)
def q_union_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    a = part.filter(F.col("p_size") <= 25).select("p_type")
    b = part.filter(F.col("p_size") > 25).select("p_type")
    return a.union(b).distinct().orderBy("p_type")


# ---------------------------------------------------------------------------
# Aggregates over metadata-ish things (A1-A3).
# ---------------------------------------------------------------------------


@register(
    "q_count_distinct",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT c_nationkey) AS n_countries,
       COUNT(DISTINCT c_mktsegment) AS n_segments
FROM customer
""",
    doc="Row count + count-distinct pair, mirroring the reference's "
    "country/species cardinality report (assess_changes.qmd:332-346).",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_nationkey").alias("n_countries"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


@register(
    "q_exists_any",
    oracle="""
SELECT c_nationkey,
       COUNT(*) AS n_customers,
       BOOL_OR(c_acctbal > 5000) AS any_rich,
       BOOL_AND(c_acctbal > 0) AS all_positive
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    doc="ANY/ALL existence aggregates (A3 — the reference's "
    "`any(exists_in_old == FALSE)` report gate, assess_changes.qmd:215-218).",
)
def q_exists_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.bool_or(F.col("c_acctbal") > 5000).alias("any_rich"),
            F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# NOT-IN with R null semantics (P6, SURVEY.md §4.3 trap #2).
# ---------------------------------------------------------------------------


@register(
    "q_notin_filter",
    oracle="""
WITH ev AS (
  SELECT event_id, NULLIF(event_type, 'click') AS event_type
  FROM events
)
SELECT event_type, COUNT(*) AS n
FROM ev
WHERE event_type IS NULL OR event_type NOT IN ('error', 'signup')
GROUP BY event_type
ORDER BY event_type NULLS FIRST
""",
    doc="R `!x %in% set` keeps NA rows; SQL NOT IN drops them. This "
    "implements the R semantics (`~isin | isNull`) against injected "
    "nulls (assess_changes.qmd:300-316; SURVEY.md §4.3 trap #2).",
)
def q_notin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.nullif(F.col("event_type"), F.lit("click")).alias("event_type")
    )
    return (
        ev.filter(not_in_keep_nulls("event_type", ["error", "signup"]))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("event_type").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Full cleaning pipeline (assess_changes.qmd:279-325).
# ---------------------------------------------------------------------------


@register(
    "q_clean_pipeline",
    oracle="""
WITH src AS (
  SELECT p_partkey, p_name, p_brand, p_type,
         CASE WHEN p_partkey % 4 = 0 THEN p_name || ' (=Alias spp.)'
              ELSE p_name END AS sci_name
  FROM part
), sel AS (
  SELECT p_partkey,
         p_name AS "CommonName",
         p_brand AS brand,
         p_type,
         sci_name AS "SciName"
  FROM src
), low AS (
  SELECT p_partkey, lower("CommonName") AS "CommonName", brand, p_type,
         lower("SciName") AS "SciName"
  FROM sel
), trimmed AS (
  SELECT trim(CAST(p_partkey AS VARCHAR)) AS p_partkey,
         trim("CommonName") AS "CommonName",
         trim(brand) AS brand,
         trim(p_type) AS p_type,
         trim("SciName") AS "SciName"
  FROM low
), filt AS (
  SELECT * FROM trimmed
  WHERE p_type IS NULL OR p_type NOT IN ('PROMO', 'LARGE')
)
SELECT p_partkey, "CommonName", brand, p_type,
       regexp_replace("SciName", ' \\(\\=.*', '') AS "SciName"
FROM filt
ORDER BY CAST(p_partkey AS BIGINT)
""",
    doc="clean_prod re-expression (assess_changes.qmd:279-325): tolerant "
    "select (any_of incl. a nonexistent column), rename, lowercase, "
    "trim-all-to-string, NA-keeping NOT-IN, synonym-suffix strip. "
    "Single codegen stage, no shuffle.",
)
def q_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    src = part.withColumn(
        "sci_name",
        F.when(
            F.col("p_partkey") % 4 == 0,
            F.concat(F.col("p_name"), F.lit(" (=Alias spp.)")),
        ).otherwise(F.col("p_name")),
    )
    cleaned = clean_prod(
        src,
        keep_cols=["p_partkey", "p_name", "p_brand", "p_type", "sci_name",
                   "species_major_group"],  # last one doesn't exist → skipped
        renames={"p_name": "CommonName", "p_brand": "brand",
                 "sci_name": "SciName"},
        lower_cols=["CommonName", "SciName"],
        not_in={"p_type": ["PROMO", "LARGE"]},
        strip_synonym_cols=["SciName"],
    )
    return cleaned.orderBy(F.col("p_partkey").cast("bigint"))


# ---------------------------------------------------------------------------
# Dataset diff (U1).  The registered projection flattens the library
# op's array/struct columns (array_join / formatted strings) because
# the external driver canonicalizes results through pandas sort_values,
# which cannot hash list cells (CORRECTNESS_r02 'unhashable type').
# The column/type deltas are deterministic by construction, so the
# oracle pins them as literals and derives only the row counts from
# data — a full hash-match instead of the old rows-only verdict.
# ---------------------------------------------------------------------------


@register(
    "q_dataset_diff",
    oracle="""
WITH o AS (SELECT COUNT(*) AS n FROM customer WHERE c_custkey % 11 <> 0),
     n AS (SELECT COUNT(*) AS n FROM customer)
SELECT o.n AS nrow_old,
       n.n AS nrow_new,
       n.n - o.n AS row_diff,
       4 AS ncol_old,
       4 AS ncol_new,
       'c_nationkey' AS added_cols,
       'c_mktsegment' AS removed_cols,
       'c_acctbal:float->double' AS type_changes
FROM o, n
""",
    doc="Driver-orchestrated dataset diff (compare_files, "
    "assess_changes.qmd:127-176): row counts, added/removed columns, "
    "per-column type changes between an 'old' (projected/retyped) and "
    "'new' view of customer, flattened to driver-safe scalar columns. "
    "Oracle recomputes the counts from the same view and pins the "
    "construction-determined schema deltas.",
)
def q_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    old = cust.select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("float").alias("c_acctbal"),  # type change
        "c_mktsegment",  # will be "removed" in new
    ).filter(F.col("c_custkey") % 11 != 0)
    new = cust.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_nationkey",  # "added" column
    )
    return dataset_diff(spark, old, new).select(
        "nrow_old",
        "nrow_new",
        "row_diff",
        "ncol_old",
        "ncol_new",
        F.array_join(F.array_sort("added_cols"), ",").alias("added_cols"),
        F.array_join(F.array_sort("removed_cols"), ",").alias("removed_cols"),
        F.array_join(
            F.transform(
                "type_changes",
                lambda t: F.concat_ws(
                    "", t["column"], F.lit(":"), t["old_type"],
                    F.lit("->"), t["new_type"],
                ),
            ),
            ",",
        ).alias("type_changes"),
    )


_FAO_CSV = "/root/repo/data/fao_production_sample.csv"


@register(
    "q_csv_clean_prod",
    oracle=f"""
SELECT CAST(country AS BIGINT) AS country_iso3_numeric,
       lower(species_name_en) AS CommonName,
       regexp_replace(scientific_name, ' \\(\\=.*', '') AS SciName,
       CAST(year AS BIGINT) AS year,
       CAST(quantity AS DOUBLE) AS quantity
FROM read_csv('{_FAO_CSV}', header=true)
WHERE species_major_group NOT IN ('PLANTAE AQUATICAE')
   OR species_major_group IS NULL
ORDER BY country_iso3_numeric, CommonName, year
""",
    doc="CSV ingest with schema inference + the reference's clean_prod "
    "transforms over a repo-shipped FAO-production-shaped fixture "
    "(SURVEY.md S8 + assess_changes.qmd:279-325): rename to the ARTIS "
    "names, lowercase common name, strip ' (=…' synonym suffixes "
    "(qmd:318-321), era NOT-IN group filter with R null semantics "
    "(qmd:300-315). Oracle reads the same file via DuckDB read_csv — "
    "S8's inference path is value-checked, not just smoke-tested. "
    "Explicit casts pin the inferred int widths across engines.",
)
def q_csv_clean_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.strings import strip_synonym_suffix
    from ..operators.clean import not_in_keep_nulls
    from ..sources.files import read_csv_inferred

    df = read_csv_inferred(spark, _FAO_CSV)
    return (
        df.filter(not_in_keep_nulls("species_major_group", ["PLANTAE AQUATICAE"]))
        .select(
            F.col("country").cast("bigint").alias("country_iso3_numeric"),
            F.lower("species_name_en").alias("CommonName"),
            strip_synonym_suffix("scientific_name").alias("SciName"),
            F.col("year").cast("bigint").alias("year"),
            F.col("quantity").cast("double").alias("quantity"),
        )
        .orderBy("country_iso3_numeric", "CommonName", "year")
    )


_E2E_OLD = "/root/repo/data/snapshots_e2e/old"
_E2E_NEW = "/root/repo/data/snapshots_e2e/new"
_E2E_TWINS = "/root/repo/data/snapshots_e2e/twins"


def _pair_diff_block(key_expr: str, old_read: str, new_read: str) -> str:
    """One self-contained SELECT reproducing compare_files for a pair —
    counts from full reads, added/removed column sets via DESCRIBE +
    EXCEPT (same shape as the q_changelog_pair_diff oracle)."""
    oldc = f"SELECT column_name FROM (DESCRIBE SELECT * FROM {old_read})"
    newc = f"SELECT column_name FROM (DESCRIBE SELECT * FROM {new_read})"
    added = f"{newc} EXCEPT {oldc}"
    removed = f"{oldc} EXCEPT {newc}"
    return f"""
SELECT {key_expr} AS files_std,
  (SELECT COUNT(*) FROM {old_read}) AS nrow_old,
  (SELECT COUNT(*) FROM {new_read}) AS nrow_new,
  (SELECT COUNT(*) FROM {new_read})
    - (SELECT COUNT(*) FROM {old_read}) AS row_diff,
  (SELECT COUNT(*) FROM ({added})) AS n_added_cols,
  (SELECT COUNT(*) FROM ({removed})) AS n_removed_cols,
  COALESCE((SELECT string_agg(column_name, ',' ORDER BY column_name)
            FROM ({added})), '') AS added_cols,
  COALESCE((SELECT string_agg(column_name, ',' ORDER BY column_name)
            FROM ({removed})), '') AS removed_cols
"""


@register(
    "q_changelog_e2e",
    oracle=f"""
SELECT * FROM (
{_pair_diff_block(
    standardize_key_sql("'Trade_Flows_V202401a.csv'"),
    f"read_csv('{_E2E_OLD}/filtered_Trade_Flows_V202301.csv', header=true)",
    f"read_csv('{_E2E_NEW}/Trade_Flows_V202401a.csv', header=true)",
)}
UNION ALL
{_pair_diff_block(
    standardize_key_sql("'Species_Map_V202401.xlsx'"),
    f"read_csv('{_E2E_TWINS}/Species_Map_old_twin.csv', header=true)",
    f"read_csv('{_E2E_TWINS}/Species_Map_new_twin.csv', header=true)",
)}
)
ORDER BY files_std
""",
    doc="The reference's assess_changes pipeline end-to-end "
    "(assess_changes.qmd stages 1-5) over a committed 3-pair snapshot "
    "tree: a rename-matched csv pair (column added, rows added), an "
    "xlsx pair read by the stdlib parser with skip=1 (column removed, "
    "rows added), and a csv-vs-xlsx format-mismatched pair that "
    "comparable_pairs must EXCLUDE (qmd:117-123) — hence exactly two "
    "output rows. Oracle recomputes each pair's deep diff in DuckDB: "
    "the csv pair from the snapshot files themselves, the xlsx pair "
    "from committed CSV twins (independent decode path).",
)
def q_changelog_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.changelog import assess_changes

    _log, pair_diffs = assess_changes(spark, _E2E_OLD, _E2E_NEW)
    return (
        pair_diffs.select(
            "files_std",
            "nrow_old",
            "nrow_new",
            "row_diff",
            F.size("added_cols").cast("bigint").alias("n_added_cols"),
            F.size("removed_cols").cast("bigint").alias("n_removed_cols"),
            F.array_join(F.array_sort("added_cols"), ",").alias("added_cols"),
            F.array_join(F.array_sort("removed_cols"), ",").alias("removed_cols"),
        )
        .orderBy("files_std")
    )


_FAO_XLSX = "/root/repo/data/excel/fao_production_V202401.xlsx"
_FAO_XLSX_TWIN = "/root/repo/data/excel/fao_production_V202401_twin.csv"


@register(
    "q_excel_clean",
    oracle=f"""
SELECT CAST(country AS BIGINT) AS country_iso3_numeric,
       lower(species_name_en) AS CommonName,
       regexp_replace(scientific_name, ' \\(\\=.*', '') AS SciName,
       CAST(year AS BIGINT) AS year,
       CAST(quantity AS DOUBLE) AS quantity
FROM read_csv('{_FAO_XLSX_TWIN}', header=true)
WHERE species_major_group NOT IN ('PLANTAE AQUATICAE')
   OR species_major_group IS NULL
ORDER BY country_iso3_numeric, CommonName, year
""",
    doc="Excel ingest (S9, ``read_xlsx(file, skip = 1)``, "
    "assess_changes.qmd:131-138) via the stdlib zipfile+ElementTree "
    "parser — no openpyxl — over a committed FAO-production-shaped "
    ".xlsx with a title banner row (hence skip_rows=1), then the same "
    "clean_prod transforms as q_csv_clean_prod: rename, lowercase "
    "common name, strip ' (=…' synonym suffixes, era NOT-IN filter "
    "with R null semantics. Oracle reads a committed CSV twin of the "
    "workbook through DuckDB — a fully independent decode path, so a "
    "cell-decode or type-inference bug in the xlsx parser "
    "hash-mismatches.",
)
def q_excel_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.strings import strip_synonym_suffix
    from ..operators.clean import not_in_keep_nulls
    from ..sources.excel import read_excel

    df = read_excel(spark, _FAO_XLSX, skip_rows=1)
    return (
        df.filter(not_in_keep_nulls("species_major_group", ["PLANTAE AQUATICAE"]))
        .select(
            F.col("country").cast("bigint").alias("country_iso3_numeric"),
            F.lower("species_name_en").alias("CommonName"),
            strip_synonym_suffix("scientific_name").alias("SciName"),
            F.col("year").cast("bigint").alias("year"),
            F.col("quantity").cast("double").alias("quantity"),
        )
        .orderBy("country_iso3_numeric", "CommonName", "year")
    )


_FLEET_DIR = "/root/repo/data/excel/fleet"
_FLEET_TWINS = "/root/repo/data/excel/fleet_twins"
_FLEET_NAMES = [
    "aquaculture_inland_V202401",
    "capture_atlantic_V202401",
    "capture_pacific_V202401",
]


@register(
    "q_excel_fleet",
    bench=True,
    oracle="SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{n}.xlsx' AS workbook,\n"
        f"       CAST(country AS BIGINT) AS country,\n"
        f"       lower(species_name_en) AS species,\n"
        f"       CAST(year AS BIGINT) AS year,\n"
        f"       CAST(quantity AS DOUBLE) AS quantity\n"
        f"FROM read_csv('{_FLEET_TWINS}/{n}.csv', header=true)"
        for n in _FLEET_NAMES
    )
    + "\n) ORDER BY workbook, country, species",
    doc="S9 at fleet scale (read_xlsx dispatch, assess_changes.qmd:"
    "131-138, lifted to a directory of workbooks): binaryFile scan → "
    "one mapInPandas task per .xlsx → stdlib OOXML decode inside the "
    "executor, rows tagged with the workbook basename. Each committed "
    "workbook carries a leading Metadata sheet, so this also exercises "
    "sheet-selection-by-name ('Production') and skip_rows=1 under the "
    "title banner. Oracle unions per-workbook CSV twins through DuckDB "
    "— an independent decode path, so a sheet-resolution, cell-decode "
    "or schema-alignment bug in the fleet reader hash-mismatches.",
)
def q_excel_fleet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.excel import read_excel_fleet

    df = read_excel_fleet(
        spark, _FLEET_DIR, skip_rows=1, sheet="Production"
    )
    return (
        df.select(
            "workbook",
            F.col("country").cast("bigint").alias("country"),
            F.lower("species_name_en").alias("species"),
            F.col("year").cast("bigint").alias("year"),
            F.col("quantity").cast("double").alias("quantity"),
        )
        .orderBy("workbook", "country", "species")
    )


_XLS_DIR = "/root/repo/data/xls"
_XLS_TWINS = "/root/repo/data/xls_twins"
_XLS_NAMES = [
    "capture_baltic_V199902",
    "capture_med_V199902",
    "capture_nordic_V199902",
]


@register(
    "q_xls_ingest",
    oracle="SELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{n}.xls' AS workbook,\n"
        f"       CAST(country AS BIGINT) AS country,\n"
        f"       lower(species_name_en) AS species,\n"
        f"       CAST(year AS BIGINT) AS year,\n"
        f"       CAST(quantity AS DOUBLE) AS quantity\n"
        f"FROM read_csv('{_XLS_TWINS}/{n}.csv', header=true)"
        for n in _XLS_NAMES
    )
    + "\n) ORDER BY workbook, country, species",
    doc="Binary .xls (BIFF8) ingest (r13 — the r12 verdict's missing "
    "#5; sources/xls.py): the pre-2007 Excel format a 2000s-era "
    "FAO/statistics crawl surfaces next to the reference's xlsx "
    "workbooks (assess_changes.qmd:131-138).  Stdlib-pure, two "
    "public-spec layers: the CFB/OLE2 compound container (DIFAT -> "
    "FAT chains -> directory -> streams, incl. the mini-FAT path for "
    "sub-4096-byte workbooks) and BIFF8 records in the Workbook "
    "stream — BOUNDSHEET sheet resolution by name, SST shared "
    "strings with CONTINUE reassembly (split strings restate their "
    "compression flag), NUMBER/RK/MULRK packed reals, LABELSST, "
    "inline LABEL, BOOLERR, FORMULA cached results.  Same contract "
    "as the xlsx reader (skip banner row, header, sparse cells "
    "densify to None, shared type inference) and the same fleet "
    "shape: binaryFile scan -> one mapInPandas task per workbook, "
    "rows tagged with the basename.  Each committed workbook carries "
    "a leading Metadata sheet (sheet-selection by name), RK-packed "
    "integers, a None hole, and a non-latin1 species name (UTF-16 "
    "SST path).  Oracle unions the committed CSV twins through "
    "DuckDB — an independent decode path, so a CFB chain walk, RK "
    "decode, or SST offset bug hash-mismatches.",
)
def q_xls_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.xls import read_xls_fleet

    df = read_xls_fleet(
        spark, _XLS_DIR, skip_rows=1, sheet="Production"
    )
    return (
        df.select(
            "workbook",
            F.col("country").cast("bigint").alias("country"),
            F.lower("species_name_en").alias("species"),
            F.col("year").cast("bigint").alias("year"),
            F.col("quantity").cast("double").alias("quantity"),
        )
        .orderBy("workbook", "country", "species")
    )


@register(
    "q_xpath_links",
    oracle="""
SELECT href, COUNT(*) AS n FROM (
  SELECT 'http://download.example/' || source || '.zip' AS href FROM documents
  UNION ALL
  SELECT '/bdd_modele/' || source || '.pdf' AS href FROM documents
)
GROUP BY href
ORDER BY href
""",
    doc="XPath attribute extraction (SURVEY.md S2-S4, "
    "scrape_newest_baci_data.R:23-29) exercised as a distributed SQL "
    "function: each row synthesizes a well-formed HTML fragment with "
    "two anchors inside the reference's //div[@id] section shape; "
    "Spark's xpath() pulls //a/@href and explodes to rows. The oracle "
    "derives the same hrefs by construction, so a parser regression "
    "(dropped nodes, entity mangling, attribute-order sensitivity) "
    "hash-mismatches. At 100 TB this is the per-page parse of a crawl "
    "corpus — pure codegen'd expression, no UDF.",
)
def q_xpath_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body><div id="telechargement"><a href="http://download.example/'),
        F.col("source"),
        F.lit('.zip">z</a><a href="/bdd_modele/'),
        F.col("source"),
        F.lit('.pdf">p</a></div></body></html>'),
    )
    from ..sources.html import extract_links

    html_df = docs.select(html.alias("html"))
    return (
        extract_links(
            spark,
            html_df,
            section_xpath='//div[@id="telechargement"]',
        )
        .groupBy("href")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("href")
    )


@register(
    "q_union_evolved",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority, refund_reason
FROM (
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL BY NAME
  SELECT o_orderkey, o_totalprice,
         'returned' AS refund_reason
  FROM orders WHERE o_orderkey % 100 = 50
)
ORDER BY o_orderkey
""",
    doc="Schema-evolution union (unionByName allowMissingColumns): two "
    "snapshot slices whose schemas diverged — one gained refund_reason, "
    "the other kept o_orderpriority — align by column name with NULLs "
    "for absent fields. This is the reference's added/removed-columns "
    "situation (assess_changes.qmd:151-158) at the data level: at "
    "100 TB, schema evolution across partition vintages must union "
    "without rewriting old data.",
)
def q_union_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    new = orders.filter(F.col("o_orderkey") % 100 == 50).select(
        "o_orderkey",
        "o_totalprice",
        F.lit("returned").alias("refund_reason"),
    )
    return old.unionByName(new, allowMissingColumns=True).orderBy(
        "o_orderkey"
    )


_SNAP_OLD = "/root/repo/data/snapshots/old"
_SNAP_NEW = "/root/repo/data/snapshots/new"


@register(
    "q_changelog_files",
    bench=True,
    oracle=f"""
WITH old AS (
  SELECT {standardize_key_sql('filename')} AS files_std,
         size / 1000000.0 AS size_old_mb
  FROM read_blob('{_SNAP_OLD}/*.csv')
), new AS (
  SELECT {standardize_key_sql('filename')} AS files_std,
         size / 1000000.0 AS size_new_mb
  FROM read_blob('{_SNAP_NEW}/*.csv')
)
SELECT files_std,
       old.size_old_mb IS NOT NULL AS exists_in_old,
       new.size_new_mb IS NOT NULL AS exists_in_new,
       old.size_old_mb,
       new.size_new_mb,
       CASE WHEN old.size_old_mb IS NOT NULL AND new.size_new_mb IS NOT NULL
            THEN new.size_new_mb - old.size_old_mb END AS size_change_mb
FROM old FULL OUTER JOIN new USING (files_std)
ORDER BY files_std
""",
    doc="The reference's flagship file-level changelog end-to-end over "
    "real snapshot directories shipped in-repo (assess_changes.qmd "
    "stages 1-3: binaryFile inventory → standardized key → full-outer "
    "align → existence flags → size deltas). The fixture reproduces the "
    "reference's actual cases: a pair matched across a rename "
    "('filtered_' prefix dropped, version bumped) with a size change, "
    "one removed file, one added file. Oracle lists the same "
    "directories via DuckDB read_blob and derives the identical key.",
)
def q_changelog_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.changelog import file_level_log

    return (
        file_level_log(spark, _SNAP_OLD, _SNAP_NEW, name_regex=r"(?i)\.csv$")
        .select(
            "files_std",
            "exists_in_old",
            "exists_in_new",
            "size_old_mb",
            "size_new_mb",
            "size_change_mb",
        )
        .orderBy("files_std")
    )


_PAIR_OLD = f"{_SNAP_OLD}/filtered_Global_Production_Quantity_V202301.csv"
_PAIR_NEW = f"{_SNAP_NEW}/Global_Production_Quantity_V202401a.csv"


@register(
    "q_changelog_pair_diff",
    oracle=f"""
WITH oldc AS (
  SELECT column_name FROM (DESCRIBE SELECT * FROM read_csv('{_PAIR_OLD}', header=true))
), newc AS (
  SELECT column_name FROM (DESCRIBE SELECT * FROM read_csv('{_PAIR_NEW}', header=true))
), added AS (
  SELECT column_name FROM newc EXCEPT SELECT column_name FROM oldc
), removed AS (
  SELECT column_name FROM oldc EXCEPT SELECT column_name FROM newc
)
SELECT
  (SELECT COUNT(*) FROM read_csv('{_PAIR_OLD}', header=true)) AS nrow_old,
  (SELECT COUNT(*) FROM read_csv('{_PAIR_NEW}', header=true)) AS nrow_new,
  (SELECT COUNT(*) FROM read_csv('{_PAIR_NEW}', header=true))
    - (SELECT COUNT(*) FROM read_csv('{_PAIR_OLD}', header=true)) AS row_diff,
  (SELECT COUNT(*) FROM added) AS n_added_cols,
  (SELECT COUNT(*) FROM removed) AS n_removed_cols,
  COALESCE((SELECT string_agg(column_name, ',' ORDER BY column_name)
            FROM added), '') AS added_cols,
  COALESCE((SELECT string_agg(column_name, ',' ORDER BY column_name)
            FROM removed), '') AS removed_cols
""",
    doc="The reference's compare_files deep diff (assess_changes.qmd:"
    "127-176, changelog stage 5) over the rename-matched snapshot pair: "
    "row counts and delta from full reads, added/removed column sets "
    "from inferred schemas — dataset_diff's driver-orchestrated "
    "metadata op, value-checked against DuckDB reading and describing "
    "the same CSVs independently.",
)
def q_changelog_pair_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.files import read_csv_inferred

    old = read_csv_inferred(spark, _PAIR_OLD)
    new = read_csv_inferred(spark, _PAIR_NEW)
    d = dataset_diff(spark, old, new)
    return d.select(
        "nrow_old",
        "nrow_new",
        "row_diff",
        F.size("added_cols").cast("bigint").alias("n_added_cols"),
        F.size("removed_cols").cast("bigint").alias("n_removed_cols"),
        F.array_join(F.array_sort("added_cols"), ",").alias("added_cols"),
        F.array_join(F.array_sort("removed_cols"), ",").alias("removed_cols"),
    )


@register(
    "q_dq_report",
    oracle="""
SELECT 'fk_lineitem_orders' AS check_name,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'fk_orders_customer',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
            AS BIGINT)
UNION ALL
SELECT 'null_l_quantity',
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity IS NULL)
            AS BIGINT)
UNION ALL
SELECT 'pk_orders_unique',
       CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
            AS BIGINT)
UNION ALL
SELECT 'positive_l_extendedprice',
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0)
            AS BIGINT)
ORDER BY check_name
""",
    doc="Data-quality constraint report — the generalization of the "
    "reference's whole job (assess_changes.qmd audits releases for "
    "row/schema/set drift; a production ingest ALSO gates on "
    "constraints): primary-key uniqueness, two referential-integrity "
    "checks (anti-join shape — broadcast or SMJ as AQE decides), a "
    "null-rate gate, and a domain predicate, each one aggregation "
    "with its filter pushed to the scan. Emits (check_name, "
    "n_violations); a scheduler gates promotion on all-zeros. At "
    "100 TB each check is an independent scan-agg — they parallelize "
    "trivially and touch only the columns they audit.",
)
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
        )

    fk_li = one(
        "fk_lineitem_orders",
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti"),
    )
    fk_ord = one(
        "fk_orders_customer",
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"),
    )
    nulls = one("null_l_quantity", li.filter(F.col("l_quantity").isNull()))
    pk = orders.select(
        F.lit("pk_orders_unique").alias("check_name"),
        (
            F.count(F.lit(1)) - F.countDistinct("o_orderkey")
        ).cast("bigint").alias("n_violations"),
    )
    domain = one(
        "positive_l_extendedprice", li.filter(F.col("l_extendedprice") <= 0)
    )
    return (
        fk_li.unionByName(fk_ord)
        .unionByName(nulls)
        .unionByName(pk)
        .unionByName(domain)
        .orderBy("check_name")
    )


# ---------------------------------------------------------------------------
# Sitemap XML parsing (sitemaps.org protocol) — crawl discovery: the
# structured sibling of the reference's HTML link scrape
# (scrape_newest_baci_data.R:20-29).  One sitemap per source is built
# in-query (the q_xpath_links fixture pattern), parsed with the
# distributed SQL xpath() family, and filtered by lastmod freshness.
# ---------------------------------------------------------------------------

_SITEMAP_CUTOFF = "2024-02-15"


@register(
    "q_sitemap_urls",
    oracle=f"""
WITH e AS (
  SELECT 'https://crawl.example/' || source || '/' || doc_id AS url,
         CAST(DATE '2024-01-01' + INTERVAL (doc_id % 90) DAY AS DATE)
           AS lastmod,
         source
  FROM documents
)
SELECT url, CAST(lastmod AS VARCHAR) AS lastmod, source
FROM e
WHERE lastmod >= DATE '{_SITEMAP_CUTOFF}'
ORDER BY url
""",
    doc="Sitemap XML ingestion (sitemaps.org protocol) — how a crawl "
    "frontier discovers URLs without scraping anchor tags: each "
    "source's documents render into one namespaced <urlset> sitemap "
    "in-query (the q_xpath_links fixture pattern), Spark's xpath() "
    "family extracts positionally-paired <loc>/<lastmod> arrays "
    "(local-name() steps, so the required sitemaps.org xmlns does not "
    "defeat matching), arrays_zip + explode yields one row per URL, "
    "and a lastmod >= cutoff filter keeps the fresh half — the "
    "incremental-recrawl predicate.  The oracle derives the same "
    "URL/date set by construction, so a parser regression (namespace "
    "mishandling, entity mangling, loc/lastmod mispairing) "
    "hash-mismatches.  Plan: one per-source aggregation to assemble "
    "fixtures, then pure codegen xpath/explode — at 100 TB sitemaps "
    "arrive as files and the parse is embarrassingly parallel with "
    "no shuffle at all.",
)
def q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    entry = F.concat(
        F.lit("<url><loc>https://crawl.example/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("doc_id") % 90).cast("int")).cast("string"),
        F.lit("</lastmod></url>"),
    )
    sitemaps = (
        docs.select("source", "doc_id", entry.alias("entry"))
        .groupBy("source")
        .agg(
            F.concat(
                F.lit(
                    '<?xml version="1.0" encoding="UTF-8"?><urlset '
                    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                ),
                F.concat_ws(
                    "",
                    F.expr(
                        "transform(array_sort(collect_list("
                        "struct(doc_id, entry))), s -> s.entry)"
                    ),
                ),
                F.lit("</urlset>"),
            ).alias("xml")
        )
    )
    locs = F.call_function(
        "xpath", F.col("xml"), F.lit("//*[local-name()='loc']/text()")
    )
    mods = F.call_function(
        "xpath", F.col("xml"), F.lit("//*[local-name()='lastmod']/text()")
    )
    return (
        sitemaps.select(
            "source",
            F.explode(F.arrays_zip(locs.alias("url"), mods.alias("lastmod"))).alias("z"),
        )
        .select(F.col("z.url").alias("url"), F.col("z.lastmod").alias("lastmod"), "source")
        .filter(F.col("lastmod") >= F.lit(_SITEMAP_CUTOFF))
        .orderBy("url")
    )
