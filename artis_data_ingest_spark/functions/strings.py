"""String/regex scalar functions (SURVEY.md §2.6 F1-F10).

Re-expresses the reference's filename-standardization key derivation —
the join key of its whole changelog pipeline (``assess_changes.qmd:87-94``)
— as a single Catalyst projection. The F2→F6 regexp chain is pure
built-in expressions, so whole-stage codegen fuses it into one pass over
the column (the reference allocates a new R vector per step).

All patterns avoid lookarounds so they behave identically under Java
regex (Spark) and RE2 (DuckDB oracle).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def basename(col: str | Column) -> Column:
    """F1 — final path component (``basename(path)``,
    assess_changes.qmd:84)."""
    return F.element_at(F.split(_c(col), "/"), -1)


def strip_prefix(col: str | Column, prefix: str = "filtered_") -> Column:
    """F2 — drop a literal leading prefix (assess_changes.qmd:89)."""
    return F.regexp_replace(_c(col), f"^{prefix}", "")


def strip_version(col: str | Column) -> Column:
    """F3 — drop the FIRST ``_V######[a-z]*`` release-version substring
    (assess_changes.qmd:90).  R's ``str_remove`` replaces only the
    first occurrence; Spark's ``regexp_replace`` replaces all, so the
    pattern captures the remainder of the string and re-emits it —
    one leftmost match, later version-like substrings untouched."""
    return F.regexp_replace(_c(col), r"_V\d{6,7}[a-z]*(.*)$", "$1")


def strip_extension(col: str | Column) -> Column:
    """F4 — drop a trailing ``.ext`` (assess_changes.qmd:91)."""
    return F.regexp_replace(_c(col), r"\.[a-zA-Z0-9]+$", "")


def slugify(col: str | Column) -> Column:
    """F5 — non-alphanumerics → ``_`` (assess_changes.qmd:92)."""
    return F.regexp_replace(_c(col), "[^a-zA-Z0-9]", "_")


def standardize_key(col: str | Column) -> Column:
    """The full F1→F6 chain: basename → strip prefix → strip version →
    strip extension → slugify → lowercase (assess_changes.qmd:84-94).

    Idempotent (property-tested): applying it twice equals once.
    """
    return F.lower(
        slugify(strip_extension(strip_version(strip_prefix(basename(col)))))
    )


# DuckDB-SQL rendering of the same chain, for oracle queries.  Kept
# adjacent to the Spark form so the two can be reviewed for equivalence.
def standardize_key_sql(expr: str) -> str:
    b = f"regexp_extract({expr}, '([^/]*)$', 1)"
    s = f"regexp_replace({b}, '^filtered_', '')"
    # no 'g' flag: first occurrence only, matching str_remove / F3
    s = f"regexp_replace({s}, '_V\\d{{6,7}}[a-z]*', '')"
    s = f"regexp_replace({s}, '\\.[a-zA-Z0-9]+$', '')"
    s = f"regexp_replace({s}, '[^a-zA-Z0-9]', '_', 'g')"
    return f"lower({s})"


def strip_synonym_suffix(col: str | Column) -> Column:
    """F8 — drop a trailing ``ʺ (=…ʺ`` scientific-name synonym
    (``gsub(pattern = " \\(\\=.*", "")``, assess_changes.qmd:318-321)."""
    return F.regexp_replace(_c(col), r" \(\=.*", "")


def absolutize_url(col: str | Column, base: str = "https://www.cepii.fr") -> Column:
    """F9+F10+P11 — prefix relative URLs with the site base
    (``ifelse(grepl("^http", u), u, paste0(base, u))``,
    scrape_newest_baci_data.R:38)."""
    c = _c(col)
    return F.when(c.rlike("^http"), c).otherwise(F.concat(F.lit(base), c))


def trim_all_to_string(df):
    """F7 — the reference's ``mutate_all(str_trim)``
    (assess_changes.qmd:297): trims every column AND coerces it to
    string (documented R side effect, SURVEY.md §4.3)."""
    return df.select(
        *[F.trim(F.col(c).cast("string")).alias(c) for c in df.columns]
    )


# Zero-width / BOM codepoints stripped before dedup canonicalization:
# U+200B ZWSP, U+200C ZWNJ, U+200D ZWJ, U+FEFF BOM.  Stripping happens
# JVM-side (codegen regexp_replace) BEFORE NFC so a combining mark
# separated from its base only by a zero-width char still composes.
ZERO_WIDTH_RE = "[​‌‍﻿]"


def unicode_canon(col: str | Column) -> Column:
    """Unicode canonicalization for dedup keys: strip zero-width chars
    (JVM-side regexp), then NFC-normalize + lowercase in an
    Arrow-batched pandas UDF.

    Standard pre-dedup canonicalization in LLM training pipelines —
    without it, precomposed ``é`` (U+00E9) and decomposed ``e``+U+0301
    hash to different fingerprints and near-identical scraped pages
    survive exact dedup.  Spark has no built-in NFC expression, so this
    is the one sanctioned Python hop in the dedup path: a scalar
    ``pandas_udf`` (Arrow batches, not per-row pickling), placed
    directly after the scan so the canonical string — not the raw
    binary-heavy row — is what reaches the fingerprint shuffle.

    The DuckDB oracle form is
    ``lower(nfc_normalize(regexp_replace(s, ZERO_WIDTH_RE, '', 'g')))``
    — same operation order, so cross-engine hashes agree (pinned by
    ``q_unicode_norm``).
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc_lower(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None
            if x is None
            else unicodedata.normalize("NFC", x).lower()
        )

    return _nfc_lower(F.regexp_replace(_c(col), ZERO_WIDTH_RE, ""))


# --- URL canonicalization (crawl-pipeline F-row, r8) ----------------------

#: tracking query parameters stripped by canonicalize_url
URL_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid)="


def canonicalize_url(col: str | Column) -> Column:
    """Canonical form of an absolute http(s) URL — the URL-level dedup
    key every crawl frontier needs BEFORE fetching (the same page
    hides behind case variants, default ports, tracking params,
    fragment anchors, param order, and trailing slashes):

      1. scheme + host lowercase; 2. default port stripped (:80 http,
      :443 https); 3. leading ``www.`` stripped; 4. fragment dropped;
      5. ``utm_*``/``fbclid``/``gclid`` params dropped; 6. remaining
      query params sorted; 7. trailing path slash stripped (root
      stays ``/``; an empty path becomes ``/``).

    Pure codegen (regexp + split/sort/join builtins, zero UDFs), with
    an operation-for-operation DuckDB mirror in the q_url_canonicalize
    oracle — the policy itself is hash-pinned."""
    u = _c(col)
    nofrag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = F.when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(F.regexp_replace(hostport, r":80$", ""))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(rest, r"^[^/?]+([^?]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(URL_TRACKING_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def fix_mojibake(col: str | Column, max_rounds: int = 2) -> Column:
    """Repair mojibake — UTF-8 text that was mis-decoded as cp1252 or
    latin-1 somewhere upstream (``é`` → ``Ã©``, ``“`` → ``â€œ``), the
    single most common encoding damage in web scrapes and the reason
    ftfy sits in every serious cleaning pipeline (C4/CCNet).

    Per round: re-encode through cp1252, falling back to latin-1 (the
    two decoders real servers mislabel), and accept the result iff the
    bytes decode as valid UTF-8 — the ftfy core heuristic.  Valid
    text is a fixed point: pure ASCII round-trips unchanged, and a
    LEGIT ``café`` fails the UTF-8 re-decode so it is never damaged.
    ``max_rounds=2`` also unwinds double-encoding.  Deterministic,
    Arrow-batched pandas UDF (the ``unicode_canon`` U4 pattern) — no
    JVM expression can re-interpret string bytes across charsets.
    """
    from pyspark.sql.functions import pandas_udf

    def _fix_once(s: str) -> str:
        for enc in ("cp1252", "latin-1"):
            try:
                return s.encode(enc).decode("utf-8")
            except UnicodeError:
                continue
        return s

    def _fix(s):
        if s is None:
            return None
        for _ in range(max_rounds):
            t = _fix_once(s)
            if t == s:
                break
            s = t
        return s

    @pandas_udf("string")
    def _repair(s: pd.Series) -> pd.Series:
        return s.map(_fix)

    return _repair(_c(col))
