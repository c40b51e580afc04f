"""Per-document suffix arrays via prefix doubling, and the exact
longest-repeated-substring (LRS) they unlock — repetition analysis at
ARBITRARY lengths, where q_repetition_quality / q_collapse_repeats see
only fixed n-gram windows.

Algorithm (Manber–Myers prefix doubling + a rank-table LCP walk):

  * level-0 rank: dense_rank of each character within its doc;
  * level m: dense_rank of the pair (rank_{m-1}(i), rank_{m-1}(i+2^(m-1)))
    — out-of-range neighbor ranks coalesce to 0, which sorts below
    every real rank and so behaves exactly like the $ terminator;
    after ceil(log2 n) levels every suffix has a unique rank = its
    suffix-array position;
  * adjacent suffixes in rank order bound the maximum LCP (classic
    suffix-array property), and each adjacent pair's exact LCP comes
    from a greedy high-to-low walk over the SAVED level tables:
    if rank_m(i+lcp) == rank_m(j+lcp), the suffixes share another
    2^m characters.

Everything is dense_rank windows partitioned by doc_id and (doc, pos)
equi-joins — one hash partitioning serves every round, no global sort,
no UDFs.  At 100 TB the doc axis is the parallelism (documents are
independent); the same doubling over a corpus-global position axis
would swap the per-doc windows for range-partitioned sorts, everything
else unchanged.

The DuckDB oracle unrolls the identical doubling + walk as
MATERIALIZED CTE stages — the hash match proves the distributed DP
equals the sequential one; tests pin a brute-force pure-Python LRS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_MAX_DOC = 1024  # doc-length bound: levels unroll to 2^10
_LEVELS = 10


def _char_table(docs: DataFrame) -> DataFrame:
    # NOTE: Spark's split keeps the trailing zero-width match, so each
    # doc gets one extra row (pos=n, ch="").  That row is exactly the
    # classic $ sentinel: "" dense-ranks below every real character and
    # is unique within the doc, so suffix order and every LCP are
    # unchanged (pinned against brute force in tests/test_suffix.py) —
    # keep it rather than filter it.
    n = F.length("text").cast("bigint")
    return (
        docs.filter(n <= _MAX_DOC)
        .select(
            "doc_id",
            F.posexplode(F.split("text", "(?!^)")).alias("pos", "ch"),
        )
        .withColumn("pos", F.col("pos").cast("bigint"))
    )


def suffix_rank_levels(
    docs: DataFrame, max_level: int = _LEVELS
) -> list[DataFrame]:
    """Prefix-doubling rank tables lv[0..m], lv[m] covering 2^m chars.
    Each is (doc_id, pos, r) with r a dense rank within the doc;
    ranks at the top level are unique (the suffix-array order)."""
    chars = _char_table(docs)
    w_ch = Window.partitionBy("doc_id").orderBy("ch")
    lv0 = chars.select(
        "doc_id",
        "pos",
        F.dense_rank().over(w_ch).cast("bigint").alias("r"),
    ).localCheckpoint()
    levels = [lv0]
    w_pos = Window.partitionBy("doc_id").orderBy("pos")
    for m in range(1, max_level + 1):
        k = 1 << (m - 1)
        prev = levels[-1]
        # positions are dense within a doc, so the rank at pos+k is a
        # lead() over the SAME doc_id partitioning — no self-join;
        # the pair sort reuses the exchange (different intra-partition
        # order only)
        keyed = prev.select(
            "doc_id",
            "pos",
            F.col("r").alias("r1"),
            F.coalesce(F.lead("r", k).over(w_pos), F.lit(0)).alias("r2"),
        )
        w_pair = Window.partitionBy("doc_id").orderBy("r1", "r2")
        lvl = keyed.select(
            "doc_id",
            "pos",
            F.dense_rank().over(w_pair).cast("bigint").alias("r"),
        ).localCheckpoint()
        levels.append(lvl)
        # early exit once every (doc, rank) is unique: further rounds
        # are identities, and the LCP walk only ever needs levels up
        # to the first all-unique one (uniqueness at 2^m bounds every
        # within-doc LCP below 2^m).  Within-doc repeats are short in
        # real text, so this typically stops 3-4 rounds early — the
        # 1-row probe is far cheaper than a doubling round.
        u = lvl.agg(
            (F.count("r") == F.count_distinct("doc_id", "r")).alias("u")
        ).collect()[0]["u"]
        if u:
            break
    return levels


def longest_repeated_substring(docs: DataFrame) -> DataFrame:
    """Exact per-doc LRS: (doc_id, n_chars, lrs_len, lrs)."""
    levels = suffix_rank_levels(docs)
    top = levels[-1]
    w_sa = Window.partitionBy("doc_id").orderBy("r")
    all_pairs = (
        top.select(
            "doc_id",
            F.lag("pos").over(w_sa).alias("i"),
            F.col("pos").alias("j"),
        )
        .filter(F.col("i").isNotNull())
        .withColumn("lcp", F.lit(0).cast("bigint"))
    )

    def walk(pairs: DataFrame, level_idxs: list[int]) -> DataFrame:
        for t, m in enumerate(level_idxs):
            step = 1 << m
            lv = levels[m]
            a = lv.select(
                "doc_id", F.col("pos").alias("pa"), F.col("r").alias("ra")
            )
            b = lv.select(
                "doc_id", F.col("pos").alias("pb"), F.col("r").alias("rb")
            )
            pairs = (
                pairs.withColumn("pa", F.col("i") + F.col("lcp"))
                .withColumn("pb", F.col("j") + F.col("lcp"))
                .join(a, ["doc_id", "pa"], "left")
                .join(b, ["doc_id", "pb"], "left")
                .withColumn(
                    "lcp",
                    F.col("lcp")
                    + F.when(
                        F.col("ra").isNotNull()
                        & (F.col("ra") == F.col("rb")),
                        F.lit(step),
                    ).otherwise(F.lit(0)),
                )
                .drop("pa", "pb", "ra", "rb")
            )
            # periodic checkpoint keeps the join plan shallow without a
            # materialization job per level
            if t % 4 == 3:
                pairs = pairs.localCheckpoint()
        return pairs

    # (measured: splitting pairs into a small-LCP mass walking 4 levels
    # and a rare big-LCP tail walking all of them LOSES — every walk
    # join is dominated by shuffling the corpus-sized LEVEL table, not
    # the pair side, so fewer pairs per join buys nothing.  The plain
    # full-ladder walk below is the faster shape.)
    #
    # The TOP level is always skippable: ranks there are unique (early
    # exit broke on the probe, or the _MAX_DOC cap guarantees it), so
    # every LCP < 2^top and the step-2^top round can never match — the
    # oracle's extra static top stage is a no-op by the same argument.
    pairs = walk(all_pairs, list(range(len(levels) - 2, -1, -1)))
    mx = pairs.groupBy("doc_id").agg(F.max("lcp").alias("lrs_len"))
    at_max = pairs.join(mx, "doc_id").filter(
        (F.col("lcp") == F.col("lrs_len")) & (F.col("lrs_len") > 0)
    )
    base = docs.filter(F.length("text") <= _MAX_DOC).select(
        "doc_id", "text", F.length("text").cast("bigint").alias("n_chars")
    )
    best = (
        at_max.join(base, "doc_id")
        .select(
            "doc_id",
            F.expr(
                "substring(text, CAST(i + 1 AS INT), CAST(lrs_len AS INT))"
            ).alias("sub"),
        )
        .groupBy("doc_id")
        .agg(F.min("sub").alias("lrs"))
    )
    return (
        base.join(mx, "doc_id", "left")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("lrs_len", F.lit(0)).cast("bigint").alias("lrs_len"),
            F.coalesce("lrs", F.lit("")).alias("lrs"),
        )
    )


def _sa_lrs(text: str) -> tuple[int, str]:
    """Exact per-doc LRS via an in-core suffix array: numpy
    prefix-doubling (O(n log n), vectorized lexsort rounds) + Kasai's
    LCP (O(n) amortized).  Ties break to the lexicographically
    smallest substring — identical semantics to the declarative
    doubling (`longest_repeated_substring`) and to the unrolled SQL
    oracle, because exact LRS with that tie-break is a deterministic
    function of the text."""
    import numpy as np

    n = len(text)
    if n < 2:
        return 0, ""
    # utf-32 codepoints: position-exact for ANY text, not just ASCII
    a = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    rank = np.unique(a, return_inverse=True)[1].astype(np.int64)
    k = 1
    while k < n:
        r2 = np.full(n, -1, dtype=np.int64)
        r2[:-k] = rank[k:]
        order = np.lexsort((r2, rank))
        changed = np.ones(n, dtype=bool)
        changed[1:] = (rank[order][1:] != rank[order][:-1]) | (
            r2[order][1:] != r2[order][:-1]
        )
        new = np.empty(n, dtype=np.int64)
        new[order] = np.cumsum(changed) - 1
        rank = new
        if rank[order[-1]] == n - 1:
            break
        k <<= 1
    sa = np.argsort(rank, kind="stable")
    inv = rank
    lcp = np.zeros(n, dtype=np.int64)  # lcp[r] = lcp(sa[r], sa[r-1])
    h = 0
    for i in range(n):
        r = inv[i]
        if r > 0:
            j = int(sa[r - 1])
            while i + h < n and j + h < n and text[i + h] == text[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    best_len = int(lcp.max())
    if best_len == 0:
        return 0, ""
    best = min(
        text[int(sa[r]) : int(sa[r]) + best_len]
        for r in np.nonzero(lcp == best_len)[0]
    )
    return best_len, best


def lrs_sa_table(docs: DataFrame) -> DataFrame:
    """Per-doc exact LRS as an Arrow-batched mapInPandas scan —
    the production path.  Documents are independent, so the scalable
    axis at 100 TB is docs-per-task, not operators-per-doc: one linear
    scan computes every doc's suffix array in core (O(n log n) numpy
    rounds), where the declarative doubling twin pays ~log2(doclen)
    corpus-wide window rounds plus a multi-round LCP walk of (doc,pos)
    equi-joins.  Same output bit-for-bit (both are the unique exact
    LRS with smallest-substring tie-break; pinned against each other,
    against brute force, and against the unrolled SQL oracle).
    mapInPandas (not applyInPandas): no grouping shuffle — a doc never
    spans rows, so each Arrow batch is embarrassingly parallel;
    spread_cpu_bound un-serializes small single-split scans."""
    from ..operators.scale import spread_cpu_bound

    def _batch(it):
        import pandas as pd

        for pdf in it:
            out = {
                "doc_id": [],
                "n_chars": [],
                "lrs_len": [],
                "lrs": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ln, sub = _sa_lrs(text)
                out["doc_id"].append(doc_id)
                out["n_chars"].append(len(text))
                out["lrs_len"].append(ln)
                out["lrs"].append(sub)
            yield pd.DataFrame(out)

    return spread_cpu_bound(
        docs.filter(F.col("text").isNotNull()).select("doc_id", "text")
    ).mapInPandas(
        _batch,
        "doc_id bigint, n_chars bigint, lrs_len bigint, lrs string",
    )


def _lrs_oracle(source: str | None = None, levels: int = _LEVELS) -> str:
    """Unrolled doubling + walk oracle.  ``source`` overrides the
    FROM-clause table (default: the pre-registered ``documents`` view
    with the ``_MAX_DOC`` cap the capped queries share); ``levels``
    must satisfy 2^levels >= max doc length + 1."""
    lv_ctes = [
        f"""lv0 AS MATERIALIZED (
  SELECT doc_id, pos,
         CAST(DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY ch)
              AS BIGINT) AS r
  FROM chars
)"""
    ]
    for m in range(1, levels + 1):
        k = 1 << (m - 1)
        lv_ctes.append(
            f"""lv{m} AS MATERIALIZED (
  SELECT p.doc_id, p.pos,
         CAST(DENSE_RANK() OVER (
           PARTITION BY p.doc_id
           ORDER BY p.r, COALESCE(q.r, 0)) AS BIGINT) AS r
  FROM lv{m - 1} p
  LEFT JOIN lv{m - 1} q
    ON q.doc_id = p.doc_id AND q.pos = p.pos + {k}
)"""
        )
    walk_ctes = []
    prev = "w_start"
    for t, m in enumerate(range(levels, -1, -1)):
        step = 1 << m
        walk_ctes.append(
            f"""w{t} AS MATERIALIZED (
  SELECT p.doc_id, p.i, p.j,
         p.lcp + CASE WHEN a.r IS NOT NULL AND b.r IS NOT NULL
                       AND a.r = b.r THEN {step} ELSE 0 END AS lcp
  FROM {prev} p
  LEFT JOIN lv{m} a ON a.doc_id = p.doc_id AND a.pos = p.i + p.lcp
  LEFT JOIN lv{m} b ON b.doc_id = p.doc_id AND b.pos = p.j + p.lcp
)"""
        )
        prev = f"w{t}"
    src = source or f"documents WHERE length(text) <= {_MAX_DOC}"
    return f"""
WITH base AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
  FROM {src}
), posi AS (
  SELECT doc_id, text, CAST(UNNEST(range(length(text))) AS BIGINT) AS pos
  FROM base
), chars AS MATERIALIZED (
  SELECT doc_id, pos, substring(text, CAST(pos + 1 AS INT), 1) AS ch
  FROM posi
),
{",".join(lv_ctes)},
w_start AS MATERIALIZED (
  SELECT doc_id, i, j, CAST(0 AS BIGINT) AS lcp
  FROM (
    SELECT doc_id,
           LAG(pos) OVER (PARTITION BY doc_id ORDER BY r) AS i,
           pos AS j
    FROM lv{levels}
  ) WHERE i IS NOT NULL
),
{",".join(walk_ctes)},
mx AS (
  SELECT doc_id, MAX(lcp) AS lrs_len FROM {prev} GROUP BY doc_id
), best AS (
  SELECT w.doc_id,
         MIN(substring(b.text, CAST(w.i + 1 AS INT),
                       CAST(m.lrs_len AS INT))) AS lrs
  FROM {prev} w
  JOIN mx m ON m.doc_id = w.doc_id
  JOIN base b ON b.doc_id = w.doc_id
  WHERE w.lcp = m.lrs_len AND m.lrs_len > 0
  GROUP BY w.doc_id
)
SELECT base.doc_id, base.n_chars,
       CAST(COALESCE(mx.lrs_len, 0) AS BIGINT) AS lrs_len,
       COALESCE(best.lrs, '') AS lrs
FROM base
LEFT JOIN mx ON mx.doc_id = base.doc_id
LEFT JOIN best ON best.doc_id = base.doc_id
ORDER BY base.doc_id
"""


@register(
    "q_longest_repeat",
    oracle=_lrs_oracle(),
    bench=True,
    doc="EXACT longest repeated substring per document — repetition "
    "analysis at arbitrary length, beyond the fixed n-gram windows of "
    "q_repetition_quality.  Production path: Arrow-batched mapInPandas "
    "suffix arrays (numpy prefix-doubling O(n log n) + Kasai LCP) — "
    "documents are the parallelism axis at 100 TB, so per-doc in-core "
    "construction on a linear scan beats ~log2(doclen) corpus-wide "
    "window rounds + a multi-round join walk (r8 bench: 9.5s → this). "
    "Ties break to the lexicographically smallest substring, making "
    "the result a deterministic function of the text: the unrolled "
    "doubling SQL oracle, the declarative Spark doubling twin "
    "(q_longest_repeat_doubling), and brute force all pin it "
    "bit-for-bit.  Keeps r8's registered <= 1024-char cap for hash "
    "continuity; q_longest_repeat_long is the uncapped form.",
)
def q_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") <= _MAX_DOC)
        .select("doc_id", "text")
    )
    return lrs_sa_table(docs).orderBy("doc_id")


@register(
    "q_longest_repeat_doubling",
    oracle=_lrs_oracle(),
    doc="Declarative twin of q_longest_repeat: Manber–Myers prefix "
    "doubling as dense-rank windows within doc (~log2(doclen) rounds, "
    "coalesce-0 as the $ terminator) + a rank-table LCP walk over "
    "adjacent suffixes in rank order.  All dense_rank windows share "
    "one doc_id partitioning; the walk is (doc, pos) equi-joins "
    "against the saved level tables, skipping the provably-no-op top "
    "level.  Kept registered (same oracle, same hash as the mapInPandas "
    "path) because it is the construction the corpus-GLOBAL suffix "
    "array (q_cross_doc_repeat) builds on — there the string axis "
    "spans executors and in-core per-doc construction cannot apply.",
)
def q_longest_repeat_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return longest_repeated_substring(docs).orderBy("doc_id")


_LONGDOCS_PARQUET = "/root/repo/data/longdocs/docs.parquet"
_LONGDOCS_LEVELS = 14  # 2^14 = 16384 >= max fixture doc length + 1


@register(
    "q_longest_repeat_long",
    oracle=_lrs_oracle(
        source=f"read_parquet('{_LONGDOCS_PARQUET}') "
        "WHERE text IS NOT NULL",
        levels=_LONGDOCS_LEVELS,
    ),
    doc="UNCAPPED longest-repeated-substring over the committed "
    "long-document fixture (data/longdocs: 27 docs, 1.2k–8.8k chars, "
    "planted 40–400-char repeats, plus empty/single-char/all-same-char "
    "edges) — proof the r8 1024-char coverage cap is gone.  Same "
    "mapInPandas suffix-array path as q_longest_repeat with no length "
    "filter; the oracle unrolls the doubling to 14 static levels "
    "(2^14 covers every fixture doc).  In-core per-doc construction "
    "is the right scale shape to ~10M-char docs; documents beyond a "
    "single task's memory belong to the corpus-global machinery "
    "(q_cross_doc_repeat).",
)
def q_longest_repeat_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(_LONGDOCS_PARQUET)
    return lrs_sa_table(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Corpus-global suffix array over a source slice → the longest
# substring shared by two DIFFERENT documents (exact template /
# boilerplate discovery).
# ---------------------------------------------------------------------------

_XDOC_SOURCE = "src0"
_XDOC_LEVELS = 16  # static oracle unroll: exact for slices <= 2^16
# chars; the Spark loop itself is unbounded (doubles until ranks are
# unique, <= ceil(log2 n) rounds)


def _xdoc_chars(docs: DataFrame) -> DataFrame:
    """Concatenated-corpus character table: (gpos, doc_id, pos, ch,
    rem) with one chr(1) separator row per doc (rem=0).  Offsets come
    from a docs-bounded window over the doc list."""
    base = docs.select(
        "doc_id", "text", F.length("text").cast("bigint").alias("len")
    )
    w_doc = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = base.select(
        "doc_id",
        "text",
        "len",
        F.coalesce(F.sum(F.col("len") + 1).over(w_doc), F.lit(0)).alias(
            "off"
        ),
    )
    body = offs.select(
        "doc_id",
        "len",
        "off",
        F.posexplode(F.split("text", "(?!^)")).alias("pos", "ch"),
    ).filter(F.col("ch") != "")
    body = body.select(
        (F.col("off") + F.col("pos")).alias("gpos"),
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        "ch",
        (F.col("len") - F.col("pos")).cast("bigint").alias("rem"),
    )
    seps = offs.select(
        (F.col("off") + F.col("len")).alias("gpos"),
        "doc_id",
        F.col("len").cast("bigint").alias("pos"),
        F.lit("\x01").alias("ch"),
        F.lit(0).cast("bigint").alias("rem"),
    )
    return body.unionByName(seps)


def cross_doc_repeat(docs: DataFrame) -> DataFrame:
    """Longest substring appearing in >= 2 distinct docs: one row
    (n_docs, n_chars, lcs_len, n_pairs_at_max, lcs)."""
    from ..operators.rank import distributed_dense_rank

    chars = _xdoc_chars(docs).localCheckpoint()
    meta = chars.select("gpos", "doc_id", "pos", "rem")
    lv = distributed_dense_rank(
        chars.select("gpos", "ch"), ["ch"], out="r"
    ).select("gpos", "r").localCheckpoint()
    levels = [lv]
    total = chars.count()  # bounded probe: also the #rounds bound
    m = 1
    # The loop MUST run until top-level ranks are unique — a non-unique
    # top rank makes the consecutive-rank adjacency join many-to-many
    # and invalidates the "adjacent pairs suffice" argument.  The while
    # condition alone guarantees that: once 2^(m-1) >= total the
    # doubling has compared full suffixes (position-sentinel 0 for
    # out-of-range), so ranks are unique after at most ceil(log2 n)
    # rounds; the uniqueness probe below merely exits earlier.  The
    # oracle unrolls _XDOC_LEVELS static stages, enough for any slice
    # up to 2^16 chars (the gate fixture is far smaller); beyond that
    # the Spark side keeps doubling correctly while the static oracle
    # no longer applies.
    while (1 << (m - 1)) < total:
        k = 1 << (m - 1)
        prev = levels[-1]
        nxt = prev.select(
            (F.col("gpos") - k).alias("gpos"), F.col("r").alias("r2")
        )
        keyed = prev.join(nxt, "gpos", "left").select(
            "gpos",
            F.col("r").alias("r1"),
            F.coalesce("r2", F.lit(0)).alias("r2"),
        )
        lvl = (
            distributed_dense_rank(keyed, ["r1", "r2"], out="r")
            .select("gpos", "r")
            .localCheckpoint()
        )
        levels.append(lvl)
        m += 1
        # early exit once every suffix rank is unique — further rounds
        # are identities (text distinguishes suffixes in far fewer than
        # log2(N) rounds; the oracle's extra static stages are no-ops
        # by the same argument).  1-row probe per round vs a whole
        # doubling round saved: cheap.
        u = lvl.agg(
            (F.count("r") == F.count_distinct("r")).alias("u")
        ).collect()[0]["u"]
        if u:
            break
    top = levels[-1]
    nxt_rank = top.select(
        (F.col("r") - 1).alias("r"), F.col("gpos").alias("gpos_j")
    )
    pairs = (
        top.join(nxt_rank, "r")
        .select(F.col("gpos").alias("gi"), F.col("gpos_j").alias("gj"))
        .join(
            meta.select(
                F.col("gpos").alias("gi"),
                F.col("doc_id").alias("doc_i"),
                F.col("pos").alias("pos_i"),
                F.col("rem").alias("rem_i"),
            ),
            "gi",
        )
        .join(
            meta.select(
                F.col("gpos").alias("gj"),
                F.col("doc_id").alias("doc_j"),
                F.col("rem").alias("rem_j"),
            ),
            "gj",
        )
        .filter(F.col("doc_i") != F.col("doc_j"))
        .withColumn("lcp", F.lit(0).cast("bigint"))
    )
    for mm in range(len(levels) - 1, -1, -1):
        step = 1 << mm
        lvm = levels[mm]
        a = lvm.select(F.col("gpos").alias("pa"), F.col("r").alias("ra"))
        b = lvm.select(F.col("gpos").alias("pb"), F.col("r").alias("rb"))
        pairs = (
            pairs.withColumn("pa", F.col("gi") + F.col("lcp"))
            .withColumn("pb", F.col("gj") + F.col("lcp"))
            .join(a, "pa", "left")
            .join(b, "pb", "left")
            .withColumn(
                "lcp",
                F.col("lcp")
                + F.when(
                    F.col("ra").isNotNull() & (F.col("ra") == F.col("rb")),
                    F.lit(step),
                ).otherwise(F.lit(0)),
            )
            .drop("pa", "pb", "ra", "rb")
        )
        if mm % 4 == 0:
            pairs = pairs.localCheckpoint()
    pairs = pairs.withColumn(
        "lcp_eff", F.least("lcp", "rem_i", "rem_j")
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
    )
    mx = pairs.agg(
        F.max("lcp_eff").cast("bigint").alias("lcs_len")
    )
    at_max = (
        pairs.crossJoin(F.broadcast(mx))
        .filter((F.col("lcp_eff") == F.col("lcs_len")) & (F.col("lcs_len") > 0))
        .join(docs.select(F.col("doc_id").alias("doc_i"), "text"), "doc_i")
        .select(
            F.expr(
                "substring(text, CAST(pos_i + 1 AS INT),"
                " CAST(lcs_len AS INT))"
            ).alias("sub")
        )
    )
    best = at_max.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs_at_max"),
        F.min("sub").alias("lcs"),
    )
    return (
        stats.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(best))
        .select(
            "n_docs",
            "n_chars",
            F.coalesce("lcs_len", F.lit(0)).cast("bigint").alias("lcs_len"),
            F.coalesce("n_pairs_at_max", F.lit(0))
            .cast("bigint")
            .alias("n_pairs_at_max"),
            F.coalesce("lcs", F.lit("")).alias("lcs"),
        )
    )


def _xdoc_oracle() -> str:
    lv_ctes = [
        """xlv0 AS MATERIALIZED (
  SELECT gpos, CAST(DENSE_RANK() OVER (ORDER BY ch) AS BIGINT) AS r
  FROM xchars
)"""
    ]
    for m in range(1, _XDOC_LEVELS + 1):
        k = 1 << (m - 1)
        lv_ctes.append(
            f"""xlv{m} AS MATERIALIZED (
  SELECT p.gpos,
         CAST(DENSE_RANK() OVER (ORDER BY p.r, COALESCE(q.r, 0))
              AS BIGINT) AS r
  FROM xlv{m - 1} p
  LEFT JOIN xlv{m - 1} q ON q.gpos = p.gpos + {k}
)"""
        )
    walk = []
    prev = "xw_start"
    for t, m in enumerate(range(_XDOC_LEVELS, -1, -1)):
        step = 1 << m
        walk.append(
            f"""xw{t} AS MATERIALIZED (
  SELECT p.* REPLACE(
    p.lcp + CASE WHEN a.r IS NOT NULL AND b.r IS NOT NULL AND a.r = b.r
                 THEN {step} ELSE 0 END AS lcp)
  FROM {prev} p
  LEFT JOIN xlv{m} a ON a.gpos = p.gi + p.lcp
  LEFT JOIN xlv{m} b ON b.gpos = p.gj + p.lcp
)"""
        )
        prev = f"xw{t}"
    return f"""
WITH slice AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
  FROM documents WHERE source = '{_XDOC_SOURCE}'
), offs AS (
  SELECT doc_id, text, len,
         CAST(COALESCE(SUM(len + 1) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS off
  FROM slice
), body AS (
  SELECT off + pos AS gpos, doc_id, pos,
         substring(text, CAST(pos + 1 AS INT), 1) AS ch,
         len - pos AS rem
  FROM (SELECT doc_id, text, len, off,
               CAST(UNNEST(range(len)) AS BIGINT) AS pos
        FROM offs)
), xchars AS MATERIALIZED (
  SELECT gpos, doc_id, pos, ch, rem FROM body
  UNION ALL
  SELECT off + len AS gpos, doc_id, len AS pos, chr(1) AS ch,
         CAST(0 AS BIGINT) AS rem
  FROM offs
),
{",".join(lv_ctes)},
xw_start AS MATERIALIZED (
  SELECT ci.gpos AS gi, cj.gpos AS gj,
         ci.doc_id AS doc_i, cj.doc_id AS doc_j,
         ci.pos AS pos_i, ci.rem AS rem_i, cj.rem AS rem_j,
         CAST(0 AS BIGINT) AS lcp
  FROM xlv{_XDOC_LEVELS} ti
  JOIN xlv{_XDOC_LEVELS} tj ON tj.r = ti.r + 1
  JOIN xchars ci ON ci.gpos = ti.gpos
  JOIN xchars cj ON cj.gpos = tj.gpos
  WHERE ci.doc_id <> cj.doc_id
),
{",".join(walk)},
clamped AS (
  SELECT *, LEAST(lcp, rem_i, rem_j) AS lcp_eff FROM {prev}
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len) AS BIGINT) AS n_chars
  FROM slice
), mx AS (
  SELECT CAST(MAX(lcp_eff) AS BIGINT) AS lcs_len FROM clamped
), best AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_at_max,
         MIN(substring(s.text, CAST(c.pos_i + 1 AS INT),
                       CAST(m.lcs_len AS INT))) AS lcs
  FROM clamped c
  CROSS JOIN mx m
  JOIN slice s ON s.doc_id = c.doc_i
  WHERE c.lcp_eff = m.lcs_len AND m.lcs_len > 0
)
SELECT stats.n_docs, stats.n_chars,
       CAST(COALESCE(mx.lcs_len, 0) AS BIGINT) AS lcs_len,
       CAST(COALESCE(best.n_pairs_at_max, 0) AS BIGINT) AS n_pairs_at_max,
       COALESCE(best.lcs, '') AS lcs
FROM stats CROSS JOIN mx CROSS JOIN best
"""


@register(
    "q_cross_doc_repeat",
    oracle=_xdoc_oracle(),
    doc="Corpus-global suffix array over the src0 slice → the exact "
    "longest substring shared by two DIFFERENT documents (template / "
    "boilerplate discovery at arbitrary length, the cross-doc "
    "counterpart of q_longest_repeat).  The docs concatenate with "
    "chr(1) separators; every prefix-doubling round ranks globally "
    "through operators/rank.py's distributed_dense_rank (range-"
    "partition + bounded offsets — NO single-reducer window anywhere, "
    "unlike the oracle's DENSE_RANK); suffix-array adjacency comes "
    "from an equi-join on consecutive ranks, cross-doc pairs survive, "
    "the LCP walk runs over the saved level tables, and the clamp "
    "least(lcp, rem_i, rem_j) removes any match that would cross a "
    "separator.  Adjacent cross-doc pairs suffice for the max (any "
    "optimal pair's SA interval contains a doc switch).  Rounds are "
    "log2(slice chars), each one range shuffle + a bounded collect.  "
    "Brute-force pure-Python cross-doc LCS pinned in tests.",
)
def q_cross_doc_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source") == _XDOC_SOURCE)
        .select("doc_id", "text")
    )
    return cross_doc_repeat(docs)
