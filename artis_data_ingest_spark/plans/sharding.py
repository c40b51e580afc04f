"""Corpus sharding and compact-membership operators: rendezvous (HRW)
hashing for minimal-movement resharding, and a Bloom-filter membership
pre-filter for incremental corpus dedup.

The reference pipeline snapshots whole directories and re-diffs them
(``assess_changes.qmd:50-75``); a 100 TB corpus store instead needs (a)
a stable doc->shard routing function whose assignments barely move when
the shard count changes (rendezvous hashing: only keys whose winning
shard IS the new shard move — expected 1/(n+1) of the corpus), and (b)
a compact, mergeable membership summary so an incoming delta batch can
be triaged against an arbitrarily large corpus without joining the
corpus itself (Bloom filter: m bits summarize any number of
fingerprints; the exact anti-join only runs on the "maybe" survivors).

Determinism playbook (same as the rest of the repo): every hash is
md5-derived — no RNG, no engine-specific hash functions — so DuckDB
reproduces the assignments and bit positions bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_N_OLD = 8  # shard count before the reshard
_N_NEW = 9  # shard count after adding one shard


def hrw_shard(doc_id, n_shards: int):
    """Rendezvous (highest-random-weight) shard for ``doc_id``.

    For each candidate shard s in [0, n_shards), weight = md5(doc_id:s);
    the winning shard is the one with the lexicographically greatest
    weight.  Pure codegen — an array of (weight, shard) structs reduced
    by array_max (struct ordering = field order) — so routing is a
    map-only projection: no shuffle, no UDF, no lookup table.
    """
    cand = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            F.md5(
                F.concat_ws(":", doc_id.cast("string"), s.cast("string"))
            ).alias("w"),
            s.alias("s"),
        ),
    )
    return F.array_max(cand).getField("s")


@register(
    "q_hrw_reshard",
    oracle=f"""
WITH cand AS (
  SELECT d.doc_id, t.s,
         md5(d.doc_id || ':' || t.s) AS w
  FROM documents d
  CROSS JOIN (SELECT UNNEST(range({_N_NEW})) AS s) t
), assign AS (
  SELECT doc_id,
         arg_max(s, CASE WHEN s < {_N_OLD} THEN w END) AS shard_old,
         arg_max(s, w) AS shard_new
  FROM cand
  GROUP BY doc_id
)
SELECT CAST(shard_new AS INT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN shard_old <> shard_new THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved
FROM assign
GROUP BY shard_new
ORDER BY shard
""",
    doc="Rendezvous-hash (HRW) resharding 8 -> 9 shards: each doc's "
    "shard is argmax over md5(doc_id:s) — a map-only projection, zero "
    "shuffle, zero routing table.  The minimal-movement guarantee is "
    "surfaced in the result: a doc moves iff the NEW shard wins its "
    "rendezvous, so n_moved is 0 for every pre-existing shard and the "
    "moved fraction concentrates entirely on shard 8 (expected 1/9 of "
    "the corpus).  At 100 TB this is the resharding story: adding a "
    "shard relocates ~11% of the data instead of the ~89% a mod-N "
    "scheme reshuffles.  The Spark side computes both assignments from "
    "one candidate array (array_max over (weight, shard) structs — "
    "whole-stage codegen); only the final 9-group rollup shuffles.",
)
def q_hrw_reshard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assign = docs.select(
        "doc_id",
        hrw_shard(F.col("doc_id"), _N_OLD).alias("shard_old"),
        hrw_shard(F.col("doc_id"), _N_NEW).alias("shard_new"),
    )
    return (
        assign.groupBy(F.col("shard_new").cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("shard_old") != F.col("shard_new")).cast("bigint")
            ).alias("n_moved"),
        )
        .orderBy("shard")
    )


# Bloom geometry: m = 4096 bits (3 hex chars per probe), k = 3 probes
# from disjoint md5 slices.  At 500 corpus fingerprints the load factor
# is ~0.30 and the false-positive rate ~0.03 — small enough that the
# verdict table is dominated by true negatives, large enough that the
# FP accounting column is exercised by the fixture.
_BLOOM_M = 4096
_BLOOM_K = 3


def _bit_positions(col):
    """The k bit positions of ``col``'s md5, as an array<int>."""
    h = F.md5(col)
    return F.array(
        *[
            (
                F.conv(F.substring(h, 1 + 3 * i, 3), 16, 10).cast("int")
                % _BLOOM_M
            )
            for i in range(_BLOOM_K)
        ]
    )


@register(
    "q_bloom_membership",
    oracle=f"""
WITH corpus_bits AS (
  SELECT DISTINCT
         CAST(CONCAT('0x', substring(md5(text), 1 + 3 * t.i, 3)) AS INT)
           % {_BLOOM_M} AS pos
  FROM documents
  CROSS JOIN (SELECT UNNEST(range({_BLOOM_K})) AS i) t
), probes AS (
  SELECT doc_id AS probe_id, text, 'member' AS kind
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS probe_id, text || ' ~novel~' AS text,
         'novel' AS kind
  FROM documents WHERE doc_id % 5 = 0
), probe_bits AS (
  SELECT p.probe_id, p.kind,
         CAST(CONCAT('0x', substring(md5(p.text), 1 + 3 * t.i, 3)) AS INT)
           % {_BLOOM_M} AS pos
  FROM probes p
  CROSS JOIN (SELECT UNNEST(range({_BLOOM_K})) AS i) t
), verdicts AS (
  SELECT pb.probe_id, pb.kind,
         COUNT(cb.pos) = {_BLOOM_K} AS bloom_maybe
  FROM probe_bits pb
  LEFT JOIN corpus_bits cb ON pb.pos = cb.pos
  GROUP BY pb.probe_id, pb.kind
)
SELECT kind, bloom_maybe,
       CAST(COUNT(*) AS BIGINT) AS n_probes
FROM verdicts
GROUP BY kind, bloom_maybe
ORDER BY kind, bloom_maybe
""",
    doc="Bloom-filter membership triage for incremental corpus dedup: "
    f"corpus text fingerprints set k={_BLOOM_K} md5-derived bits in an "
    f"m={_BLOOM_M}-bit filter; a probe batch (held-out member texts + "
    "guaranteed-novel variants) is classified 'maybe present' iff all "
    "k of its bits are set.  Members MUST come back maybe=true (Bloom "
    "filters have no false negatives — the fixture pins that row); "
    "novel probes come back false except for the small md5-collision "
    "FP mass the geometry predicts (~3%), which the (novel, true) row "
    "accounts for.  Scale story: the filter is m-bounded REGARDLESS of "
    "corpus size — distinct bit positions (<= 4096 rows) broadcast to "
    "the probe side, so triaging a delta batch against a 100 TB corpus "
    "is one broadcast join over the delta only; the expensive exact "
    "anti-join then runs on the 'maybe' survivors alone.  The bit-set "
    "build itself is one distinct over k x |corpus| ints with map-side "
    "partial dedup.",
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus_bits = (
        docs.select(F.explode(_bit_positions(F.col("text"))).alias("pos"))
        .distinct()
    )
    held = docs.filter(F.col("doc_id") % 5 == 0)
    probes = held.select(
        F.col("doc_id").alias("probe_id"),
        F.col("text"),
        F.lit("member").alias("kind"),
    ).unionByName(
        held.select(
            (F.col("doc_id") + 1000000).alias("probe_id"),
            F.concat(F.col("text"), F.lit(" ~novel~")).alias("text"),
            F.lit("novel").alias("kind"),
        )
    )
    probe_bits = probes.select(
        "probe_id",
        "kind",
        F.explode(_bit_positions(F.col("text"))).alias("pos"),
    )
    verdicts = (
        probe_bits.join(
            F.broadcast(corpus_bits.withColumn("hit", F.lit(1))),
            "pos",
            "left",
        )
        .groupBy("probe_id", "kind")
        .agg((F.count("hit") == _BLOOM_K).alias("bloom_maybe"))
    )
    return (
        verdicts.groupBy("kind", "bloom_maybe")
        .agg(F.count(F.lit(1)).alias("n_probes"))
        .orderBy("kind", "bloom_maybe")
    )


@register(
    "q_global_rank",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority,
         CAST(DENSE_RANK() OVER (
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))
           AS BIGINT) AS r
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(r) AS BIGINT) AS min_rank,
       CAST(MAX(r) AS BIGINT) AS max_rank,
       CAST(SUM(r) AS BIGINT) AS sum_rank
FROM ranked
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Corpus-global dense ranking through operators/rank.py's "
    "distributed_dense_rank (range-partition + bounded per-partition "
    "distinct counts + offset-shifted local windows — NO single-"
    "partition exchange), aggregated per priority so the oracle's "
    "single-reducer DENSE_RANK() window verifies every rank via the "
    "min/max/sum fingerprints.  This is the oracle-grade proof of the "
    "scalable ranking primitive that global score ordering (leader-"
    "boards, corpus-wide quality ranks, global suffix-array rounds) "
    "needs at 100 TB where Window.orderBy would funnel the corpus "
    "through one task.",
)
def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import distributed_dense_rank

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    ranked = distributed_dense_rank(orders, ["cents"], out="r")
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("r").cast("bigint").alias("min_rank"),
            F.max("r").cast("bigint").alias("max_rank"),
            F.sum("r").cast("bigint").alias("sum_rank"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Merkle corpus manifest — verifiable snapshot versioning: compare
# fingerprint trees instead of data (the reference's snapshot-diff
# mission, assess_changes.qmd:50-146, at corpus scale).
# ---------------------------------------------------------------------------

_MERKLE_SHARD = 64  # docs per manifest shard


@register(
    "q_merkle_manifest",
    oracle=f"""
WITH leaf AS (
  SELECT doc_id, doc_id // {_MERKLE_SHARD} AS shard,
         md5(doc_id || ':' || md5(text)) AS h
  FROM documents
), shard_h AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         md5(string_agg(h, '' ORDER BY doc_id)) AS hash
  FROM leaf GROUP BY shard
)
SELECT CAST(shard AS VARCHAR) AS node, n_docs, hash FROM shard_h
UNION ALL
SELECT '<root>' AS node,
       CAST(SUM(n_docs) AS BIGINT),
       md5(string_agg(hash, '' ORDER BY shard))
FROM shard_h
ORDER BY node
""",
    doc="Merkle-style corpus manifest: every doc hashes to a leaf "
    "(md5 over id + content fingerprint), leaves roll up into "
    f"{_MERKLE_SHARD}-doc shard hashes (order-pinned string_agg), and "
    "shard hashes roll into one root — a VERIFIABLE snapshot id.  Two "
    "corpus versions compare by manifest (shard-count rows) instead "
    "of by data, which is the reference's directory-diff mission "
    "(assess_changes.qmd) done at 100 TB scale: an unchanged root "
    "proves byte-identity without touching the text again, and a "
    "changed root localizes to the changed shards in one tree level.  "
    "Plan: one corpus pass to leaves, a shard-bounded ordered rollup, "
    "a shard-count-bounded root fold.  Deeper trees are the same "
    "algebra applied again.",
)
def q_merkle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return merkle_manifest(docs)


def _shard_hashes(docs: DataFrame) -> DataFrame:
    leaf = docs.select(
        "doc_id",
        F.expr(f"doc_id div {_MERKLE_SHARD}").alias("shard"),
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.md5("text"))
        ).alias("h"),
    )
    return leaf.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("doc_id").alias("doc_id"),
                                F.col("h").alias("p"),
                            )
                        )
                    ),
                    lambda x: x["p"],
                ),
                "",
            )
        ).alias("hash"),
    )


def merkle_manifest(docs: DataFrame) -> DataFrame:
    shard_h = _shard_hashes(docs)
    root = shard_h.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("shard").alias("shard"),
                                F.col("hash").alias("p"),
                            )
                        )
                    ),
                    lambda x: x["p"],
                ),
                "",
            )
        ).alias("hash"),
    ).select(F.lit("<root>").alias("node"), "n_docs", "hash")
    return (
        shard_h.select(
            F.col("shard").cast("string").alias("node"), "n_docs", "hash"
        )
        .unionByName(root)
        .orderBy("node")
    )


@register(
    "q_manifest_diff",
    oracle=f"""
WITH base AS (
  SELECT doc_id, text FROM documents
), mod AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 42 THEN text || ' [edited]'
              ELSE text END AS text
  FROM documents
), lb AS (
  SELECT doc_id // {_MERKLE_SHARD} AS shard,
         md5(doc_id || ':' || md5(text)) AS h, doc_id
  FROM base
), lm AS (
  SELECT doc_id // {_MERKLE_SHARD} AS shard,
         md5(doc_id || ':' || md5(text)) AS h, doc_id
  FROM mod
), sb AS (
  SELECT shard, md5(string_agg(h, '' ORDER BY doc_id)) AS hash
  FROM lb GROUP BY shard
), sm AS (
  SELECT shard, md5(string_agg(h, '' ORDER BY doc_id)) AS hash
  FROM lm GROUP BY shard
)
SELECT sb.shard, sb.hash <> sm.hash AS changed
FROM sb JOIN sm USING (shard)
ORDER BY sb.shard
""",
    doc="Manifest-level snapshot diff: the base corpus vs a version "
    "with every (doc_id % 97 == 42) doc edited — the comparison "
    "happens ENTIRELY at the shard-hash level (shard-count rows, no "
    "text re-read on the unchanged side in a real deployment where "
    "the base manifest is persisted), and changed=true rows localize "
    "exactly the shards holding edited docs.  This is "
    "assess_changes.qmd's file-level diff generalized to content-"
    "addressed shards.",
)
def q_manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mod = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 97 == 42, F.concat("text", F.lit(" [edited]"))
        ).otherwise(F.col("text")),
    )
    sb = _shard_hashes(docs).select(
        "shard", F.col("hash").alias("hb")
    )
    sm = _shard_hashes(mod).select(
        "shard", F.col("hash").alias("hm")
    )
    return (
        sb.join(sm, "shard")
        .select("shard", (F.col("hb") != F.col("hm")).alias("changed"))
        .orderBy("shard")
    )


@register(
    "q_manifest_incremental",
    oracle=f"""
WITH mod AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 42 THEN text || ' [edited]'
              ELSE text END AS text
  FROM documents
), lm AS (
  SELECT doc_id // {_MERKLE_SHARD} AS shard,
         md5(doc_id || ':' || md5(text)) AS h, doc_id
  FROM mod
), sm AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         md5(string_agg(h, '' ORDER BY doc_id)) AS hash
  FROM lm GROUP BY shard
)
SELECT CAST(shard AS VARCHAR) AS node, n_docs, hash FROM sm
UNION ALL
SELECT '<root>', CAST(SUM(n_docs) AS BIGINT),
       md5(string_agg(hash, '' ORDER BY shard))
FROM sm
ORDER BY node
""",
    doc="Incremental Merkle-manifest maintenance: given the BASE "
    "manifest and a delta of edited docs (doc_id % 97 == 42), only "
    "the shards containing a delta doc re-hash — their doc texts are "
    "re-read, every untouched shard's hash carries over from the base "
    "manifest unread — and the root re-folds from the merged shard "
    "list.  The oracle is the FULL manifest rebuild of the modified "
    "corpus, so the hash pass IS the proof of the O(delta) maintenance "
    "identity (the q_index_delta_merge / q_agg_delta_update playbook "
    "applied to content addressing).  At 100 TB a daily 0.1% delta "
    "touches ~0.1% of shards; manifest upkeep costs that, not a "
    "corpus rescan.",
)
def q_manifest_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # the arriving delta: the edited docs only
    delta = docs.filter(F.col("doc_id") % 97 == 42).withColumn(
        "text", F.concat("text", F.lit(" [edited]"))
    )
    base_manifest = _shard_hashes(docs).localCheckpoint()  # persisted base
    touched = delta.select(
        F.expr(f"doc_id div {_MERKLE_SHARD}").alias("shard")
    ).distinct()
    # re-read ONLY the touched shards' docs, applying the delta edits
    mod_docs = (
        docs.withColumn(
            "shard", F.expr(f"doc_id div {_MERKLE_SHARD}")
        )
        .join(F.broadcast(touched), "shard")
        .join(
            delta.select("doc_id", F.col("text").alias("new_text")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", F.coalesce("new_text", F.col("text")).alias("text")
        )
    )
    recomputed = _shard_hashes(mod_docs)
    untouched = base_manifest.join(touched, "shard", "left_anti")
    shard_h = untouched.unionByName(recomputed)
    root = shard_h.agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("shard").alias("shard"),
                                F.col("hash").alias("p"),
                            )
                        )
                    ),
                    lambda x: x["p"],
                ),
                "",
            )
        ).alias("hash"),
    ).select(F.lit("<root>").alias("node"), "n_docs", "hash")
    return (
        shard_h.select(
            F.col("shard").cast("string").alias("node"), "n_docs", "hash"
        )
        .unionByName(root)
        .orderBy("node")
    )
