"""CCNet-style n-gram LM perplexity quality filter (Wenzek et al.
2020): train a unigram language model on a held-out corpus slice,
score every remaining document by per-token log-perplexity, and cut
the corpus into head / middle / tail quality buckets — the standard
companion to the Gopher rule set (plans/text.py:q_gopher_rules).

Exact-arithmetic design (the repo playbook): probabilities are never
materialized as floats.  With add-one smoothing p(w) = (c(w)+1)/(T+V)
(T = training tokens, V = vocab size + 1 so OOV carries 1/(T+V)),

  log2 ppl(doc) = log2(T+V) - (1/N) * sum_w log2(c(w)+1)

Every log2 is the deterministic fixed-point integer qlog2 from
functions/numeric.py (identical shift-and-square recurrence in Spark
and DuckDB), so the per-doc score key

  key = (N * qlog2(T+V) - sum_w qlog2(c(w)+1)) * 64 div N

is an exact bigint both engines agree on bit-for-bit; the only float
in the output is one final division by 2^26.

Scale shape (100 TB): the token->vocab join is one hash shuffle on
term; qlog2 runs on the DISTINCT count values (a few hundred rows at
any corpus size — Zipf), broadcast back; bucket thresholds come from
a distributed rank (per-key cumulative counts + a window over the
distinct-key table, group-bounded 1-part exchange — never a global
per-doc sort).  OOV tokens score qlog2(1) = 0, exactly the c=0
smoothed mass, so no special-casing crosses the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import with_qlog2
from ..functions.textstats import WS_RE

#: extra resolution bits applied before the final integer division by N
KEY_EXTRA_BITS = 6
#: output scale: qlog2 frac bits (20) + KEY_EXTRA_BITS
KEY_SCALE = 1 << 26


def _terms(docs: DataFrame) -> DataFrame:
    # split+explode over a small single-split parquet would run on one
    # core; spread first (no-op when the scan already has enough
    # splits — the 100 TB case)
    from .scale import spread_cpu_bound

    tok = F.explode(F.split(F.trim(F.col("text")), WS_RE)).alias("token")
    return (
        spread_cpu_bound(docs).select("doc_id", tok)
        .filter(F.col("token") != "")
        .select("doc_id", F.lower("token").alias("term"))
    )


def train_unigram_lm(
    docs: DataFrame, holdout_mod: int = 10
) -> tuple[DataFrame, DataFrame]:
    """Train the unigram LM on docs with doc_id % holdout_mod == 0.
    Returns the two trained artifacts: ``vocab_s`` (term, s=qlog2 of
    the smoothed count — vocabulary-bounded) and ``sden`` (one row:
    qlog2 of the smoothing denominator).  Both persist to parquet
    losslessly (bigints), which is how the streaming scorer
    (streaming/quality.py) consumes them."""
    train = _terms(docs.filter(F.col("doc_id") % holdout_mod == 0))
    # the trained artifact: materialize ONCE (the _bpe_train pattern).
    # vocab feeds three consumers (totals, distinct counts, scoring
    # map) and the deep tokenize subtree would otherwise be re-planned
    # and re-executed under each — measured 20% of query wall time in
    # pure driver-side planning of the duplicated trees
    vocab = train.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()
    # T, V and the smoothing denominator in one 1-row reduction
    tot = vocab.agg(
        (
            F.sum("c").cast("bigint")
            + F.count(F.lit(1)).cast("bigint")
            + F.lit(1)
        ).alias("den")
    )
    # r16 (VERDICT r15 task 3, guide §1.2): qlog2 applies INLINE on
    # the checkpointed vocab instead of via a distinct-values table —
    # the former vals-union-distinct + qtab localCheckpoint was one
    # extra shuffle plus one extra JOB of pure latency per LM build
    # (the vocab here is Zipf-tiny), and the since-r12 vectorized-UDF
    # qlog2 costs ~20 numpy ops per ROW, so evaluating it over the
    # vocab directly is cheap at any vocabulary size.  Values are
    # identical by determinism of the recurrence (same-process parity
    # + oracle verified).  Measured: lm_perplexity_buckets
    # 3.74 → 1.65 s same-process at sf0.1.
    vocab_s = with_qlog2(
        vocab.withColumn("x", F.col("c") + F.lit(1)), "x", "s"
    ).select("term", "s")
    sden = with_qlog2(tot, "den", "q").select(
        F.col("q").alias("sden")
    )
    return vocab_s, sden


def score_documents(
    docs: DataFrame, vocab_s: DataFrame, sden: DataFrame
) -> DataFrame:
    """Score a document set against trained LM artifacts: returns
    (doc_id, key) where key is the exact bigint 2^26-scaled log2
    perplexity.  Stateless per doc — the streaming scorer applies it
    per micro-batch unchanged (scores never depend on other docs;
    only the tercile CUT is corpus-wide)."""
    apply_terms = _terms(docs)
    # vocab_s is vocabulary-bounded (unigram vocabs broadcast even for
    # web-scale corpora); broadcasting keeps the corpus token stream
    # OUT of a term-hash shuffle — scoring becomes map-side
    scored = apply_terms.join(
        F.broadcast(vocab_s), on="term", how="left"
    ).select(
        "doc_id", F.coalesce("s", F.lit(0).cast("bigint")).alias("s")
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("sum_q"),
    )
    return per_doc.crossJoin(F.broadcast(sden)).select(
        "doc_id",
        F.expr(
            f"((n * sden - sum_q) * {1 << KEY_EXTRA_BITS}) div n"
        ).alias("key"),
    )


def lm_perplexity_buckets(
    docs: DataFrame, holdout_mod: int = 10
) -> DataFrame:
    """Train on docs with doc_id % holdout_mod == 0, score the rest;
    returns (doc_id, bucket head|middle|tail, ppl_key bigint,
    log2_ppl double) — see module docstring for exactness/scale."""
    vocab_s, sden = train_unigram_lm(docs, holdout_mod)
    keyed = score_documents(
        docs.filter(F.col("doc_id") % holdout_mod != 0), vocab_s, sden
    )
    return bucketize_keys(keyed)


def bucketize_keys(keyed: DataFrame) -> DataFrame:
    """Tercile-bucket (doc_id, key) rows into head/middle/tail with the
    distributed-rank recipe (shared by the unigram and bigram LMs).
    Returns (doc_id, bucket, ppl_key, log2_ppl)."""
    # keyed is consumed TWICE below (the per-key counts and the rank
    # join) and its subplan is the full scoring pipeline — checkpoint
    # once instead of re-executing it (r11, measured at sf0.1:
    # q_lm_perplexity_buckets 2.53s -> 2.27s, q_bigram_ppl_buckets
    # ~neutral at this SF but the avoided recompute grows with the
    # corpus while the checkpoint write is result-sized — one
    # (doc_id, key) row per doc)
    keyed = keyed.localCheckpoint()
    # distributed rank in ONE shuffle of the per-doc table (r12 — the
    # former shape shuffled keyed twice, once for a groupBy(key) count
    # and once for the row_number window): both the within-key
    # row_number AND the per-key count come from the same
    # key-partitioned exchange, and the distinct (key, kn) reduction
    # reuses that partitioning (clustering on a superset of the
    # partition keys adds no exchange)
    wk = Window.partitionBy("key")
    marked = keyed.withColumn(
        "rn", F.row_number().over(wk.orderBy("doc_id"))
    ).withColumn("kn", F.count(F.lit(1)).over(wk))
    # one distinct-key pass yields BOTH the cumulative rank starts and
    # the grand total (rows-unbounded window over the same tiny table)
    # — folding nd in here removes a separate aggregate + crossJoin
    # stage barrier from the critical path
    kcum = marked.select("key", "kn").distinct().withColumn(
        "endr",
        F.sum("kn").over(
            Window.orderBy("key").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    ).withColumn(
        "nd",
        F.sum("kn").over(
            Window.orderBy("key").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("bigint"),
    ).select("key", "endr", "nd")
    ranked = marked.join(
        F.broadcast(kcum), on="key"
    ).select(
        "doc_id", "key", "nd",
        (F.col("endr") - F.col("kn") + F.col("rn")).alias("rnk"),
    )
    return (
        ranked
        .select(
            "doc_id",
            F.when(F.col("rnk") <= F.expr("nd div 3"), "head")
            .when(F.col("rnk") <= F.expr("(2 * nd) div 3"), "middle")
            .otherwise("tail")
            .alias("bucket"),
            F.col("key").alias("ppl_key"),
            (F.col("key").cast("double") / F.lit(float(KEY_SCALE))).alias(
                "log2_ppl"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Bigram LM (add-one over per-context counts) — the next rung of the
# CCNet quality ladder above the unigram model: p(w | prev) =
# (c2(prev,w) + 1) / (c1(prev) + V), with a '<s>' sentinel context for
# each document's first token so every token scores exactly once.
# log2 p is the exact integer difference qlog2(c2+1) - qlog2(c1+V);
# unseen contexts score -qlog2(V) (c1 = 0, c2 = 0) with no special
# casing beyond two coalesces.
# ---------------------------------------------------------------------------

BOS = "<s>"


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, prev, term) for every token, prev = preceding token or
    the BOS sentinel.  NOTE(r11, measured): this used to be a lag()
    over a doc_id-partitioned window, which shuffles the whole token
    stream just to reach each token's neighbor — but the predecessor
    is derivable ARRAY-SIDE before the explode: zip the token array
    with (BOS ++ tokens[:-1]) inside the scan.  Same rows, zero
    exchanges; at 100 TB the tokenization stays embarrassingly
    parallel instead of paying a corpus-wide hash partition."""
    from .scale import spread_cpu_bound

    toks = F.filter(
        F.transform(
            F.split(F.trim(F.col("text")), WS_RE), lambda t: F.lower(t)
        ),
        lambda t: t != "",
    )
    return (
        spread_cpu_bound(docs)
        .select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    # first size(toks) elements of (BOS ++ toks): the
                    # predecessor array, exactly matching length (an
                    # empty doc zips two empty arrays -> no rows)
                    F.slice(
                        F.concat(F.array(F.lit(BOS)), F.col("toks")),
                        1,
                        F.size("toks"),
                    ).alias("prev"),
                    F.col("toks").alias("term"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.prev").alias("prev"),
                F.col("bg.term").alias("term"))
    )


def train_bigram_lm(
    docs: DataFrame, holdout_mod: int = 10
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train on docs with doc_id % holdout_mod == 0.  Returns
    (bigram_s (prev, term, s=qlog2(c2+1)),
     ctx_s (prev, sden=qlog2(c1+V)),
     qv (1 row: qv=qlog2(V)) — the unseen-context denominator).
    V = distinct trained terms + 1 (the OOV word class)."""
    bg = _bigrams(docs.filter(F.col("doc_id") % holdout_mod == 0))
    c2 = bg.groupBy("prev", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    ).localCheckpoint()
    c1 = c2.groupBy("prev").agg(F.sum("c2").cast("bigint").alias("c1"))
    vv = c2.select("term").distinct().agg(
        (F.count(F.lit(1)).cast("bigint") + 1).alias("v")
    )
    ctx = c1.crossJoin(F.broadcast(vv)).select(
        "prev", (F.col("c1") + F.col("v")).alias("c1v")
    )
    # r16: inline qlog2 on each artifact (see train_unigram_lm) — the
    # distinct-values qtab shuffle + checkpoint job and its three
    # broadcast joins are gone; identical values by determinism.
    bigram_s = with_qlog2(
        c2.withColumn("x", F.col("c2") + F.lit(1)), "x", "s"
    ).select("prev", "term", "s")
    ctx_s = with_qlog2(ctx, "c1v", "q").select(
        "prev", F.col("q").alias("sden")
    )
    qv = with_qlog2(vv, "v", "q").select(F.col("q").alias("qv"))
    return bigram_s, ctx_s, qv


def score_documents_bigram(
    docs: DataFrame,
    bigram_s: DataFrame,
    ctx_s: DataFrame,
    qv: DataFrame,
) -> DataFrame:
    """(doc_id, key): key = ((sum(den) - sum(num)) * 64) div n over the
    doc's bigram stream — the exact 2^26-scaled log2 perplexity under
    the bigram model.  The bigram artifact is vocabulary^2-bounded
    (broadcast here; at open-web vocab sizes it joins on the
    (prev, term) hash instead — same plan shape, one shuffle)."""
    bg = _bigrams(docs)
    scored = (
        bg.join(F.broadcast(bigram_s), on=["prev", "term"], how="left")
        .join(F.broadcast(ctx_s), on="prev", how="left")
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            F.coalesce("s", F.lit(0).cast("bigint")).alias("num"),
            F.coalesce("sden", F.col("qv")).alias("den"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("num").cast("bigint").alias("sum_num"),
        F.sum("den").cast("bigint").alias("sum_den"),
    )
    return per_doc.select(
        "doc_id",
        F.expr(
            f"((sum_den - sum_num) * {1 << KEY_EXTRA_BITS}) div n"
        ).alias("key"),
    )


def bigram_perplexity_buckets(
    docs: DataFrame, holdout_mod: int = 10
) -> DataFrame:
    """Bigram twin of lm_perplexity_buckets: train on the holdout
    slice, score the rest, tercile-bucket."""
    bigram_s, ctx_s, qv = train_bigram_lm(docs, holdout_mod)
    keyed = score_documents_bigram(
        docs.filter(F.col("doc_id") % holdout_mod != 0),
        bigram_s, ctx_s, qv,
    )
    return bucketize_keys(keyed)
