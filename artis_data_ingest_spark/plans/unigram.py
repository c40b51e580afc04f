"""Unigram-LM (SentencePiece-style) subword segmentation: seed a piece
vocabulary from weighted substring frequencies, score pieces with an
exact fixed-point log-probability, and Viterbi-segment every distinct
word — the maximum-likelihood segmentation under a unigram piece model
(Kudo 2018), the standard alternative to BPE merges (q_bpe_*).

Determinism/portability playbook: piece scores are the integer qlog2
fixed-point logs (functions/numeric.py) — log p(piece) = qlog2(freq) −
qlog2(total) — so the Viterbi objective is an exact bigint sum both
engines agree on bit-for-bit, and every DP tie is broken by the total
order (score DESC, piece-count ASC, split-position ASC).  The DuckDB
oracle unrolls the same DP position-by-position as CTE stages.

Scale story (100 TB): the whole DP runs over the DISTINCT-words table
(vocabulary-bounded — millions of rows when the corpus is petabytes),
never the corpus; rounds are bounded by the max word length (capped at
16 chars; longer tails fall back to the byte/char path in production),
each round is one equi-join + one per-word argmax over a table that
small; the corpus itself is touched exactly once (the word-count
rollup) plus once more if segmented text is materialized (a broadcast
join of the word->pieces map).  This "segment the vocabulary, then
broadcast the lookup" shape is how SentencePiece-style tokenization is
actually deployed on web-scale corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import qlog2_duck_cte, with_qlog2
from ..functions.textstats import WS_RE
from ..sources.tables import load_table
from .registry import register

_MAX_PIECE = 4  # max piece length in characters
_MAX_WORD = 16  # DP unroll bound; longer words are excluded (documented)
_MINF_SHIFT = 8  # multi-char piece enters the vocab iff freq >= total >> 8

_WS_SQL = r"[ \t\n\r\f\x0B]+"


def _word_counts(docs: DataFrame) -> DataFrame:
    from ..operators.scale import spread_cpu_bound

    tok = F.explode(F.split(F.trim(F.col("text")), WS_RE)).alias("token")
    return (
        spread_cpu_bound(docs)
        .select(tok)
        .filter(F.col("token") != "")
        .select(F.lower("token").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wcount"))
        .withColumn("wlen", F.length("word").cast("bigint"))
        .filter(F.col("wlen") <= _MAX_WORD)
    )


def _occurrences(wc: DataFrame) -> DataFrame:
    """All (word, i, j, piece) substring occurrences with
    j - i <= _MAX_PIECE, 0-based i, exclusive j."""
    pos = wc.select(
        "word",
        "wlen",
        "wcount",
        F.explode(F.sequence(F.lit(0), F.col("wlen") - 1)).alias("i"),
    )
    lens = pos.select(
        "word",
        "wlen",
        "wcount",
        "i",
        F.explode(
            F.sequence(
                F.lit(1), F.least(F.lit(_MAX_PIECE), F.col("wlen") - F.col("i"))
            )
        ).alias("l"),
    )
    return lens.select(
        "word",
        "wlen",
        "wcount",
        F.col("i").cast("bigint").alias("i"),
        (F.col("i") + F.col("l")).cast("bigint").alias("j"),
        F.expr(
            "substring(word, CAST(i + 1 AS INT), CAST(l AS INT))"
        ).alias("piece"),
    )


def segment_vocabulary(docs: DataFrame) -> DataFrame:
    """Viterbi-segment every distinct word of ``docs`` under the
    unigram piece LM.  Returns (word, wcount, wlen, path, value,
    n_pieces) with ``path`` the space-joined piece sequence."""
    wc = _word_counts(docs).localCheckpoint()
    occ = _occurrences(wc)
    # r16 (VERDICT r15 task 4, guide §1.2/§5): materialize the
    # piece-frequency table (piece-vocabulary-bounded, tiny) instead
    # of the old qlog2 value table.  pfreq feeds THREE consumers (the
    # tot_all broadcast, the vocab filter under both vocab_s and
    # totalp) and each un-materialized evaluation re-exploded occ from
    # wc; the distinct-vals + qtab checkpoint added one more shuffle
    # and job.  qlog2 now applies INLINE on the filtered vocab and the
    # 1-row totalp (identical values — the UDF is deterministic and
    # vectorized; see train_unigram_lm).  Same job count with far less
    # re-execution: occ evaluates exactly twice (pfreq build + edges).
    pfreq = occ.groupBy("piece").agg(
        F.sum("wcount").cast("bigint").alias("pfreq")
    ).localCheckpoint()
    tot = pfreq.agg(
        F.sum("pfreq").cast("bigint").alias("tot_all")
    )
    vocab = (
        pfreq.crossJoin(F.broadcast(tot))
        .filter(
            (F.length("piece") == 1)
            | (F.col("pfreq") >= F.expr(f"tot_all div {1 << _MINF_SHIFT}"))
        )
        .select("piece", "pfreq")
    )
    # totalp is the vocab mass, NOT tot_all
    totalp = vocab.agg(F.sum("pfreq").cast("bigint").alias("totalp"))
    qtot = with_qlog2(totalp, "totalp", "q").select(
        F.col("q").alias("qtot")
    )
    vocab_s = (
        with_qlog2(vocab, "pfreq", "q")
        .crossJoin(F.broadcast(qtot))
        .select("piece", (F.col("q") - F.col("qtot")).alias("es"))
    )
    edges = occ.join(vocab_s, "piece").select(
        "word", "wlen", "wcount", "i", "j", "piece", "es"
    )
    # NOTE(r11, measured): the DP used to run as <= 16 driver-sequenced
    # rounds (filter j==r -> join prior frontier -> per-word argmax ->
    # localCheckpoint), which made the query latency-bound by job
    # count, not data: 5.8s at sf0.1 with every round a barrier.  (The
    # r9-rejected variant — checkpointing only every _MAX_PIECE rounds,
    # commit a2b8f26 — made it WORSE, 9.6s, by re-executing lazy
    # rounds.)  The DP is local to a word, so the Spark-right shape is
    # one shuffle that brings each word's <= wlen*_MAX_PIECE scored
    # edges together and one Arrow-batched pass that runs the exact
    # same integer Viterbi per word in-process: identical bigint
    # scores, identical (value DESC, np ASC, i ASC) tie order, zero
    # sequential barriers.  At 100 TB this is also the better scale
    # story: the shuffle is vocabulary-bounded (distinct words, never
    # the corpus), and rounds no longer serialize cluster-wide.
    per_word = edges.groupBy("word", "wlen", "wcount").agg(
        F.collect_list(F.struct("i", "j", "piece", "es")).alias("edges")
    )

    def _viterbi(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for word, wlen, wcount, eds in zip(
                pdf["word"], pdf["wlen"], pdf["wcount"], pdf["edges"]
            ):
                n = int(wlen)
                by_j: dict[int, list] = {}
                for e in eds:
                    by_j.setdefault(int(e["j"]), []).append(
                        (int(e["i"]), e["piece"], int(e["es"]))
                    )
                # best[j] = (value, np, path); ties broken by
                # (value DESC, np ASC, i ASC) — the same total order
                # the oracle's QUALIFY uses
                best: list = [None] * (n + 1)
                best[0] = (0, 0, "")
                for j in range(1, n + 1):
                    pick = None
                    pick_key = None
                    for i, piece, es in by_j.get(j, ()):
                        p = best[i]
                        if p is None:
                            continue
                        key = (p[0] + es, -(p[1] + 1), -i)
                        if pick_key is None or key > pick_key:
                            pick_key = key
                            pick = (
                                p[0] + es,
                                p[1] + 1,
                                piece if p[2] == "" else p[2] + " " + piece,
                            )
                    best[j] = pick
                fin = best[n]
                if fin is not None:
                    out.append(
                        (word, int(wcount), n, fin[2], fin[0], fin[1])
                    )
            yield pd.DataFrame(
                out,
                columns=["word", "wcount", "wlen", "path", "value", "np"],
            )

    return per_word.mapInPandas(
        _viterbi,
        "word string, wcount bigint, wlen bigint, path string, "
        "value bigint, np bigint",
    )


def _unigram_seg_cte() -> str:
    ql, ql_out = qlog2_duck_cte("vals", "x")
    minf_div = 1 << _MINF_SHIFT
    rounds = []
    for r in range(1, _MAX_WORD + 1):
        rounds.append(
            f"""b{r} AS (
  SELECT e.word, CAST({r} AS BIGINT) AS j,
         u.value + e.es AS value, u.np + 1 AS np,
         CASE WHEN u.path = '' THEN e.piece
              ELSE u.path || ' ' || e.piece END AS path
  FROM edges e JOIN u{r - 1} u ON e.word = u.word AND e.i = u.j
  WHERE e.j = {r}
  QUALIFY row_number() OVER (
    PARTITION BY e.word
    ORDER BY u.value + e.es DESC, u.np + 1 ASC, e.i ASC) = 1
),
u{r} AS MATERIALIZED (SELECT * FROM u{r - 1} UNION ALL SELECT * FROM b{r})"""
        )
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH wc AS (
  SELECT lower(tok) AS word, CAST(COUNT(*) AS BIGINT) AS wcount,
         CAST(length(lower(tok)) AS BIGINT) AS wlen
  FROM (SELECT UNNEST(string_split_regex(trim(text), '{_WS_SQL}')) AS tok
        FROM documents)
  WHERE tok <> ''
  GROUP BY 1
  HAVING length(lower(tok)) <= {_MAX_WORD}
), posi AS (
  SELECT word, wlen, wcount, CAST(UNNEST(range(wlen)) AS BIGINT) AS i
  FROM wc
), occ AS (
  SELECT word, wlen, wcount, i, CAST(i + l AS BIGINT) AS j,
         substring(word, CAST(i + 1 AS INT), CAST(l AS INT)) AS piece
  FROM posi
  CROSS JOIN (SELECT UNNEST(range(1, {_MAX_PIECE + 1})) AS l) tl
  WHERE i + l <= wlen
), pfreq AS (
  SELECT piece, CAST(SUM(wcount) AS BIGINT) AS pfreq
  FROM occ GROUP BY piece
), tota AS (SELECT CAST(SUM(pfreq) AS BIGINT) AS tot_all FROM pfreq),
vocab AS (
  SELECT piece, pfreq
  FROM pfreq CROSS JOIN tota
  WHERE length(piece) = 1 OR pfreq >= tot_all // {minf_div}
), totp AS (SELECT CAST(SUM(pfreq) AS BIGINT) AS totalp FROM vocab),
vals AS (
  SELECT DISTINCT pfreq AS x FROM vocab
  UNION
  SELECT totalp AS x FROM totp
),
{ql},
vocab_s AS (
  SELECT v.piece,
         o.qlog2 - (SELECT o2.qlog2 FROM totp t
                    JOIN {ql_out} o2 ON o2.x = t.totalp) AS es
  FROM vocab v JOIN {ql_out} o ON o.x = v.pfreq
), edges AS MATERIALIZED (
  SELECT occ.word, occ.i, occ.j, occ.piece, vocab_s.es
  FROM occ JOIN vocab_s USING (piece)
), u0 AS MATERIALIZED (
  SELECT word, CAST(0 AS BIGINT) AS j, CAST(0 AS BIGINT) AS value,
         CAST(0 AS BIGINT) AS np, '' AS path
  FROM wc
),
{rounds_sql},
seg AS MATERIALIZED (
  SELECT u.word, u.path, u.np, wc.wcount
  FROM u{_MAX_WORD} u JOIN wc ON u.word = wc.word AND u.j = wc.wlen
)"""


def _unigram_oracle() -> str:
    return f"""
{_unigram_seg_cte()}, pieces AS (
  SELECT word, wcount, UNNEST(string_split(path, ' ')) AS piece
  FROM seg
)
SELECT piece,
       CAST(length(piece) AS BIGINT) AS piece_len,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words,
       CAST(SUM(wcount) AS BIGINT) AS n_uses,
       MIN(word) AS example_word
FROM pieces
GROUP BY piece
ORDER BY n_uses DESC, piece
"""


@register(
    "q_unigram_segment",
    oracle=_unigram_oracle(),
    bench=True,
    doc="Unigram-LM (SentencePiece-style, Kudo 2018) subword "
    "segmentation: substring frequencies seed the piece vocabulary "
    "(all single chars + every <=4-char substring holding >= 1/256 of "
    "the total substring mass), each piece scores log p = "
    "qlog2(freq) - qlog2(total) in exact fixed-point integers, and a "
    "Viterbi DP picks each distinct word's maximum-likelihood "
    "segmentation (ties: fewer pieces, then longest last piece) — the "
    "standard alternative to BPE, completing the tokenizer family "
    "(q_bpe_merges/vocab/apply/pack, q_tokenizer_fertility).  The "
    "result is the segmented-piece usage table weighted by corpus "
    "word counts.  Scale: the DP never touches the corpus — it runs "
    "over the DISTINCT-words table (vocabulary-bounded), one "
    "equi-join + per-word argmax per character position, <= 16 "
    "rounds, each round's frontier localCheckpoint-bounded; the "
    "corpus contributes one word-count rollup, and applying the "
    "learned segmentation is a broadcast word->pieces lookup.  The "
    "oracle unrolls the identical DP as 16 CTE stages with the same "
    "bigint scores and tie order — the hash match IS the proof that "
    "the distributed DP equals the sequential one.",
)
def q_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seg = segment_vocabulary(docs.select("doc_id", "text"))
    pieces = seg.select(
        "word", "wcount", F.explode(F.split("path", " ")).alias("piece")
    )
    return (
        pieces.groupBy("piece")
        .agg(
            F.countDistinct("word").cast("bigint").alias("n_words"),
            F.sum("wcount").cast("bigint").alias("n_uses"),
            F.min("word").alias("example_word"),
        )
        .select(
            "piece",
            F.length("piece").cast("bigint").alias("piece_len"),
            "n_words",
            "n_uses",
            "example_word",
        )
        .orderBy(F.col("n_uses").desc(), "piece")
    )


def _unigram_apply_oracle() -> str:
    return f"""
{_unigram_seg_cte()}, tok AS (
  SELECT doc_id, lower(tokr) AS word
  FROM (SELECT doc_id,
               UNNEST(string_split_regex(trim(text), '{_WS_SQL}')) AS tokr
        FROM documents)
  WHERE tokr <> '' AND length(tokr) <= {_MAX_WORD}
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(s.np) AS BIGINT) AS n_pieces,
       CAST(SUM(s.np) AS DOUBLE) / COUNT(*) AS pieces_per_word
FROM tok t JOIN seg s ON s.word = t.word
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@register(
    "q_unigram_apply",
    oracle=_unigram_apply_oracle(),
    doc="APPLY the learned unigram-LM segmentation to the corpus: the "
    "word -> piece-count map from the Viterbi DP (vocabulary-bounded, "
    "broadcastable at any corpus size) joins the token stream once, "
    "reporting per-document word counts, piece counts, and fertility "
    "(pieces per word) — the deployment path of the tokenizer, "
    "mirroring q_bpe_apply for the BPE family.  The corpus is touched "
    "exactly twice across train+apply (the word-count rollup and this "
    "lookup join); everything else is DISTINCT-words-bounded.",
)
def q_unigram_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seg = segment_vocabulary(docs).select("word", "np")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim("text"), WS_RE)).alias("tokr"),
        )
        .filter(
            (F.col("tokr") != "") & (F.length("tokr") <= _MAX_WORD)
        )
        .select("doc_id", F.lower("tokr").alias("word"))
    )
    return (
        tok.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("np").cast("bigint").alias("n_pieces"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_pieces",
            (
                F.col("n_pieces").cast("double") / F.col("n_words")
            ).alias("pieces_per_word"),
        )
        .orderBy("doc_id")
    )
