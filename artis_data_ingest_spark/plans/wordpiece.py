"""WordPiece tokenizer: likelihood-scored merges + greedy
longest-match segmentation — completing the tokenizer-training family
(BPE by pair frequency, retrieval.py; unigram-LM by Viterbi EM,
unigram.py; WordPiece here).

Training (Schuster & Nakajima 2012 / BERT): identical merge loop to
BPE, but the merge choice maximizes the corpus LIKELIHOOD gain, i.e.
picks argmax support(l,r) / (freq(l)·freq(r)) instead of raw pair
frequency — rare-but-strongly-associated pairs merge first.  The
ratio comparison is kept engine-exact by quantizing to a bigint:
``score_q = (support << 40) div (freq_l · freq_r)`` (support < 2^19
and freq products < 2^43 in any corpus this runs on at one shard, so
no overflow; ties after quantization break lexicographically — a
deterministic training rule both engines fold identically, which is
what lets the oracle replay training bit-for-bit where float scores
would drift).

Application: greedy longest-prefix matching over the learned symbol
set — the real WordPiece inference rule.  Distributed shape: the
corpus collapses to DISTINCT words once (the unigram.py discipline),
then ≤ ``_WP_MAX_WORD`` rounds each advance every unfinished word by
its longest matching symbol via one broadcast join (symbols are
vocab-bounded) + one per-word argmax.  Positions with no matching
symbol emit the single character and count toward ``n_unk`` (the
[UNK] discipline, kept per-char so the segmentation stays total).
Simplification vs BERT, documented: no '##' word-initial/continuation
distinction — training above merges position-independently, so
application matches position-independently too.

Words longer than ``_WP_MAX_WORD`` (32) chars are excluded in BOTH
engines (the unrolled oracle caps there; corpus max is 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .retrieval import _BPE_SEP, _tokens, _WS_SQL

_WP_MERGES = 8
_WP_MAX_WORD = 32
_WP_SHIFT = 40  # score quantization: (support << 40) div (fl*fr)


def _wp_train(spark: SparkSession, sf_dir: str):
    """Run the scored merge loop; returns (final vocab (word, enc,
    cnt), list of per-merge 1-row DataFrames (merge_rank, l, r,
    merged, support, score_q))."""
    sep2 = _BPE_SEP + _BPE_SEP
    tok = _tokens(spark, sf_dir)
    vocab = (
        tok.groupBy(F.col("term").alias("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "word",
            F.concat(
                F.lit(sep2), F.regexp_replace("word", "(.)", "$1" + sep2)
            ).alias("enc"),
            "cnt",
        )
    ).localCheckpoint()
    tops = []
    for i in range(_WP_MERGES):
        s = F.filter(F.split("enc", sep2), lambda x: x != "")
        syms = vocab.select("cnt", s.alias("s"))
        freq = (
            syms.select("cnt", F.explode("s").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("cnt").cast("bigint").alias("f"))
        )
        idx = F.when(
            F.size("s") >= 2, F.sequence(F.lit(0), F.size("s") - 2)
        ).otherwise(F.array().cast("array<int>"))
        pairs = (
            syms.select("cnt", "s", F.explode(idx).alias("i"))
            .select(
                "cnt",
                F.element_at("s", F.col("i") + 1).alias("l"),
                F.element_at("s", F.col("i") + 2).alias("r"),
            )
            .groupBy("l", "r")
            .agg(F.sum("cnt").cast("bigint").alias("support"))
        )
        scored = (
            pairs.join(
                F.broadcast(freq.select(F.col("sym").alias("l"),
                                        F.col("f").alias("fl"))), "l"
            )
            .join(
                F.broadcast(freq.select(F.col("sym").alias("r"),
                                        F.col("f").alias("fr"))), "r"
            )
            .select(
                "l", "r", "support",
                F.expr(
                    f"(support * cast({1 << _WP_SHIFT} as bigint))"
                    " div (fl * fr)"
                ).cast("bigint").alias("score_q"),
            )
        )
        top = (
            scored.orderBy(
                F.col("score_q").desc(), F.col("l"), F.col("r")
            )
            .limit(1)
            .select(
                F.lit(i).alias("merge_rank"), "l", "r",
                F.concat("l", "r").alias("merged"),
                "support", "score_q",
            )
            .localCheckpoint()
        )
        tops.append(top)
        t = top.collect()[0]
        vocab = vocab.select(
            "word",
            F.regexp_replace(
                "enc",
                F.lit(_BPE_SEP + t["l"] + sep2 + t["r"] + _BPE_SEP),
                F.lit(_BPE_SEP + t["merged"] + _BPE_SEP),
            ).alias("enc"),
            "cnt",
        ).localCheckpoint()
    return vocab, tops


def _wp_train_ctes() -> str:
    """The shared WITH-chain replaying training in DuckDB (vocab0 ..
    vocab{_WP_MERGES}, wtop0 .. — same quantized scoring rule)."""
    s = _BPE_SEP
    head = f"""
wtok AS (
  SELECT token AS word FROM (
    SELECT UNNEST(string_split_regex(trim(text), '{_WS_SQL}')) AS token
    FROM documents
  ) WHERE token <> ''
), wvocab0 AS MATERIALIZED (
  SELECT word,
         '{s}{s}' || regexp_replace(word, '(.)', '\\1{s}{s}', 'g') AS enc,
         COUNT(*) AS cnt
  FROM wtok GROUP BY word
)"""
    rounds = []
    for i in range(_WP_MERGES):
        rounds.append(f""", wsyms{i} AS MATERIALIZED (
  SELECT enc, cnt,
         list_filter(string_split(enc, '{s}{s}'), x -> x <> '') AS sl
  FROM wvocab{i}
), wfreq{i} AS (
  SELECT u.sym AS sym, CAST(SUM(cnt) AS BIGINT) AS f
  FROM wsyms{i}, UNNEST(sl) u(sym) GROUP BY 1
), wpairs{i} AS (
  SELECT sl[u.i + 1] AS l, sl[u.i + 2] AS r,
         CAST(SUM(cnt) AS BIGINT) AS support
  FROM wsyms{i}, UNNEST(range(len(sl) - 1)) u(i)
  GROUP BY 1, 2
), wtop{i} AS MATERIALIZED (
  SELECT {i} AS merge_rank, p.l, p.r, p.l || p.r AS merged, p.support,
         CAST((p.support * {1 << _WP_SHIFT}) // (fl.f * fr.f)
              AS BIGINT) AS score_q
  FROM wpairs{i} p
  JOIN wfreq{i} fl ON fl.sym = p.l
  JOIN wfreq{i} fr ON fr.sym = p.r
  ORDER BY score_q DESC, p.l, p.r LIMIT 1
), wvocab{i + 1} AS MATERIALIZED (
  SELECT word,
         replace(enc, '{s}' || t.l || '{s}{s}' || t.r || '{s}',
                 '{s}' || t.merged || '{s}') AS enc, cnt
  FROM wvocab{i}, wtop{i} t
)""")
    return "WITH" + head + "".join(rounds)


@register(
    "q_wordpiece_merges",
    oracle=_wp_train_ctes()
    + "\nSELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT merge_rank, l, r, merged, support, score_q FROM wtop{i}"
        for i in range(_WP_MERGES)
    )
    + ") ORDER BY merge_rank",
    doc="WordPiece tokenizer TRAINING (Schuster–Nakajima/BERT): the "
    "BPE merge loop re-scored by likelihood gain — argmax "
    "support(l,r)/(freq(l)·freq(r)) with the ratio quantized to an "
    "exact bigint ((support<<40) div (fl·fr)) so both engines pick "
    "identical merges where float scores would drift; "
    "lexicographic tie-break.  Completes the tokenizer-training "
    "family: frequency-scored BPE (q_bpe_merges), Viterbi-EM unigram "
    "LM (q_unigram_segment), likelihood-scored WordPiece here.  Each "
    "round is two vocab-table aggregations + one broadcast-joined "
    "scoring pass — the corpus collapses to the distinct-word table "
    "once; the oracle unrolls all 8 scored rounds.",
)
def q_wordpiece_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, tops = _wp_train(spark, sf_dir)
    out = tops[0]
    for t in tops[1:]:
        out = out.unionByName(t)
    return out.orderBy("merge_rank")


def _wp_apply_oracle() -> str:
    s = _BPE_SEP
    ctes = [_wp_train_ctes()]
    ctes.append(f""", wsymsF AS MATERIALIZED (
  SELECT DISTINCT u.sym AS sym, CAST(length(u.sym) AS BIGINT) AS slen
  FROM (
    SELECT list_filter(string_split(enc, '{s}{s}'), x -> x <> '') AS sl
    FROM wvocab{_WP_MERGES}
  ), UNNEST(sl) u(sym)
), wwords AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM wtok WHERE length(word) <= {_WP_MAX_WORD} GROUP BY word
), wstate0 AS MATERIALIZED (
  SELECT word, cnt, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS k,
         '' AS seg, CAST(0 AS BIGINT) AS n_unk
  FROM wwords
)""")
    for i in range(_WP_MAX_WORD):
        ctes.append(f""", wbest{i} AS MATERIALIZED (
  SELECT c.word, arg_max(v.sym, v.slen) AS sym
  FROM wstate{i} c
  JOIN wsymsF v ON substring(c.word, CAST(c.pos + 1 AS INT),
                             CAST(v.slen AS INT)) = v.sym
  WHERE c.pos < length(c.word)
  GROUP BY c.word
), wstate{i + 1} AS MATERIALIZED (
  SELECT word, cnt, pos, k, seg, n_unk FROM wstate{i}
  WHERE pos >= length(word)
  UNION ALL
  SELECT s.word, s.cnt,
         s.pos + COALESCE(length(b.sym), 1) AS pos,
         s.k + 1 AS k,
         s.seg || CASE WHEN s.k = 0 THEN '' ELSE ' ' END
               || COALESCE(b.sym,
                           substring(s.word, CAST(s.pos + 1 AS INT), 1))
           AS seg,
         s.n_unk + CASE WHEN b.sym IS NULL THEN 1 ELSE 0 END AS n_unk
  FROM wstate{i} s
  LEFT JOIN wbest{i} b ON b.word = s.word
  WHERE s.pos < length(s.word)
)""")
    return (
        "".join(ctes)
        + f"""
SELECT word, cnt, k AS n_tokens, n_unk, seg
FROM wstate{_WP_MAX_WORD}
ORDER BY word
"""
    )


@register(
    "q_wordpiece_apply",
    oracle=_wp_apply_oracle(),
    doc="WordPiece greedy longest-match SEGMENTATION with the trained "
    "symbol set (q_wordpiece_merges artifact): the corpus collapses "
    "to distinct words, then each round advances every unfinished "
    "word past its longest matching symbol — one broadcast join "
    "against the vocab-bounded symbol table (equi on the first "
    "character, prefix-verified) + one per-word argmax; positions "
    "with no matching symbol emit the single character and count as "
    "n_unk.  ≤ 32 rounds bound the loop (a word yields at most one "
    "token per character); the oracle unrolls the identical greedy "
    "DP.  Documented simplification vs BERT: no '##' continuation "
    "marking, matching the position-independent training above.",
)
def q_wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    sep2 = _BPE_SEP + _BPE_SEP
    vocab, _ = _wp_train(spark, sf_dir)
    syms = (
        vocab.select(
            F.explode(
                F.filter(F.split("enc", sep2), lambda x: x != "")
            ).alias("sym")
        )
        .distinct()
        .select(
            "sym",
            F.length("sym").cast("bigint").alias("slen"),
            F.substring("sym", 1, 1).alias("c0"),
        )
        .localCheckpoint()
    )
    tok = _tokens(spark, sf_dir)
    words = (
        tok.groupBy(F.col("term").alias("word"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.length("word") <= _WP_MAX_WORD)
    )
    state = words.select(
        "word",
        "cnt",
        F.lit(0).cast("bigint").alias("pos"),
        F.lit(0).cast("bigint").alias("k"),
        F.lit("").alias("seg"),
        F.lit(0).cast("bigint").alias("n_unk"),
    ).localCheckpoint()
    max_len = state.agg(
        F.coalesce(F.max(F.length("word")), F.lit(0)).alias("m")
    ).collect()[0]["m"]
    for i in range(min(_WP_MAX_WORD, int(max_len))):
        active = state.filter(F.col("pos") < F.length("word"))
        finished = state.filter(F.col("pos") >= F.length("word"))
        # equi component on the first character keeps this a hash join
        # (vocab/alphabet fan-out); the prefix test is the residual
        cand = active.join(
            F.broadcast(syms),
            (
                F.expr("substring(word, CAST(pos + 1 AS INT), 1)")
                == F.col("c0")
            )
            & (
                F.expr(
                    "substring(word, CAST(pos + 1 AS INT),"
                    " CAST(slen AS INT))"
                )
                == F.col("sym")
            ),
            "left",
        )
        best = cand.groupBy("word", "cnt", "pos", "k", "seg", "n_unk").agg(
            F.expr("max_by(sym, slen)").alias("bsym")
        )
        advanced = best.select(
            "word",
            "cnt",
            (
                F.col("pos")
                + F.coalesce(F.length("bsym").cast("bigint"), F.lit(1))
            ).alias("pos"),
            (F.col("k") + 1).alias("k"),
            F.concat(
                "seg",
                F.when(F.col("k") == 0, F.lit("")).otherwise(F.lit(" ")),
                F.coalesce(
                    F.col("bsym"),
                    F.expr("substring(word, CAST(pos + 1 AS INT), 1)"),
                ),
            ).alias("seg"),
            (
                F.col("n_unk")
                + F.when(F.col("bsym").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_unk"),
        )
        state = finished.unionByName(advanced)
        if (i + 1) % 4 == 0:
            state = state.localCheckpoint()
    return state.select(
        "word", "cnt", F.col("k").alias("n_tokens"), "n_unk", "seg"
    ).orderBy("word")
