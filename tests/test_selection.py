"""Behavior pins for the data-selection operators (plans/selection.py):
planted fixtures prove each operator fires on exactly the rows its
published recipe says it should."""

from __future__ import annotations

from pyspark.sql import functions as F

from artis_data_ingest_spark.plans.selection import (
    dsir_weights,
    semantic_contamination,
    substring_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_substring_dedup_removes_planted_span(spark):
    """Two docs share a verbatim 8-word span (plus one doc repeats it
    internally); every occurrence's positions are removed, unique words
    survive, and a doc with no duplicated span is untouched."""
    span = "a b c d e f g h"
    docs = _docs(
        spark,
        [
            (1, f"intro {span} outro", "s"),
            (2, f"{span} tail words here", "s"),
            (3, "totally unique words that never repeat anywhere at all", "s"),
            (4, f"{span} mid {span}", "s"),
        ],
    )
    out = {r["doc_id"]: r for r in substring_dedup(docs).collect()}
    assert out[1]["n_words"] == 10 and out[1]["n_removed"] == 8
    assert out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    # doc 4: both occurrences (positions 1-8 and 10-17) removed; 'mid'
    # at position 9 survives
    assert out[4]["n_words"] == 17 and out[4]["n_removed"] == 16
    # kept text is order-preserving: doc 1 keeps 'intro outro'
    import hashlib

    assert out[1]["kept_md5"] == hashlib.md5(b"intro outro").hexdigest()
    assert out[4]["kept_md5"] == hashlib.md5(b"mid").hexdigest()
    # untouched doc keeps its full text
    assert (
        out[3]["kept_md5"]
        == hashlib.md5(
            b"totally unique words that never repeat anywhere at all"
        ).hexdigest()
    )


def test_substring_dedup_cross_doc_only_counts_total_occurrences(spark):
    """A span repeated only WITHIN one doc still counts as duplicated
    (total occurrences >= 2), matching Lee et al.'s suffix-array
    semantics where self-repeats are duplicates too."""
    span = "p q r s t u v w"
    docs = _docs(spark, [(1, f"{span} x {span}", "s"), (2, "other words", "s")])
    out = {r["doc_id"]: r for r in substring_dedup(docs).collect()}
    assert out[1]["n_removed"] == 16
    assert out[2]["n_removed"] == 0


def test_dsir_weights_rank_targetlike_docs_higher(spark):
    """A pool doc written in the target domain's vocabulary must get a
    strictly higher importance weight than a pool doc written in a
    disjoint vocabulary."""
    tgt_text = "alpha beta gamma delta alpha beta gamma delta"
    docs = _docs(
        spark,
        [
            (0, tgt_text, "src0"),
            (1, tgt_text, "src0"),
            (10, "alpha beta gamma delta", "pool"),  # target-like
            (11, "zonk quux blorp frobnicate", "pool"),  # off-domain
        ],
    )
    out = {r["doc_id"]: r for r in dsir_weights(docs, target="src0").collect()}
    assert set(out) == {10, 11}  # target slice is never scored
    assert out[10]["dsir_key"] > out[11]["dsir_key"]
    assert out[10]["log2_weight"] > out[11]["log2_weight"]
    # the target-like doc should actually look target-positive
    assert out[10]["log2_weight"] > 0


def test_semantic_contamination_flags_planted_duplicate(spark):
    """An eval vector identical to a train vector is flagged with that
    train id at cosine 1.0; an orthogonal eval vector is not flagged."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),  # eval: exact dup of train 7
        (10, [0.0, 0.0, 0.0, 1.0]),  # eval: orthogonal to all train
        (7, [1.0, 0.0, 0.0, 0.0]),
        (8, [0.0, 1.0, 0.0, 0.0]),
        (9, [0.70710678, 0.70710678, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    ev = emb.filter(F.col("vec_id") % 10 == 0)
    tr = emb.filter(F.col("vec_id") % 10 != 0)
    out = {
        r["eval_id"]: r
        for r in semantic_contamination(tr, ev, threshold=0.9).collect()
    }
    assert out[0]["nearest_train_id"] == 7
    assert out[0]["cosine"] == 1.0
    assert out[0]["contaminated"] is True
    assert out[10]["contaminated"] is False
    assert out[10]["cosine"] == 0.0
    # ties (vec 10 is orthogonal to every train vector) break on the
    # smallest train id — deterministic reporting
    assert out[10]["nearest_train_id"] == 7


def test_ewma_decay_exact_taps(spark):
    """EWMA weights are exact halvings: a constant-1 series converges
    to 2 - 2^-7; the first event of each user scores its own value."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "view", 1.0, "{}")
        for i in range(10)
    ] + [(100, dt.datetime(2024, 1, 1), 2, "view", 8.0, "{}")]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    ev.createOrReplaceTempView("_ewma_ev")
    from artis_data_ingest_spark.plans.events_time import _ewma_expr

    out = {
        r["event_id"]: r["d"]
        for r in spark.sql(
            f"select event_id, {_ewma_expr('spark')} as d from _ewma_ev"
        ).collect()
    }
    assert out[0] == 1.0  # first event: no history
    assert out[100] == 8.0  # other user unaffected
    # 8 taps of a constant-1 series: 1 + 1/2 + ... + 1/128 = 2 - 2^-7
    assert out[9] == 2.0 - 2.0**-7


def test_mann_whitney_auc_known_values(spark):
    """Perfect separation -> AUC 1.0; inverted -> 0.0; all-tied -> 0.5
    (midrank handling)."""
    from artis_data_ingest_spark.plans.analytics_ext import mann_whitney_auc

    def auc(rows):
        df = spark.createDataFrame(rows, "value double, pos bigint")
        return mann_whitney_auc(df).collect()[0]

    perfect = auc([(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)])
    assert perfect["auc"] == 1.0
    inverted = auc([(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0)])
    assert inverted["auc"] == 0.0
    tied = auc([(5.0, 0), (5.0, 0), (5.0, 1), (5.0, 1)])
    assert tied["auc"] == 0.5
    assert tied["n_pos"] == 2 and tied["n_neg"] == 2


def test_robots_policy_rfc_semantics(spark):
    """RFC 9309 pins: longest-match wins, allow beats disallow on
    specificity, a named agent group REPLACES '*' (never merges), and
    unmatched paths default to allowed."""
    from artis_data_ingest_spark.plans.text import q_robots_policy

    rows = q_robots_policy(spark, "/root/testdata/sf0.001").collect()
    dec = {(r["agent"], r["path"]): r for r in rows}

    # longest match: allow /private/pub/ overrides disallow /private/
    pub = [v for (a, p), v in dec.items()
           if a == "*" and p.startswith("/private/pub/")]
    assert pub and all(v["allowed"] is True for v in pub)
    assert all(v["decisive_rule"] == "/private/pub/" for v in pub)
    pr = [v for (a, p), v in dec.items()
          if a == "*" and p.startswith("/private/") and "/pub/" not in p]
    assert pr and all(v["allowed"] is False for v in pr)
    # group replacement: databot has no /private rule -> default allow
    db_private = [v for (a, p), v in dec.items()
                  if a == "databot" and p.startswith("/private/")]
    assert db_private and all(v["allowed"] is True for v in db_private)
    assert all(v["decisive_rule"] is None for v in db_private)
    # wildcard + anchor: *.zip$ denies for '*', not for databot
    zips = [(a, v) for (a, p), v in dec.items() if p.endswith(".zip")]
    for a, v in zips:
        assert v["allowed"] is (a == "databot")
    # databot: /api/data/ allowed (longest), /api/*.pdf denied
    api_data = [v for (a, p), v in dec.items()
                if a == "databot" and p.startswith("/api/data/")]
    assert api_data and all(v["allowed"] is True for v in api_data)
    api_pdf = [v for (a, p), v in dec.items()
               if a == "databot" and p.startswith("/api/") and p.endswith(".pdf")]
    assert api_pdf and all(v["allowed"] is False for v in api_pdf)


def _py_qlog2(x: int, B: int = 20, P: int = 28) -> int:
    """Pure-Python mirror of functions/numeric.with_qlog2 — the
    determinism claim is that all three (Spark, DuckDB, this) agree."""
    e = x.bit_length() - 1
    t = (x << P) >> e
    f = 0
    hi = 1 << (2 * P + 1)
    for _ in range(B):
        u = t * t
        b = 1 if u >= hi else 0
        t = u // (1 << (P + b))
        f = f * 2 + b
    return e * (1 << B) + f


def test_weighted_sample_matches_python_reference(spark):
    """The E-S priority (qlog2(u)-qlog2(2^32))/w computed by Spark is
    bit-identical to a pure-Python evaluation of the same fixed-point
    recurrence, and the per-stratum top-k picks exactly the reference
    ranking."""
    import hashlib

    from artis_data_ingest_spark.plans.selection import weighted_sample

    rows = [
        (i, f"text {i}", "s" + str(i % 2), 10 + 97 * i) for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, n_chars bigint"
    )
    out = weighted_sample(docs, k=3).collect()

    def prio(doc_id, w):
        u = int(hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()[:8], 16) + 1
        return float(_py_qlog2(u) - (32 << 20)) / w

    expect = {}
    for i, _, src, w in rows:
        expect.setdefault(src, []).append((prio(i, w), i))
    for src in expect:
        expect[src] = sorted(expect[src], key=lambda t: (-t[0], t[1]))[:3]
    got = {}
    for r in out:
        got.setdefault(r["source"], []).append(
            (r["sample_rank"], r["doc_id"], r["priority"])
        )
    for src, exp in expect.items():
        g = sorted(got[src])
        assert [d for _, d, _ in g] == [d for _, d in exp], src
        for (_, _, p_spark), (p_py, _) in zip(g, exp):
            assert p_spark == p_py  # bit-identical doubles
