"""Value-level pins for the sharding/membership/quantile/MLM batch:
the invariants each operator's doc string promises, checked against
independent references (numpy, brute-force recomputation) rather than
the DuckDB oracle (which tools/check_oracle.py covers separately).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from artis_data_ingest_spark import plans

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hrw(spark):
    return (
        plans.queries()["q_hrw_reshard"](spark, SF_DIR).toPandas()
    )


def test_hrw_moves_only_to_the_new_shard(hrw):
    # Rendezvous guarantee: an 8->9 reshard moves a doc iff shard 8
    # wins its rendezvous — pre-existing shards never receive movers.
    old_shards = hrw[hrw["shard"] < 8]
    assert (old_shards["n_moved"] == 0).all()
    new_shard = hrw[hrw["shard"] == 8]
    assert len(new_shard) == 1
    # every doc landing on the new shard is by definition a mover
    assert int(new_shard["n_moved"].iloc[0]) == int(
        new_shard["n_docs"].iloc[0]
    )


def test_hrw_movement_fraction_near_one_ninth(hrw):
    total = hrw["n_docs"].sum()
    moved = hrw["n_moved"].sum()
    # expected 1/9 ~ 11%; allow generous fixture-size spread
    assert 0.02 < moved / total < 0.25


def test_bloom_has_no_false_negatives(spark):
    out = plans.queries()["q_bloom_membership"](spark, SF_DIR).toPandas()
    member = out[out["kind"] == "member"]
    # every held-out member must come back maybe=true: exactly one
    # member row, and it is the maybe=true one
    assert len(member) == 1
    assert bool(member["bloom_maybe"].iloc[0]) is True
    novel = out[out["kind"] == "novel"]
    n_novel = novel["n_probes"].sum()
    fp = novel[novel["bloom_maybe"]]["n_probes"].sum()
    # FP rate stays in the ballpark the geometry predicts (~3%)
    assert fp / n_novel < 0.25


def test_exact_quantiles_match_numpy_inverted_cdf(spark):
    out = (
        plans.queries()["q_exact_quantiles"](spark, SF_DIR)
        .toPandas()
        .set_index("o_orderpriority")
    )
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (
        np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    )
    prio = orders["o_orderpriority"].to_numpy()
    for p in np.unique(prio):
        vals = cents[prio == p]
        row = out.loc[p]
        assert row["n"] == len(vals)
        for q, col in ((0.25, "p25_cents"), (0.5, "p50_cents"),
                       (0.75, "p75_cents")):
            want = int(
                np.percentile(vals, q * 100, method="inverted_cdf")
            )
            assert int(row[col]) == want, (p, col)


def test_mlm_mask_rates_and_reconstruction(spark):
    out = plans.queries()["q_mlm_mask"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert len(out) == len(docs)
    n_tok = out["n_tokens"].sum()
    n_sel = out["n_selected"].sum()
    # ~15% selection, 80/10/10 split inside the selection
    assert 0.10 < n_sel / n_tok < 0.20
    assert (
        out["n_masked"] + out["n_randomized"] + out["n_kept"]
    ).equals(out["n_selected"])
    assert out["n_masked"].sum() > out["n_randomized"].sum()
    # masked text preserves token count; [MASK] appears exactly
    # n_masked times per doc
    for _, r in out.head(25).iterrows():
        toks = r["masked_text"].split(" ")
        assert len(toks) == r["n_tokens"]
        assert toks.count("[MASK]") == r["n_masked"]
        if r["n_selected"]:
            # target pairs: pos:original, positions strictly increasing
            pairs = [t.split(":", 1) for t in r["target_text"].split(" ")]
            positions = [int(p) for p, _ in pairs]
            assert positions == sorted(set(positions))
            assert len(pairs) == r["n_selected"]


def _soundex_simplified(word: str) -> str:
    m = {c: d for c, d in zip("abcdefghijklmnopqrstuvwxyz",
                              "01230120022455012623010202")}
    ks = [m.get(c, c) for c in word]
    tail = []
    for i, k in enumerate(ks):
        if i > 0 and k != "0" and (i == 0 or k != ks[i - 1]):
            tail.append(k)
    return word[0] + ("".join(tail) + "000")[:3]


def test_soundex_blocking_matches_python_reference(spark):
    # canonical sanity: the simplified variant agrees with standard
    # American Soundex on names without h/w transparency cases
    assert _soundex_simplified("robert") == "r163"
    assert _soundex_simplified("rupert") == "r163"
    assert _soundex_simplified("tymczak") == "t522"
    out = (
        plans.queries()["q_soundex_blocking"](spark, SF_DIR).toPandas()
    )
    parts = pd.read_parquet(f"{SF_DIR}/part.parquet")
    words = parts["p_name"].str.split(" ").str[-1].str.lower()
    ref = (
        words.groupby(words.map(_soundex_simplified))
        .agg(["count"])
    )
    got = out.set_index("soundex_key")["n_parts"]
    assert got.sum() == len(parts)
    for key, row in ref.iterrows():
        assert int(got[key]) == int(row["count"]), key


def test_observe_dq_metrics_single_pass(spark):
    """DQ counters ride the job's own action via DataFrame.observe —
    no second scan. Values must match direct recomputation, and the
    executed plan must contain exactly one file scan."""
    from artis_data_ingest_spark.operators.observe import (
        with_dq_observation,
    )
    from artis_data_ingest_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    observed, obs = with_dq_observation(
        li,
        null_cols=["l_returnflag"],
        nonpos_cols=["l_quantity"],
        distinct_cols=["l_orderkey"],
    )
    from pyspark.sql import functions as F

    # the "real job": an unrelated aggregation over the observed frame
    out = observed.groupBy("l_returnflag").agg(F.count("*"))
    n_groups = out.count()
    got = obs.get
    pdf = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    assert got["n_rows"] == len(pdf)
    assert got["nulls_l_returnflag"] == int(pdf["l_returnflag"].isna().sum())
    assert got["nonpos_l_quantity"] == int((pdf["l_quantity"] <= 0).sum())
    exact = pdf["l_orderkey"].nunique()
    assert abs(got["approx_distinct_l_orderkey"] - exact) / exact < 0.1
    assert n_groups == pdf["l_returnflag"].nunique()
    # single pass: exactly one scan in the executed plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_char_entropy_matches_scipy_free_reference(spark):
    from collections import Counter
    from math import log2

    out = (
        plans.queries()["q_char_entropy"](spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for _, d in docs.head(50).iterrows():
        cnt = Counter(d["text"])
        n = len(d["text"])
        h = log2(n) - sum(c * log2(c) for c in cnt.values()) / n
        row = out.loc[d["doc_id"]]
        assert row["n_chars"] == n
        # fixed-point key within qlog2 quantization of the float truth
        assert abs(row["entropy_bits"] - h) < 1e-4, d["doc_id"]
    assert set(out["bucket"]) <= {"low", "mid", "high"}


def test_partition_profile_counts_every_row(spark):
    from artis_data_ingest_spark.operators.observe import partition_profile
    from artis_data_ingest_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").repartition(7)
    prof = partition_profile(li).toPandas()
    assert prof["n_rows"].sum() == li.count()
    assert len(prof) <= 7
    # round-robin repartition is balanced: no partition 2x the mean
    assert prof["n_rows"].max() <= 2 * prof["n_rows"].mean()


def test_pareto_skyline_is_exactly_the_undominated_set(spark):
    out = plans.queries()["q_pareto_skyline"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li = li.assign(
        cost_cents=np.round(li.l_extendedprice * 100).astype(np.int64),
        qty=li.l_quantity.astype(np.int64),
    )
    for grp, g in li.groupby("l_returnflag"):
        pts = g[["cost_cents", "qty", "l_orderkey", "l_linenumber"]]
        sky = set()
        rows = sorted(
            pts.itertuples(index=False),
            key=lambda r: (r.cost_cents, -r.qty, r.l_orderkey,
                           r.l_linenumber),
        )
        best = None
        for r in rows:
            if best is None or r.qty > best:
                sky.add((r.cost_cents, r.qty, r.l_orderkey,
                         r.l_linenumber))
                best = r.qty if best is None else max(best, r.qty)
        got = {
            (r.cost_cents, r.qty, r.l_orderkey, r.l_linenumber)
            for r in out[out.grp == grp].itertuples(index=False)
        }
        assert got == sky, grp
        # every skyline point is truly undominated
        for c, q, *_ in sky:
            dom = g[(g.cost_cents <= c) & (g.qty >= q)
                    & ((g.cost_cents < c) | (g.qty > q))]
            assert dom.empty


def test_manifest_diff_localizes_exactly_the_edited_shards(spark):
    out = (
        plans.queries()["q_manifest_diff"](spark, SF_DIR)
        .toPandas()
        .set_index("shard")["changed"]
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    edited_shards = set(
        (docs.loc[docs.doc_id % 97 == 42, "doc_id"] // 64).astype(int)
    )
    for shard, changed in out.items():
        assert bool(changed) == (shard in edited_shards), shard


def test_retrieval_metrics_invariants(spark):
    out = plans.queries()["q_retrieval_metrics"](spark, SF_DIR).toPandas()
    assert len(out) == 6
    assert ((out.ndcg >= 0) & (out.ndcg <= 1 + 1e-9)).all()
    for _, r in out.iterrows():
        if pd.notna(r.first_rel_rank):
            assert r.rr_2520 == 2520 // int(r.first_rel_rank)
            assert r.dcg_q20 > 0
        else:
            assert r.rr_2520 == 0 and r.dcg_q20 == 0
        assert r.n_rel <= r.n_matched


def test_label_spread_accounting(spark):
    out = plans.queries()["q_label_spread"](spark, SF_DIR).toPandas()
    assert "<unlabeled>" in set(out.label)
    real = out[out.label != "<unlabeled>"]
    # seeds exist and propagation actually reached unlabeled nodes
    assert real.n_seeds.sum() > 0
    assert real.n_propagated.sum() > 0
