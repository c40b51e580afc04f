"""Brute-force pins for the suffix-array longest-repeated-substring:
an O(n^2) pure-Python LRS over every fixture doc must agree with the
distributed prefix-doubling + LCP-walk result exactly (length AND the
lexicographically-smallest witness).
"""

from __future__ import annotations

import pandas as pd

from artis_data_ingest_spark import plans
from artis_data_ingest_spark.plans.suffix import suffix_rank_levels
from artis_data_ingest_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _brute_lrs(s: str) -> tuple[int, str]:
    n = len(s)
    # longest common extension between every suffix pair, O(n^2) via
    # the DP lce[i][j] = (s[i]==s[j]) * (1 + lce[i+1][j+1])
    best_len = 0
    lce_next = [0] * (n + 2)
    lce = [0] * (n + 2)
    for i in range(n - 1, -1, -1):
        for j in range(n - 1, i, -1):
            lce[j] = 1 + lce_next[j + 1] if s[i] == s[j] else 0
            if lce[j] > best_len:
                best_len = lce[j]
        lce_next, lce = lce, [0] * (n + 2)
    if best_len == 0:
        return 0, ""
    # smallest witness of that length
    seen: dict[str, int] = {}
    cands = []
    for i in range(n - best_len + 1):
        sub = s[i : i + best_len]
        if sub in seen:
            cands.append(sub)
        else:
            seen[sub] = i
    return best_len, min(cands)


def test_lrs_matches_bruteforce(spark):
    out = (
        plans.queries()["q_longest_repeat"](spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    assert len(out) == len(docs)
    for _, d in docs.head(120).iterrows():
        want_len, want_sub = _brute_lrs(d["text"])
        row = out.loc[d["doc_id"]]
        assert int(row["lrs_len"]) == want_len, d["doc_id"]
        assert row["lrs"] == want_sub, d["doc_id"]


def test_suffix_array_ranks_are_the_sorted_suffix_order(spark):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .limit(30)
    )
    top = suffix_rank_levels(docs)[-1].toPandas()
    texts = {
        r.doc_id: r.text
        for r in docs.collect()
    }
    for doc_id, grp in top.groupby("doc_id"):
        s = texts[doc_id]
        order = grp.sort_values("r")["pos"].tolist()
        # unique ranks, and rank order == lexicographic suffix order
        assert grp["r"].is_unique
        suffixes = [s[p:] for p in order]
        assert suffixes == sorted(suffixes)


def test_cross_doc_repeat_matches_bruteforce(spark):
    out = plans.queries()["q_cross_doc_repeat"](spark, SF_DIR).collect()[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    s0 = docs[docs.source == "src0"].sort_values("doc_id")
    texts = list(s0["text"])
    assert out["n_docs"] == len(texts)
    assert out["n_chars"] == sum(len(t) for t in texts)

    def lcs_len(a: str, b: str) -> int:
        prev = [0] * (len(b) + 1)
        best = 0
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            ai = a[i - 1]
            for j in range(1, len(b) + 1):
                if ai == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    import itertools

    want = max(
        lcs_len(a, b) for a, b in itertools.combinations(texts, 2)
    )
    assert out["lcs_len"] == want
    assert len(out["lcs"]) == want
    # the witness really does occur in >= 2 distinct docs
    holders = [t for t in texts if out["lcs"] in t]
    assert len(holders) >= 2


def test_sa_lrs_matches_bruteforce_random_and_edges():
    import random

    from artis_data_ingest_spark.plans.suffix import _sa_lrs

    rnd = random.Random(11)
    cases = ["", "x", "aa", "ab", "a" * 257, "abcabcabc", "x y x y "]
    cases += [
        "".join(rnd.choice("abc ") for _ in range(rnd.randint(0, 80)))
        for _ in range(150)
    ]
    for s in cases:
        assert _sa_lrs(s) == _brute_lrs(s), repr(s)


def test_fast_and_doubling_lrs_agree(spark):
    fast = (
        plans.queries()["q_longest_repeat"](spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    slow = (
        plans.queries()["q_longest_repeat_doubling"](spark, SF_DIR)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert fast.equals(slow)


def test_longest_repeat_long_covers_docs_past_the_old_cap(spark):
    out = plans.queries()["q_longest_repeat_long"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet("/root/repo/data/longdocs/docs.parquet")
    assert len(out) == len(docs)
    long_docs = docs[docs["text"].str.len() > 1024]
    assert len(long_docs) >= 20  # the fixture's point: past the r8 cap
    by_id = out.set_index("doc_id")
    # planted repeats are 40-400 chars: every planted doc must report a
    # repeat at least that long; spot-pin 6 docs against brute force
    for _, d in long_docs.head(6).iterrows():
        want_len, want_sub = _brute_lrs(d["text"])
        row = by_id.loc[d["doc_id"]]
        assert int(row["lrs_len"]) == want_len
        assert row["lrs"] == want_sub
    # edge docs: empty, single char, all-same-char
    assert int(by_id.loc[24]["lrs_len"]) == 0 and by_id.loc[24]["lrs"] == ""
    assert int(by_id.loc[25]["lrs_len"]) == 0
    assert int(by_id.loc[26]["lrs_len"]) == 2047
    assert by_id.loc[26]["lrs"] == "a" * 2047
