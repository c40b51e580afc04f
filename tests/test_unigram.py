"""Pin the distributed unigram-LM Viterbi segmentation against a
sequential pure-Python reference (same qlog2 fixed-point recurrence,
same tie order) — independent of both Spark and the DuckDB oracle.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from artis_data_ingest_spark.plans.unigram import (
    _MAX_PIECE,
    _MAX_WORD,
    _MINF_SHIFT,
    segment_vocabulary,
)
from artis_data_ingest_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _qlog2(x: int, B: int = 20, P: int = 28) -> int:
    e = x.bit_length() - 1
    t = (x << P) >> e
    f = 0
    hi = 1 << (2 * P + 1)
    for _ in range(B):
        u = t * t
        b = 1 if u >= hi else 0
        t = u // (1 << (P + 1)) if b else u // (1 << P)
        f = f * 2 + b
    return e * (1 << B) + f


def _reference_segmentation(texts: list[str]) -> dict[str, list[str]]:
    wc: Counter[str] = Counter()
    for t in texts:
        for tok in t.strip().split():
            w = tok.lower()
            if w and len(w) <= _MAX_WORD:
                wc[w] += 1
    pfreq: Counter[str] = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for l in range(1, min(_MAX_PIECE, len(w) - i) + 1):
                pfreq[w[i : i + l]] += c
    tot_all = sum(pfreq.values())
    minf = tot_all >> _MINF_SHIFT
    vocab = {
        p: f for p, f in pfreq.items() if len(p) == 1 or f >= minf
    }
    totalp = sum(vocab.values())
    qtot = _qlog2(totalp)
    es = {p: _qlog2(f) - qtot for p, f in vocab.items()}
    segs: dict[str, list[str]] = {}
    for w in wc:
        # best[j] = (value, np, path); candidate order (value DESC,
        # np ASC, i ASC) — i ASC = longest last piece first on ties
        best: list[tuple[int, int, list[str]] | None] = [None] * (
            len(w) + 1
        )
        best[0] = (0, 0, [])
        for j in range(1, len(w) + 1):
            cands = []
            for i in range(max(0, j - _MAX_PIECE), j):
                piece = w[i:j]
                if piece in vocab and best[i] is not None:
                    v, np_, path = best[i]
                    cands.append((v + es[piece], np_ + 1, i, path + [piece]))
            cands.sort(key=lambda c: (-c[0], c[1], c[2]))
            best[j] = (cands[0][0], cands[0][1], cands[0][3])
        segs[w] = best[len(w)][2]
    return segs


def test_distributed_viterbi_matches_sequential_reference(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    got = segment_vocabulary(docs).toPandas()
    texts = pd.read_parquet(f"{SF_DIR}/documents.parquet")["text"].tolist()
    want = _reference_segmentation(texts)
    assert set(got["word"]) == set(want)
    for _, r in got.iterrows():
        assert r["path"].split(" ") == want[r["word"]], r["word"]
        assert r["np"] == len(want[r["word"]])
    # the segmentation concatenates back to the word — lossless
    for _, r in got.iterrows():
        assert "".join(r["path"].split(" ")) == r["word"]
