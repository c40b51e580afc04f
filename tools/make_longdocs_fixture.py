#!/usr/bin/env python
"""Regenerate the committed long-document LRS fixture
(data/longdocs/docs.parquet) from a seeded deterministic generator —
so the committed bytes are reproducible from the repo alone
(the tools/make_excel_fixtures.py / make_pdf_docx_fixtures.py
discipline).

Shape consumed by q_longest_repeat_long (plans/suffix.py) and
tests/test_scale_ops.py:
  * docs 0..23: 1.2k–8.8k chars of seeded word-ish soup with a
    PLANTED repeat (40–400 chars, inserted twice at seeded
    positions) — most docs exceed the r8 1024-char cap, which is the
    fixture's point;
  * doc 24: empty string (lrs_len 0);
  * doc 25: single char (lrs_len 0);
  * doc 26: "a" * 2048 (all-same-char: lrs_len 2047).
The oracle and the brute-force test both recompute the ground truth
from the parquet itself, so the exact random content is free — only
the id/edge contract and length band are pinned.

The content is reproducible from the repo alone; --check compares
LOGICAL content (read both parquets, compare frames) rather than raw
bytes, because pyarrow embeds its own version in the file's
created_by metadata and encoding defaults drift across releases — a
byte compare would report spurious MISMATCH on any other pyarrow.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET = os.path.join(REPO, "data", "longdocs", "docs.parquet")

_ALPHABET = np.array(list("abcdefghijklmnopqrstuvwxyz ,."))
_SEED = 20260815


def _soup(rng: np.random.Generator, n: int) -> str:
    return "".join(rng.choice(_ALPHABET, size=n))


def build_docs() -> pd.DataFrame:
    rng = np.random.default_rng(_SEED)
    rows = []
    for i in range(24):
        total = int(1200 + (8800 - 1200) * (i / 23.0) ** 1.2)
        rep_len = 40 + 15 * i  # 40..385: the planted repeat
        repeat = _soup(rng, rep_len)
        body_len = max(0, total - 2 * rep_len)
        body = _soup(rng, body_len)
        # insert the repeat twice at seeded, non-overlapping cuts
        cut1, cut2 = sorted(rng.integers(0, body_len + 1, size=2))
        text = (
            body[:cut1] + repeat + body[cut1:cut2] + repeat + body[cut2:]
        )
        rows.append((i, text))
    rows.append((24, ""))
    rows.append((25, "x"))
    rows.append((26, "a" * 2048))
    return pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64", "text": "object"}
    )


def main(check_only: bool) -> int:
    df = build_docs()
    if check_only:
        committed = pd.read_parquet(TARGET, engine="pyarrow")
        if committed.reset_index(drop=True).equals(df):
            print(f"OK        {os.path.relpath(TARGET, REPO)}")
            return 0
        print(f"MISMATCH  {os.path.relpath(TARGET, REPO)}")
        return 1
    os.makedirs(os.path.dirname(TARGET), exist_ok=True)
    df.to_parquet(
        TARGET, engine="pyarrow", compression="snappy", index=False
    )
    print(f"wrote     {os.path.relpath(TARGET, REPO)} "
          f"({len(df)} docs, max {df['text'].str.len().max()} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main(check_only="--check" in sys.argv))
