"""Generate the committed .jsonl.zst fixture shards for
``q_jsonl_zst_ingest`` (data/jsonl_zst/docs-*.jsonl.zst).

Zstandard JSONL is the other dominant web-corpus shard transport
beside gzip (FineWeb / RedPajama dumps ship as many .jsonl.zst
shards).  Python in this container has no zstd module, but DuckDB
does: raw lines — INCLUDING the two deliberately malformed lines per
shard that pin PERMISSIVE-mode tolerance — are written verbatim
through CSV COPY with quoting/escaping disabled and a delimiter byte
that never occurs in the payload, compressed with ZSTD.

Deterministic: re-running produces the same logical line content
(zstd frames may differ byte-for-byte across duckdb versions, which
is fine — the query pins decompressed content, not frame bytes).
"""
from __future__ import annotations

import json
import os

import duckdb

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "jsonl_zst")

LANGS = ["en", "de", "fr", "es"]


def shard_lines(s: int) -> list[str]:
    lines = []
    for k in range(6):
        doc_id = 6 * s + k
        pad = "pad " * (doc_id % 5)
        lines.append(
            json.dumps(
                {
                    "doc_id": doc_id,
                    "lang": LANGS[doc_id % 4],
                    "text": f"shard {s} document {doc_id} body {pad}",
                }
            )
        )
    # two malformed lines, two failure modes (truncated / non-JSON)
    lines.append('{"doc_id": 999, "lang": "xx"  TRUNCATED')
    lines.append("not json at all")
    return lines


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    con = duckdb.connect()
    for s in range(3):
        con.execute("CREATE OR REPLACE TABLE t(line VARCHAR)")
        con.executemany(
            "INSERT INTO t VALUES (?)", [(l,) for l in shard_lines(s)]
        )
        path = os.path.join(OUT_DIR, f"docs-{s:02d}.jsonl.zst")
        con.execute(
            f"COPY t TO '{path}' (FORMAT CSV, COMPRESSION ZSTD, "
            "HEADER false, QUOTE '', ESCAPE '', DELIMITER '\x01')"
        )
        print(path, os.path.getsize(path))


if __name__ == "__main__":
    main()
