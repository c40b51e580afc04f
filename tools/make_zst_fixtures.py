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


def main(check_only: bool = False) -> int:
    import tempfile

    os.makedirs(OUT_DIR, exist_ok=True)
    con = duckdb.connect()
    failures = []
    for s in range(3):
        con.execute("CREATE OR REPLACE TABLE t(line VARCHAR)")
        con.executemany(
            "INSERT INTO t VALUES (?)", [(l,) for l in shard_lines(s)]
        )
        target = os.path.join(OUT_DIR, f"docs-{s:02d}.jsonl.zst")
        with tempfile.TemporaryDirectory() as d:
            tmp = os.path.join(d, "out.zst")
            con.execute(
                f"COPY t TO '{tmp}' (FORMAT CSV, COMPRESSION ZSTD, "
                "HEADER false, QUOTE '', ESCAPE '', DELIMITER '\x01')"
            )
            fresh = open(tmp, "rb").read()
        if check_only:
            committed = open(target, "rb").read()
            # zstd frames can embed content checksums only; DuckDB's
            # COPY is deterministic for a fixed duckdb version — but
            # compare DECOMPRESSED content so the check also holds
            # across compressor-version drift
            import io
            try:
                import zstandard  # noqa: F401 - not in this container
                same = committed == fresh
            except ImportError:
                same = committed == fresh or _decomp_eq(committed, fresh)
            status = "OK" if same else "MISMATCH"
            if status == "MISMATCH":
                failures.append(target)
            print(f"{status:9s} {os.path.relpath(target)}")
        else:
            with open(target, "wb") as f:
                f.write(fresh)
            print(target, os.path.getsize(target))
    if failures:
        print(f"\n{len(failures)} fixture(s) diverge from the generator")
        return 1
    return 0


def _decomp_eq(a: bytes, b: bytes) -> bool:
    """Logical-content fallback: DuckDB can read its own zst back."""
    con = duckdb.connect()
    import tempfile, os as _os

    vals = []
    with tempfile.TemporaryDirectory() as d:
        for i, blob in enumerate((a, b)):
            p = _os.path.join(d, f"{i}.jsonl.zst")
            open(p, "wb").write(blob)
            vals.append(con.execute(
                f"SELECT * FROM read_csv('{p}', header=false, "
                "delim='\x01', quote='', escape='', "
                "columns={'line':'VARCHAR'})"
            ).fetchall())
    return vals[0] == vals[1]


if __name__ == "__main__":
    import sys

    sys.exit(main(check_only="--check" in sys.argv))
