"""WARC web-archive sink + source (ISO 28500 — the Common Crawl
native format; SURVEY.md §2.11 r8).

Every large-scale web corpus starts life as WARC: Common Crawl ships
~100 TB per crawl as ``*.warc.gz`` shards where EACH RECORD IS ITS OWN
GZIP MEMBER (the CC convention — a reader can seek to a record offset
and inflate just that member; concatenated members are still one valid
gzip stream for naive readers).  An engine claiming 100 TB ingest needs
to speak it natively.

Spark mapping (the WebDataset sink's proven shape):
  * write — docs get a deterministic ``shard = doc_id floordiv
    docs_per_shard``, one ``repartition`` on shard co-locates rows,
    and ``foreachPartition`` streams one ``shard-NNNNN.warc.gz`` per
    shard: a ``warcinfo`` head record then one ``response`` record per
    doc (HTTP/1.1 wrapper, UTF-8 body), each record an mtime-0 gzip
    member — byte-deterministic output.  ``_tmp-`` + atomic rename per
    shard, driver stamps ``_SUCCESS`` last.
  * read — ``binaryFile`` scan of ``*.warc.gz`` (one row per shard:
    the unsplittable-gzip unit of parallelism, same story as the
    jsonl.gz source) → Arrow-batched ``mapInPandas`` walks gzip
    members, parses WARC headers + the HTTP wrapper, and emits one row
    per response record; non-response records (warcinfo, request,
    metadata) are counted, not surfaced.

Determinism: WARC-Date is pinned to the epoch constant below and
WARC-Record-ID is a URN derived from doc_id, so two writes are
byte-identical — the same zeroed-metadata policy as the tar sink.

At 100 TB nothing is driver-bound: shard count scales both directions
and each task holds one shard.
"""

from __future__ import annotations

import gzip
import io
import os
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_DATE = "2026-01-01T00:00:00Z"  # pinned: determinism over wall time

WARC_DOC_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _gzip_member(payload: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(payload)
    return buf.getvalue()


def _record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (
        f"WARC/1.0\r\n{head}Content-Length: {len(block)}\r\n\r\n"
    ).encode() + block + b"\r\n\r\n"


def write_warc(
    docs: DataFrame, out_dir: str, docs_per_shard: int = 100
) -> int:
    """Write ``(doc_id, text, lang, source)`` rows as Common-Crawl-
    style ``shard-NNNNN.warc.gz`` files under ``out_dir``; returns the
    shard count.  Each shard: one warcinfo record + one HTTP response
    record per doc, every record its own mtime-0 gzip member —
    byte-deterministic (see module docstring)."""
    n = int(docs_per_shard)
    shard_col = F.expr(
        f"(doc_id div {n}) - CASE WHEN doc_id % {n} < 0 THEN 1 ELSE 0 END"
    ).cast("bigint")
    prepared = docs.select(
        shard_col.alias("shard"), "doc_id", "text", "lang", "source"
    ).repartition("shard")
    os.makedirs(out_dir, exist_ok=True)
    n_shards = prepared.select("shard").distinct().count()

    def _write(rows) -> None:
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(int(r["shard"]), []).append(r)
        for shard, members in by_shard.items():
            fname = f"shard-{shard:05d}.warc.gz"
            out = bytearray()
            info_block = (
                f"software: artis-data-ingest-spark\r\n"
                f"format: WARC File Format 1.0\r\n"
                f"warc-shard: {fname}\r\n"
            ).encode()
            out += _gzip_member(
                _record(
                    [
                        ("WARC-Type", "warcinfo"),
                        ("WARC-Date", WARC_DATE),
                        ("WARC-Record-ID",
                         f"<urn:corpus:warcinfo:{shard}>"),
                        ("WARC-Filename", fname),
                        ("Content-Type", "application/warc-fields"),
                    ],
                    info_block,
                )
            )
            for r in sorted(members, key=lambda x: int(x["doc_id"])):
                body = (r["text"] or "").encode()
                http = (
                    "HTTP/1.1 200 OK\r\n"
                    "Content-Type: text/plain; charset=utf-8\r\n"
                    f"X-Corpus-Lang: {r['lang']}\r\n"
                    f"X-Corpus-Source: {r['source']}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode() + body
                out += _gzip_member(
                    _record(
                        [
                            ("WARC-Type", "response"),
                            ("WARC-Date", WARC_DATE),
                            ("WARC-Record-ID",
                             f"<urn:corpus:doc:{int(r['doc_id'])}>"),
                            ("WARC-Target-URI",
                             f"https://corpus.example/{r['source']}"
                             f"/{int(r['doc_id'])}"),
                            ("Content-Type",
                             "application/http; msgtype=response"),
                        ],
                        http,
                    )
                )
            final = os.path.join(out_dir, fname)
            tmp = os.path.join(out_dir, f"_tmp-{fname}")
            with open(tmp, "wb") as f:
                f.write(bytes(out))
            os.replace(tmp, final)  # atomic: no torn shard visible

    prepared.foreachPartition(_write)
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass
    return n_shards


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Walk concatenated gzip members explicitly (the CC layout)."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(blob[pos:])
        yield out
        rest = d.unused_data
        if not rest:
            break
        pos = len(blob) - len(rest)


def _parse_record(raw: bytes) -> dict | None:
    """One WARC record (header block + content block) -> field dict,
    or None if malformed.  The HTTP wrapper of response records is
    parsed one level deeper (status + headers + body)."""
    sep = raw.find(b"\r\n\r\n")
    if sep < 0 or not raw.startswith(b"WARC/"):
        return None
    fields: dict[str, str] = {}
    for line in raw[:sep].decode("utf-8", "replace").split("\r\n")[1:]:
        k, _, v = line.partition(":")
        if _:
            fields[k.strip().lower()] = v.strip()
    try:
        clen = int(fields.get("content-length", ""))
    except ValueError:
        return None
    block = raw[sep + 4:sep + 4 + clen]
    rec = {
        "warc_type": fields.get("warc-type"),
        "target_uri": fields.get("warc-target-uri"),
        "record_id": fields.get("warc-record-id"),
        "content_type": fields.get("content-type"),
        "http_status": None,
        "lang": None,
        "text": None,
    }
    if rec["warc_type"] == "response" and block.startswith(b"HTTP/"):
        hsep = block.find(b"\r\n\r\n")
        if hsep >= 0:
            hlines = block[:hsep].decode("utf-8", "replace").split("\r\n")
            try:
                rec["http_status"] = int(hlines[0].split(" ")[1])
            except (IndexError, ValueError):
                pass
            hh = {}
            for line in hlines[1:]:
                k, _, v = line.partition(":")
                if _:
                    hh[k.strip().lower()] = v.strip()
            rec["lang"] = hh.get("x-corpus-lang")
            rec["content_type"] = hh.get(
                "content-type", rec["content_type"]
            )
            rec["text"] = block[hsep + 4:].decode("utf-8", "replace")
    return rec


def read_warc(spark: SparkSession, in_dir: str) -> DataFrame:
    """One row per WARC *response* record from a directory of
    ``*.warc.gz`` shards: binaryFile scan (one task per shard) →
    explicit gzip-member walk → WARC + HTTP header parse.  Corrupt
    members/records are skipped (the PERMISSIVE policy every 100 TB
    crawl read needs), and non-response records never surface."""
    shards = spark.read.format("binaryFile").load(
        os.path.join(in_dir, "*.warc.gz")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                shard = path.rsplit("/", 1)[-1]
                try:
                    members = list(_gzip_members(bytes(blob)))
                except (zlib.error, OSError):
                    continue
                for raw in members:
                    try:
                        rec = _parse_record(raw)
                    except Exception:
                        rec = None
                    if rec is None or rec["warc_type"] != "response":
                        continue
                    recs.append(
                        (
                            shard, rec["warc_type"], rec["target_uri"],
                            rec["record_id"], rec["http_status"],
                            rec["content_type"], rec["lang"],
                            rec["text"],
                        )
                    )
            yield pd.DataFrame(
                recs, columns=[f.name for f in WARC_DOC_SCHEMA.fields]
            )

    return shards.mapInPandas(_parse, WARC_DOC_SCHEMA)
