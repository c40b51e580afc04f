"""Hudi merge-on-read LOG FILE codec (the delta half of sources/hudi.py).

Merge-on-read file groups pair a parquet BASE file with ``.log``
delta files holding row upserts/deletes that readers merge in at
query time; compaction later folds them into a new base slice.  The
public layout (hudi.apache.org/docs/ + the HoodieLogFormat code of
the Apache Hudi repo) frames every log block as:

  ``#HUDI#`` magic (6 bytes)
  | int64 BE total block length (from the version field to the end)
  | int32 BE log format version (1)
  | int32 BE block type (enum ordinal: 0 command, 1 delete,
    2 corrupt, 3 Avro data, ... — the HoodieLogBlockType order)
  | header map: int32 BE entry count, then per entry int32 BE
    metadata-type ordinal (0 = INSTANT_TIME, 2 = SCHEMA, ...),
    int32 BE byte length, UTF-8 value
  | int64 BE content length | content bytes
  | footer map (same encoding, usually empty)
  | int64 BE total block length again (enables reverse traversal)

Log file names are dot-hidden:
``.{fileId}_{baseInstant}.log.{version}_{writeToken}`` — the
``baseInstant`` ties the deltas to the base slice they amend.

DOCUMENTED SIMPLIFICATION: inside a real AVRO_DATA_BLOCK Hudi stores
a format version, a record count, and length-prefixed BARE Avro
datums whose writer schema rides the block's SCHEMA header; this
codec stores an Avro **Object Container File** (sources/avro_ocf.py)
as the block content instead — self-describing, byte-level Avro
identical, container framing different.  Delete blocks likewise
carry an OCF of ``{record_key}`` rows rather than Hudi's
kryo-serialized HoodieKey array.  The BLOCK framing, naming, instant
gating, and merge semantics follow the public spec; a table written
by a real Hudi writer will fail loudly at the OCF magic check, never
silently mis-merge.

Scale posture: block decode is streamed per file and runs INSIDE
executors (sources/hudi.py maps it over a binaryFile scan — one task
per log file); nothing here touches the driver.
"""

from __future__ import annotations

import struct

MAGIC = b"#HUDI#"
FORMAT_VERSION = 1

# HoodieLogBlockType enum order (public Hudi source)
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3

# HoodieLogBlock.HeaderMetadataType ordinals
INSTANT_TIME = 0
TARGET_INSTANT_TIME = 1
SCHEMA = 2


class HudiLogError(ValueError):
    """Log file violates the framing this codec implements."""


def _encode_map(m: dict[int, str]) -> bytes:
    out = [struct.pack(">i", len(m))]
    for k, v in sorted(m.items()):
        vb = v.encode("utf-8")
        out.append(struct.pack(">i", k))
        out.append(struct.pack(">i", len(vb)))
        out.append(vb)
    return b"".join(out)


def _decode_map(buf: bytes, pos: int) -> tuple[dict[int, str], int]:
    (n,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    out: dict[int, str] = {}
    for _ in range(n):
        k, ln = struct.unpack_from(">ii", buf, pos)
        pos += 8
        out[k] = buf[pos:pos + ln].decode("utf-8")
        pos += ln
    return out, pos


def encode_block(block_type: int, headers: dict[int, str],
                 content: bytes) -> bytes:
    """One framed log block."""
    hdr = _encode_map(headers)
    ftr = _encode_map({})
    body = (
        struct.pack(">i", FORMAT_VERSION)
        + struct.pack(">i", block_type)
        + hdr
        + struct.pack(">q", len(content))
        + content
        + ftr
    )
    total = len(body) + 8  # + the trailing length field
    return MAGIC + struct.pack(">q", total) + body + struct.pack(
        ">q", total
    )


def decode_blocks(data: bytes) -> list[dict]:
    """Log file bytes → [{type, headers, content}] in write order."""
    pos, out = 0, []
    while pos < len(data):
        if data[pos:pos + 6] != MAGIC:
            raise HudiLogError(
                f"bad log block magic at offset {pos}"
            )
        pos += 6
        (total,) = struct.unpack_from(">q", data, pos)
        pos += 8
        start = pos
        version, btype = struct.unpack_from(">ii", data, pos)
        if version != FORMAT_VERSION:
            raise HudiLogError(
                f"log format version {version} not supported"
            )
        pos += 8
        headers, pos = _decode_map(data, pos)
        (clen,) = struct.unpack_from(">q", data, pos)
        pos += 8
        content = data[pos:pos + clen]
        pos += clen
        _footer, pos = _decode_map(data, pos)
        (total2,) = struct.unpack_from(">q", data, pos)
        pos += 8
        if total2 != total or pos - start != total:
            raise HudiLogError(
                f"log block length mismatch at offset {start}"
            )
        out.append({"type": btype, "headers": headers,
                    "content": content})
    return out


def log_records(data: bytes, committed: set[str],
                ceiling: str) -> list[tuple[str, int, bool, dict]]:
    """Decode one log file → [(instant, seq, is_delete, record)],
    keeping only blocks whose INSTANT_TIME header names a COMPLETED
    instant ≤ ``ceiling`` (uncommitted/future blocks are invisible,
    the same torn-write rule as base slices).  Delete-block rows are
    ``{_hoodie_record_key}``; data-block rows are full records."""
    from .avro_ocf import decode_ocf

    out: list[tuple[str, int, bool, dict]] = []
    for seq, blk in enumerate(decode_blocks(data)):
        instant = blk["headers"].get(INSTANT_TIME)
        if instant is None:
            raise HudiLogError("log block lacks INSTANT_TIME header")
        if instant not in committed or instant > ceiling:
            continue
        if blk["type"] == AVRO_DATA_BLOCK:
            _, rows = decode_ocf(blk["content"])
            for r in rows:
                out.append((instant, seq, False, r))
        elif blk["type"] == DELETE_BLOCK:
            _, rows = decode_ocf(blk["content"])
            for r in rows:
                out.append((instant, seq, True, r))
        elif blk["type"] in (COMMAND_BLOCK, CORRUPT_BLOCK):
            continue
        else:
            raise HudiLogError(
                f"unsupported log block type {blk['type']}"
            )
    return out


def write_log_file(path: str, blocks: list[tuple]) -> None:
    """Author a log file for fixtures/tests: ``blocks`` is a list of
    ``("data", instant, rows, spark_schema)`` or
    ``("delete", instant, [record_keys])`` tuples."""
    from pyspark.sql import types as T

    from .avro_ocf import encode_ocf

    key_t = T.StructType([
        T.StructField("_hoodie_record_key", T.StringType(), False),
    ])
    out = bytearray()
    for blk in blocks:
        kind, instant = blk[0], str(blk[1])
        if kind == "data":
            content = encode_ocf(blk[2], blk[3])
            out += encode_block(
                AVRO_DATA_BLOCK, {INSTANT_TIME: instant}, content
            )
        elif kind == "delete":
            rows = [{"_hoodie_record_key": k} for k in blk[2]]
            content = encode_ocf(rows, key_t)
            out += encode_block(
                DELETE_BLOCK, {INSTANT_TIME: instant}, content
            )
        else:
            raise ValueError(f"unknown block kind {kind!r}")
    with open(path, "wb") as fh:
        fh.write(bytes(out))
