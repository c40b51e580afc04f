"""TFRecord source + sink — the TensorFlow training-data container,
pure stdlib (no tensorflow / google.protobuf in this image).

TFRecord is the classic ML shard format: a flat stream of

  ``uint64 LE length | masked crc32c(length) | data |
  masked crc32c(data)``

records, each ``data`` conventionally a serialized
``tf.train.Example`` protobuf.  Both layers are implemented from
their public specs:

  * CRC-32C (Castagnoli, reflected 0x1EDC6F41) with TensorFlow's
    masking ``((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff``
    — VERIFIED on read for both length and data; a flipped bit
    fails the record loudly (or, with ``permissive=True``, truncates
    at the corruption like TF's own reader option).
  * the ``Example`` message subset every pipeline uses, hand-rolled
    varint wire format: ``Features`` map of name →
    ``BytesList | FloatList | Int64List`` (packed and unpacked
    repeated encodings both accepted on read — writers differ).

Schema mapping (both directions): ``bigint``/``array<bigint>`` ↔
int64_list, ``float``/``array<float>`` ↔ float_list (float32 on the
wire — the format's own precision), ``string``/``binary`` ↔
bytes_list.  The reader takes an explicit Spark schema (TFRecord
files carry none — the caller knows their features, exactly as
TF datasets do).

Scale posture: the sink writes one shard per Spark partition
(foreachPartition, tmp+rename, ``_SUCCESS`` — the tar/WARC/Avro
publish discipline); the reader is a binaryFile scan, one task per
unsplittable shard (TFRecord has no split points — the format's own
limitation, which is why training corpora ship as MANY shards).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class TFRecordError(ValueError):
    """Corrupt framing / unsupported feature encoding."""


def _crc32c_table() -> list[int]:
    poly = 0x82F63B78
    out = []
    for v in range(256):
        crc = v
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        out.append(crc)
    return out


_CRC32C_TABLE = _crc32c_table()


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    tbl = _CRC32C_TABLE
    for b in data:
        crc = (crc >> 8) ^ tbl[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --------------------------------------------------------------------------
# protobuf wire helpers (varint + tag walk) for the Example subset
# --------------------------------------------------------------------------


def _write_varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if pos >= len(data):
            raise TFRecordError("truncated varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _field(out: bytearray, number: int, wire: int) -> None:
    _write_varint(out, (number << 3) | wire)


def _len_delim(out: bytearray, number: int, payload: bytes) -> None:
    _field(out, number, 2)
    _write_varint(out, len(payload))
    out += payload


def _zigzag64(v: int) -> int:
    return v & 0xFFFFFFFFFFFFFFFF  # int64 as two's-complement varint


def encode_example(features: dict) -> bytes:
    """{name: list[int] | list[float] | list[bytes]} → serialized
    tf.train.Example."""
    feats = bytearray()
    for name in sorted(features):
        values = features[name]
        body = bytearray()
        if values and isinstance(values[0], (bytes, bytearray)):
            bl = bytearray()
            for v in values:
                _len_delim(bl, 1, bytes(v))
            _len_delim(body, 1, bytes(bl))  # Feature.bytes_list = 1
        elif values and isinstance(values[0], float):
            fl = bytearray()
            _field(fl, 1, 2)  # FloatList.value, packed
            packed = struct.pack(f"<{len(values)}f", *values)
            _write_varint(fl, len(packed))
            fl += packed
            _len_delim(body, 2, bytes(fl))  # Feature.float_list = 2
        else:
            il = bytearray()
            _field(il, 1, 2)  # Int64List.value, packed
            packed = bytearray()
            for v in values:
                _write_varint(packed, _zigzag64(int(v)))
            _write_varint(il, len(packed))
            il += packed
            _len_delim(body, 3, bytes(il))  # Feature.int64_list = 3
        entry = bytearray()
        _len_delim(entry, 1, name.encode("utf-8"))  # map key
        _len_delim(entry, 2, bytes(body))           # map value
        _len_delim(feats, 1, bytes(entry))  # Features.feature entry
    out = bytearray()
    _len_delim(out, 1, bytes(feats))  # Example.features = 1
    return bytes(out)


def _walk_fields(data: bytes):
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        number, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(data, pos)
            yield number, wire, v
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise TFRecordError("truncated length-delimited field")
            yield number, wire, data[pos:pos + ln]
            pos += ln
        elif wire == 5:
            if pos + 4 > len(data):
                raise TFRecordError("truncated fixed32 field")
            yield number, wire, data[pos:pos + 4]
            pos += 4
        elif wire == 1:
            if pos + 8 > len(data):
                raise TFRecordError("truncated fixed64 field")
            yield number, wire, data[pos:pos + 8]
            pos += 8
        else:
            raise TFRecordError(f"unsupported wire type {wire}")


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >> 63 else v


def decode_example(data: bytes) -> dict:
    """Serialized tf.train.Example → {name: list of int/float/bytes}.
    Packed and unpacked repeated encodings both accepted."""
    out: dict = {}
    for num, wire, feats in _walk_fields(data):
        if num != 1 or wire != 2:
            continue  # Example.features
        for fnum, fwire, entry in _walk_fields(feats):
            if fnum != 1 or fwire != 2:
                continue  # map entry
            name, feature = None, b""
            for enum_, ewire, ev in _walk_fields(entry):
                if enum_ == 1 and ewire == 2:
                    name = ev.decode("utf-8")
                elif enum_ == 2 and ewire == 2:
                    feature = ev
            if name is None:
                raise TFRecordError("feature map entry without key")
            values: list = []
            for lnum, lwire, lv in _walk_fields(feature):
                if lwire != 2:
                    raise TFRecordError(
                        f"feature list field with wire {lwire}"
                    )
                if lnum == 1:  # BytesList
                    for vn, vw, vv in _walk_fields(lv):
                        if vn == 1 and vw == 2:
                            values.append(bytes(vv))
                elif lnum == 2:  # FloatList
                    for vn, vw, vv in _walk_fields(lv):
                        if vn != 1:
                            continue
                        if vw == 2:  # packed
                            values.extend(
                                struct.unpack(f"<{len(vv) // 4}f", vv)
                            )
                        elif vw == 5:
                            values.append(
                                struct.unpack("<f", vv)[0]
                            )
                elif lnum == 3:  # Int64List
                    for vn, vw, vv in _walk_fields(lv):
                        if vn != 1:
                            continue
                        if vw == 2:  # packed
                            p = 0
                            while p < len(vv):
                                raw, p = _read_varint(vv, p)
                                values.append(_to_i64(raw))
                        elif vw == 0:
                            values.append(_to_i64(vv))
                else:
                    raise TFRecordError(
                        f"unknown feature kind {lnum}"
                    )
            out[name] = values
    return out


# --------------------------------------------------------------------------
# record framing
# --------------------------------------------------------------------------


def frame_records(records: list[bytes]) -> bytes:
    out = bytearray()
    for data in records:
        ln = struct.pack("<Q", len(data))
        out += ln
        out += struct.pack("<I", _masked_crc(ln))
        out += data
        out += struct.pack("<I", _masked_crc(data))
    return bytes(out)


def unframe_records(blob: bytes, permissive: bool = False):
    """→ iterator of record payloads, CRC-verified.  ``permissive``
    stops at the first corruption (TF's own tolerant-read option)
    instead of raising."""
    pos = 0
    while pos < len(blob):
        try:
            if pos + 12 > len(blob):
                raise TFRecordError("truncated record header")
            (ln,) = struct.unpack_from("<Q", blob, pos)
            (lcrc,) = struct.unpack_from("<I", blob, pos + 8)
            if _masked_crc(blob[pos:pos + 8]) != lcrc:
                raise TFRecordError("length CRC mismatch")
            start = pos + 12
            end = start + ln
            if end + 4 > len(blob):
                raise TFRecordError("truncated record body")
            data = blob[start:end]
            (dcrc,) = struct.unpack_from("<I", blob, end)
            if _masked_crc(data) != dcrc:
                raise TFRecordError("data CRC mismatch")
        except TFRecordError:
            if permissive:
                return
            raise
        yield data
        pos = end + 4


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

_INT_T = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)


def _feature_kind(dt: T.DataType) -> str:
    if isinstance(dt, _INT_T):
        return "int64"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, (T.StringType, T.BinaryType)):
        return "bytes"
    if isinstance(dt, T.ArrayType):
        inner = _feature_kind(dt.elementType)
        if inner in ("int64", "float"):
            return inner + "s"
    raise TFRecordError(
        f"no TFRecord feature mapping for type {dt.simpleString()!r}"
    )


def write_tfrecords(df: DataFrame, out_dir: str) -> int:
    """One ``part-NNNNN.tfrecord`` shard per Spark partition, each
    row one tf.train.Example; atomic rename + ``_SUCCESS``.  Returns
    the shard count.  float/double columns travel as float32 (the
    format's wire precision — cast upstream if that matters)."""
    fields = [(f.name, _feature_kind(f.dataType))
              for f in df.schema.fields]
    os.makedirs(out_dir, exist_ok=True)

    def _write(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs = []
        for r in rows:
            feats = {}
            for name, kind in fields:
                v = r[name]
                if v is None:
                    feats[name] = []
                elif kind == "int64":
                    feats[name] = [int(v)]
                elif kind == "float":
                    feats[name] = [float(v)]
                elif kind == "bytes":
                    feats[name] = [
                        v.encode("utf-8") if isinstance(v, str)
                        else bytes(v)
                    ]
                elif kind == "int64s":
                    feats[name] = [int(x) for x in v]
                else:  # floats
                    feats[name] = [float(x) for x in v]
            recs.append(encode_example(feats))
        if not recs:
            return
        tmp = os.path.join(out_dir, f"_tmp-part-{pid:05d}.tfrecord")
        with open(tmp, "wb") as fh:
            fh.write(frame_records(recs))
        os.replace(
            tmp, os.path.join(out_dir, f"part-{pid:05d}.tfrecord")
        )

    df.foreachPartition(_write)
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass
    return len([
        f for f in os.listdir(out_dir) if f.endswith(".tfrecord")
    ])


def read_tfrecords(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    glob: str = "*.tfrecord",
    permissive: bool = False,
) -> DataFrame:
    """TFRecord shards under ``path`` → DataFrame under the caller's
    ``schema`` (the format carries none).  Scalar columns take the
    feature's first value (null when absent/empty); array columns
    take the whole list.  CRCs verified per record."""
    import pandas as pd

    fields = [
        (f.name, _feature_kind(f.dataType),
         isinstance(f.dataType, T.StringType))
        for f in schema.fields
    ]

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )

    def _parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in unframe_records(
                    bytes(content), permissive=permissive
                ):
                    ex = decode_example(rec)
                    row = []
                    for name, kind, as_str in fields:
                        vals = ex.get(name) or []
                        if kind in ("int64s", "floats"):
                            row.append(list(vals))
                        elif not vals:
                            row.append(None)
                        elif kind == "bytes":
                            b = vals[0]
                            row.append(
                                b.decode("utf-8") if as_str else
                                bytes(b)
                            )
                        else:
                            row.append(vals[0])
                    rows.append(tuple(row))
            yield pd.DataFrame(
                rows, columns=[n for n, _, _ in fields]
            )

    return files.mapInPandas(_parse, schema)
