"""TFRecord source/sink (sources/tfrecord.py)."""

from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import types as T

from artis_data_ingest_spark.sources.tfrecord import (
    TFRecordError,
    _masked_crc,
    decode_example,
    encode_example,
    frame_records,
    read_tfrecords,
    unframe_records,
    write_tfrecords,
)


def test_crc32c_known_vectors():
    # public CRC-32C check values (RFC 3720 appendix / kernel tests)
    from artis_data_ingest_spark.sources.tfrecord import _crc32c

    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_example_codec_roundtrip():
    feats = {
        "ids": [1, -2, 3_000_000_000],
        "score": [1.5, -0.25],
        "name": [b"hello"],
    }
    blob = encode_example(feats)
    back = decode_example(blob)
    assert back["ids"] == [1, -2, 3_000_000_000]
    assert back["score"] == [1.5, -0.25]
    assert back["name"] == [b"hello"]


def test_example_unpacked_repeated_accepted():
    # hand-build an Int64List with UNPACKED varints (wire 0) — some
    # writers emit this; the reader must accept both
    body = bytearray()
    il = bytearray()
    for v in (7, 9):
        il += bytes([0x08])  # field 1, wire 0
        il += bytes([v])
    feat = bytearray()
    feat += bytes([0x1A, len(il)]) + il  # Feature.int64_list = 3
    entry = bytearray()
    entry += bytes([0x0A, 1]) + b"x"     # key
    entry += bytes([0x12, len(feat)]) + feat
    feats = bytes([0x0A, len(entry)]) + entry
    ex = bytes([0x0A, len(feats)]) + feats
    assert decode_example(ex)["x"] == [7, 9]


def test_framing_crc_verified():
    blob = frame_records([b"abc", b"defg"])
    assert [bytes(r) for r in unframe_records(blob)] == [b"abc",
                                                         b"defg"]
    # flip one data byte: strict raises, permissive truncates
    bad = bytearray(blob)
    bad[12] ^= 0xFF
    with pytest.raises(TFRecordError, match="CRC"):
        list(unframe_records(bytes(bad)))
    assert list(unframe_records(bytes(bad), permissive=True)) == []
    # corrupt only the SECOND record: permissive yields the first
    bad2 = bytearray(blob)
    bad2[-1] ^= 0xFF
    got = [bytes(r) for r in unframe_records(bytes(bad2),
                                             permissive=True)]
    assert got == [b"abc"]


def test_masked_crc_shape():
    ln = struct.pack("<Q", 3)
    assert 0 <= _masked_crc(ln) <= 0xFFFFFFFF


_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("score", T.FloatType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("tokens", T.ArrayType(T.LongType())),
    T.StructField("payload", T.BinaryType()),
])


def test_spark_roundtrip(spark, tmp_path):
    df = spark.range(50).selectExpr(
        "id as doc_id",
        "concat('text-', id) as text",
        "cast(id * 0.5 as float) as score",
        "array(cast(id as float), cast(id * 2 as float)) as embedding",
        "array(id, id + 1, id + 2) as tokens",
        "encode(concat('p', id), 'utf-8') as payload",
    )
    out = str(tmp_path / "shards")
    n = write_tfrecords(df.repartition(4), out)
    assert n == 4
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = read_tfrecords(spark, out, _SCHEMA)
    rows = {r["doc_id"]: r for r in back.collect()}
    assert len(rows) == 50
    r7 = rows[7]
    assert r7["text"] == "text-7"
    assert r7["score"] == 3.5
    assert list(r7["embedding"]) == [7.0, 14.0]
    assert list(r7["tokens"]) == [7, 8, 9]
    assert bytes(r7["payload"]) == b"p7"


def test_spark_nulls_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, "x")], "doc_id bigint, text string"
    )
    out = str(tmp_path / "n")
    write_tfrecords(df.coalesce(1), out)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    rows = {(r["doc_id"], r["text"])
            for r in read_tfrecords(spark, out, schema).collect()}
    assert rows == {(1, None), (2, "x")}


def test_unsupported_type_refuses(spark, tmp_path):
    df = spark.range(2).selectExpr("id", "map('a', id) as m")
    with pytest.raises(TFRecordError, match="no TFRecord feature"):
        write_tfrecords(df, str(tmp_path / "x"))
