"""Avro OCF codec + Spark source/sink tests (sources/avro_ocf.py).

The byte-level pins are written against the PUBLIC Apache Avro 1.11
spec, not against our own encoder: the zigzag table reproduces the
spec's worked examples, and the hand-built container file is
assembled byte-by-byte in the test so a self-consistent-but-wrong
codec cannot pass by construction.
"""

from __future__ import annotations

import json
import struct
import zlib
from datetime import date, datetime
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from artis_data_ingest_spark.sources.avro_ocf import (
    AvroError,
    _Reader,
    _zigzag,
    avro_to_spark_type,
    decode_ocf,
    encode_ocf,
    parse_avro_schema,
    read_avro,
    read_ocf_header,
    spark_to_avro_schema,
    write_avro,
)

# --------------------------------------------------------------------------
# spec pins (independent of our encoder)
# --------------------------------------------------------------------------


def test_zigzag_matches_spec_table():
    # Apache Avro spec, "Binary Encoding" worked examples
    assert _zigzag(0) == b"\x00"
    assert _zigzag(-1) == b"\x01"
    assert _zigzag(1) == b"\x02"
    assert _zigzag(-2) == b"\x03"
    assert _zigzag(2) == b"\x04"
    assert _zigzag(-64) == b"\x7f"
    assert _zigzag(64) == b"\x80\x01"


def test_varint_roundtrip_extremes():
    for n in (0, 1, -1, 63, -64, 64, 2**31 - 1, -(2**31),
              2**62, -(2**63), 2**63 - 1):
        r = _Reader(_zigzag(n))
        assert r.read_long() == n


def _hand_built_ocf() -> bytes:
    """A minimal OCF assembled raw-byte-by-raw-byte from the spec:
    schema {"id": long, "name": string}, null codec, two rows in one
    block — nothing from encode_ocf is used."""
    schema = json.dumps(
        {"type": "record", "name": "r",
         "fields": [{"name": "id", "type": "long"},
                    {"name": "name", "type": "string"}]}
    ).encode()
    sync = bytes(range(16))
    out = bytearray(b"Obj\x01")
    # metadata map: one block of 2 entries, then end-of-map
    out += _zigzag(2)
    for k, v in ((b"avro.schema", schema), (b"avro.codec", b"null")):
        out += _zigzag(len(k)) + k + _zigzag(len(v)) + v
    out += b"\x00"
    out += sync
    body = bytearray()
    body += _zigzag(7)                       # id = 7
    body += _zigzag(2) + b"ab"               # name = "ab"
    body += _zigzag(-3)                      # id = -3
    body += _zigzag(3) + "héllo"[:2].encode("utf-8")  # 2-char utf8 = 3 bytes
    out += _zigzag(2) + _zigzag(len(body)) + bytes(body) + sync
    return bytes(out)


def test_decode_hand_built_container():
    schema, rows = decode_ocf(_hand_built_ocf())
    assert schema["type"] == "record"
    assert rows == [{"id": 7, "name": "ab"}, {"id": -3, "name": "hé"}]


def test_header_parse_reports_codec_and_sync():
    blob = _hand_built_ocf()
    sch, codec, sync, pos = read_ocf_header(blob)
    assert codec == "null"
    assert sync == bytes(range(16))
    assert blob[pos:].startswith(_zigzag(2))


def test_enum_fixed_and_multibranch_decode():
    # enum + fixed exercise paths the Spark writer never emits
    schema = parse_avro_schema(
        {"type": "record", "name": "r", "fields": [
            {"name": "e", "type": {"type": "enum", "name": "col",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
            {"name": "f", "type": {"type": "fixed", "name": "f4",
                                   "size": 4}},
        ]}
    )
    from artis_data_ingest_spark.sources.avro_ocf import _compile_decoder

    dec = _compile_decoder(schema)
    r = _Reader(_zigzag(2) + b"\xde\xad\xbe\xef")
    assert dec(r) == {"e": "BLUE", "f": b"\xde\xad\xbe\xef"}


def test_named_type_reference_resolves():
    # a record reused by name — common in real-world Avro (Iceberg
    # manifests do this)
    schema = parse_avro_schema(
        {"type": "record", "name": "outer", "fields": [
            {"name": "a", "type": {"type": "record", "name": "point",
                                   "fields": [{"name": "x",
                                               "type": "long"}]}},
            {"name": "b", "type": "point"},
        ]}
    )
    from artis_data_ingest_spark.sources.avro_ocf import _compile_decoder

    dec = _compile_decoder(schema)
    r = _Reader(_zigzag(1) + _zigzag(2))
    assert dec(r) == {"a": {"x": 1}, "b": {"x": 2}}


def test_negative_array_block_count_with_size():
    # spec: a negative count means abs(count) items preceded by a
    # byte-size long (writers emit this to let readers skip blocks)
    schema = parse_avro_schema(
        {"type": "record", "name": "r", "fields": [
            {"name": "xs", "type": {"type": "array", "items": "long"}}]}
    )
    from artis_data_ingest_spark.sources.avro_ocf import _compile_decoder

    dec = _compile_decoder(schema)
    items = _zigzag(5) + _zigzag(6)
    r = _Reader(_zigzag(-2) + _zigzag(len(items)) + items + b"\x00")
    assert dec(r) == {"xs": [5, 6]}


# --------------------------------------------------------------------------
# encoder/decoder roundtrip + error paths
# --------------------------------------------------------------------------

_FULL_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("f32", T.FloatType(), True),
    T.StructField("flag", T.BooleanType(), False),
    T.StructField("d", T.DateType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("dec", T.DecimalType(12, 3), True),
    T.StructField("blob", T.BinaryType(), True),
    T.StructField("tags", T.ArrayType(T.StringType(), True), True),
    T.StructField("kv", T.MapType(T.StringType(), T.LongType(), True),
                  True),
    T.StructField("nested", T.StructType([
        T.StructField("a", T.IntegerType(), False),
        T.StructField("b", T.StringType(), True),
    ]), True),
])

_FULL_ROWS = [
    {"id": 1, "name": "alpha", "score": 3.5, "f32": 1.25, "flag": True,
     "d": date(2024, 2, 29), "ts": datetime(2024, 1, 2, 3, 4, 5, 123456),
     "dec": Decimal("1234.567"), "blob": b"\x00\xff",
     "tags": ["x", None, "y"], "kv": {"a": 1, "b": None},
     "nested": {"a": 7, "b": "in"}},
    {"id": -2, "name": None, "score": None, "f32": None, "flag": False,
     "d": None, "ts": None, "dec": Decimal("-0.001"), "blob": None,
     "tags": [], "kv": {}, "nested": None},
]


@pytest.mark.parametrize("codec", ["null", "deflate", "bzip2", "xz"])
def test_full_type_roundtrip_all_codecs(codec):
    blob = encode_ocf(_FULL_ROWS, _FULL_SCHEMA, codec=codec,
                      rows_per_block=1)
    _, rows = decode_ocf(blob)
    assert rows == _FULL_ROWS


def test_encode_is_byte_deterministic():
    a = encode_ocf(_FULL_ROWS, _FULL_SCHEMA)
    b = encode_ocf(_FULL_ROWS, _FULL_SCHEMA)
    assert a == b


def test_unsupported_codec_raises_with_name():
    blob = bytearray(encode_ocf(_FULL_ROWS, _FULL_SCHEMA, codec="null"))
    patched = bytes(blob).replace(b"null", b"zstandard", 1)
    # metadata value length changes — rebuild properly instead
    meta_schema = json.dumps(
        spark_to_avro_schema(_FULL_SCHEMA)).encode()
    out = bytearray(b"Obj\x01")
    out += _zigzag(2)
    for k, v in ((b"avro.schema", meta_schema),
                 (b"avro.codec", b"zstandard")):
        out += _zigzag(len(k)) + k + _zigzag(len(v)) + v
    out += b"\x00" + bytes(16)
    out += _zigzag(1) + _zigzag(3) + b"xyz" + bytes(16)
    with pytest.raises(AvroError, match="zstandard"):
        decode_ocf(bytes(out))
    del patched


def test_truncated_payload_raises():
    blob = encode_ocf(_FULL_ROWS, _FULL_SCHEMA)
    with pytest.raises(AvroError):
        decode_ocf(blob[: len(blob) - 9])


def test_sync_marker_mismatch_raises():
    blob = bytearray(encode_ocf(_FULL_ROWS, _FULL_SCHEMA,
                                rows_per_block=1))
    blob[-1] ^= 0xFF  # corrupt the final sync marker
    with pytest.raises(AvroError, match="sync"):
        decode_ocf(bytes(blob))


def test_bad_magic_raises():
    with pytest.raises(AvroError, match="magic"):
        decode_ocf(b"PK\x03\x04 not avro at all")


def test_multibranch_union_refused_in_spark_mapping():
    sch = parse_avro_schema(["null", "long", "string"])
    with pytest.raises(AvroError, match="union"):
        avro_to_spark_type(sch)


def test_schema_mapping_roundtrip_preserves_nullability():
    avro = spark_to_avro_schema(_FULL_SCHEMA)
    back, _ = avro_to_spark_type(parse_avro_schema(avro))
    assert isinstance(back, T.StructType)
    assert [f.name for f in back.fields] == \
        [f.name for f in _FULL_SCHEMA.fields]
    assert [f.nullable for f in back.fields] == \
        [f.nullable for f in _FULL_SCHEMA.fields]
    # logical types survive
    by_name = {f.name: f.dataType for f in back.fields}
    assert isinstance(by_name["d"], T.DateType)
    assert isinstance(by_name["ts"], T.TimestampType)
    assert by_name["dec"] == T.DecimalType(12, 3)


def test_deflate_is_raw_rfc1951():
    # the spec requires RAW deflate (no zlib wrapper); a reader using
    # zlib-wrapped inflate would reject spec-conformant files
    blob = encode_ocf([{"id": 1}], T.StructType(
        [T.StructField("id", T.LongType(), False)]), codec="deflate")
    _, codec, sync, pos = read_ocf_header(blob)
    r = _Reader(blob)
    r.pos = pos
    r.read_long()
    size = r.read_long()
    payload = r.read(size)
    assert zlib.decompress(payload, -15) == _zigzag(1)
    with pytest.raises(zlib.error):
        zlib.decompress(payload)  # zlib-wrapped inflate must fail


# --------------------------------------------------------------------------
# Spark integration
# --------------------------------------------------------------------------


def test_spark_roundtrip_with_inferred_schema(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) / 3,
          datetime(2024, 1, 2, 3, 4, i % 60, 123000),
          [f"t{i}", None], {"k": i}, (i % 5, f"s{i}"))
         for i in range(500)],
        "id long, name string, score double, ts timestamp, "
        "tags array<string>, kv map<string,long>, "
        "nested struct<a:int,b:string>",
    ).repartition(4)
    out = str(tmp_path / "av")
    write_avro(df, out)
    import os

    parts = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert 1 <= len(parts) <= 4
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = read_avro(spark, out)
    assert back.schema["ts"].dataType == T.TimestampType()
    a = {tuple(str(x) for x in r) for r in df.collect()}
    b = {tuple(str(x) for x in r) for r in back.collect()}
    assert a == b


def test_spark_roundtrip_with_explicit_schema_subset_order(spark,
                                                           tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    out = str(tmp_path / "av2")
    write_avro(df, out, codec="bzip2")
    schema = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
    ])
    back = read_avro(spark, out, spark_schema=schema)
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_write_avro_skips_empty_partitions(spark, tmp_path):
    df = spark.range(3).repartition(16)
    out = str(tmp_path / "av3")
    write_avro(df, out)
    import os

    parts = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(parts) <= 3  # only non-empty partitions produce files
    assert read_avro(spark, out).count() == 3


def test_read_avro_empty_dir_raises(spark, tmp_path):
    with pytest.raises(AvroError, match="no .avro files"):
        read_avro(spark, str(tmp_path))


def test_read_avro_mixed_writer_schemas_resolves_by_name(spark,
                                                         tmp_path):
    """Schema evolution across files: every OCF is self-describing,
    so each file decodes under its OWN writer schema and rows project
    by name onto the read schema — missing fields null out, extra
    fields drop (the spec's name-based resolution)."""
    import os

    old = T.StructType([T.StructField("id", T.LongType(), True)])
    new = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("tag", T.StringType(), True),
    ])
    d = str(tmp_path / "mix")
    os.makedirs(d)
    with open(os.path.join(d, "part-00000.avro"), "wb") as fh:
        fh.write(encode_ocf([{"id": 1}], old))
    with open(os.path.join(d, "part-00001.avro"), "wb") as fh:
        fh.write(encode_ocf([{"id": 2, "tag": "t"}], new))
    back = read_avro(spark, d, spark_schema=new)
    assert {tuple(r) for r in back.collect()} == \
        {(1, None), (2, "t")}
    # narrowing read schema drops the evolved column
    narrow = read_avro(spark, d, spark_schema=old)
    assert {tuple(r) for r in narrow.collect()} == {(1,), (2,)}
