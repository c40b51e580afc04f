"""OGG container metadata walker — Vorbis and Opus streams.

Scraped audio arrives as OGG at least as often as MP3 (podcast
archives, Wikimedia audio, game assets).  Full Vorbis/Opus PCM decode
genuinely needs a codec library (MDCT + floor/residue codebooks);
what a curation pipeline needs FIRST is the metadata triage the repo
already does for MP3/MP4/H.264 — duration, channels, rates, stream
kind, corruption — and that is pure byte arithmetic per the public
specs (RFC 3533 for the container, the Vorbis I spec and RFC 7845 for
the identification headers):

  * Pages: ``OggS`` capture + version 0, header-type flags (BOS /
    EOS / continuation), 64-bit granule position, stream serial,
    page sequence, CRC field, segment table (lacing values; 255
    means the packet continues).
  * First packet of the BOS page identifies the codec:
    ``\\x01vorbis`` → channels u8 @11, sample rate u32le @12;
    ``OpusHead`` → channels u8 @9, pre-skip u16le @10, input sample
    rate u32le @12 (Opus always decodes at 48 kHz — duration uses
    the 48 kHz granule clock minus pre-skip, per RFC 7845 §4).
  * Duration = last granule position (final page of the stream) on
    the codec's granule clock: sample number for Vorbis, 48 kHz PCM
    sample count for Opus.

Each file is one task (mapInPandas via the shared media plumbing);
malformed payloads yield null-metadata rows, never task failures.
"""

from __future__ import annotations

import struct


def parse_ogg(blob: bytes) -> dict:
    """→ {codec, channels, sample_rate, duration_s, n_pages,
    n_streams, valid, truncated} — metadata only, no PCM."""
    out = {
        "codec": None, "channels": None, "sample_rate": None,
        "duration_s": None, "n_pages": 0, "n_streams": 0,
        "valid": False, "truncated": False,
    }
    pos = 0
    serials: set[int] = set()
    first_packet: bytes | None = None
    first_serial: int | None = None
    last_granule: dict[int, int] = {}
    while pos + 27 <= len(blob):
        if blob[pos : pos + 4] != b"OggS":
            if out["n_pages"]:
                out["truncated"] = True
            break
        version = blob[pos + 4]
        if version != 0:
            out["truncated"] = True
            break
        header_type = blob[pos + 5]
        (granule,) = struct.unpack_from("<q", blob, pos + 6)
        (serial,) = struct.unpack_from("<I", blob, pos + 14)
        n_segs = blob[pos + 26]
        seg_table = blob[pos + 27 : pos + 27 + n_segs]
        if len(seg_table) < n_segs:
            out["truncated"] = True
            break
        body_len = sum(seg_table)
        body = blob[pos + 27 + n_segs : pos + 27 + n_segs + body_len]
        if len(body) < body_len:
            out["truncated"] = True
            break
        out["n_pages"] += 1
        serials.add(serial)
        if header_type & 0x02 and first_packet is None:  # BOS
            # first packet = segments up to the first lacing < 255
            plen = 0
            for lv in seg_table:
                plen += lv
                if lv < 255:
                    break
            first_packet = body[:plen]
            first_serial = serial
        if granule >= 0 and serial == (first_serial
                                       if first_serial is not None
                                       else serial):
            last_granule[serial] = granule
        pos += 27 + n_segs + body_len
    out["n_streams"] = len(serials)
    if first_packet is None:
        return out
    out["valid"] = True
    if first_packet[:7] == b"\x01vorbis" and len(first_packet) >= 16:
        out["codec"] = "vorbis"
        out["channels"] = first_packet[11]
        (sr,) = struct.unpack_from("<I", first_packet, 12)
        out["sample_rate"] = sr
        g = last_granule.get(first_serial)
        if g is not None and sr:
            out["duration_s"] = round(g / sr, 6)
    elif first_packet[:8] == b"OpusHead" and len(first_packet) >= 16:
        out["codec"] = "opus"
        out["channels"] = first_packet[9]
        (pre_skip,) = struct.unpack_from("<H", first_packet, 10)
        (sr,) = struct.unpack_from("<I", first_packet, 12)
        out["sample_rate"] = sr
        g = last_granule.get(first_serial)
        if g is not None:
            out["duration_s"] = round(
                max(0, g - pre_skip) / 48000.0, 6
            )
    else:
        out["codec"] = "unknown"
    return out


# --------------------------------------------------------------------------
# fixture writers (spec-shaped pages with correct lacing)
# --------------------------------------------------------------------------


def ogg_metadata(media) -> "DataFrame":  # noqa: F821
    """(media_id, content) → one metadata row per file via
    Arrow-batched mapInPandas; binary never shuffles."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_streams", T.LongType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("truncated", T.BooleanType()),
    ])

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                m = parse_ogg(bytes(blob))
                recs.append((
                    mid, m["codec"], m["channels"], m["sample_rate"],
                    m["duration_s"], m["n_pages"], m["n_streams"],
                    m["valid"], m["truncated"],
                ))
            yield pd.DataFrame(
                recs, columns=[f.name for f in schema.fields]
            )

    return media.mapInPandas(_parse, schema=schema)


def ogg_media(spark, n: int = 6) -> "DataFrame":  # noqa: F821
    """Fixture table: even ids are Vorbis (channels 1+(i%3), rate
    8000+4000·i, total samples rate·(i+2)/2 → duration (i+2)/2 s),
    odd ids are Opus (stereo, 44100 input rate, pre-skip 312+i,
    48 kHz granule 48000·(i+1)+pre_skip → duration exactly i+1 s)."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            sr = 8000 + 4000 * i
            blob = make_vorbis_ogg(
                1000 + i, 1 + (i % 3), sr, (sr * (i + 2)) // 2
            )
        else:
            pre = 312 + i
            blob = make_opus_ogg(
                2000 + i, 2, 44100, pre, 48000 * (i + 1) + pre
            )
        rows.append((i, bytearray(blob)))
    return spark.createDataFrame(rows, "media_id long, content binary")


def _page(
    serial: int, seq: int, granule: int, body: bytes,
    bos: bool = False, eos: bool = False,
) -> bytes:
    segs = []
    remaining = len(body)
    while remaining >= 255:
        segs.append(255)
        remaining -= 255
    segs.append(remaining)
    header = bytearray(b"OggS")
    header.append(0)
    header.append((0x02 if bos else 0) | (0x04 if eos else 0))
    header += struct.pack("<q", granule)
    header += struct.pack("<I", serial)
    header += struct.pack("<I", seq)
    header += b"\x00\x00\x00\x00"  # CRC left zero in fixtures
    header.append(len(segs))
    header += bytes(segs)
    return bytes(header) + body


def make_vorbis_ogg(
    serial: int, channels: int, sample_rate: int, total_samples: int
) -> bytes:
    ident = (
        b"\x01vorbis" + struct.pack("<I", 0)
        + bytes([channels]) + struct.pack("<I", sample_rate)
        + struct.pack("<iii", -1, sample_rate, -1)
        + b"\xb8\x01"
    )
    out = _page(serial, 0, 0, ident, bos=True)
    out += _page(serial, 1, total_samples // 2, b"\x00" * 40)
    out += _page(serial, 2, total_samples, b"\x00" * 24, eos=True)
    return out


def make_opus_ogg(
    serial: int, channels: int, input_rate: int, pre_skip: int,
    granule_end: int,
) -> bytes:
    head = (
        b"OpusHead" + bytes([1, channels])
        + struct.pack("<H", pre_skip)
        + struct.pack("<I", input_rate)
        + struct.pack("<h", 0) + bytes([0])
    )
    out = _page(serial, 0, 0, head, bos=True)
    out += _page(serial, 1, granule_end, b"\x00" * 33, eos=True)
    return out
