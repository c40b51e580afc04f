"""MP3 sync-frame METADATA extraction — stdlib-pure, no PCM decode.

The compressed-audio gap in the media column (operators/multimodal.py
``_decode_stub``) does not need a full MP3 decoder for the common
curation questions: duration, bitrate profile (CBR vs VBR), sample
rate, tag presence, and stream health all come from the frame HEADERS,
which are 4 plain bytes each at positions derivable from the previous
header (MPEG-1 Layer III frame size = 144000·kbps/sample_rate +
padding).  This module walks the sync frames:

  * ID3v2 tag skip (10-byte header + syncsafe 28-bit size);
  * per-frame validation (11-bit sync, MPEG-1, Layer III, legal
    bitrate/sample-rate indexes) with 1-byte resync on garbage —
    corrupt runs are COUNTED (``n_junk_bytes``), not fatal;
  * truncated trailing frames fall into the junk count rather than the
    frame count (a frame is only counted when fully present);
  * VBR detection = more than one distinct frame bitrate.

Everything is integer-exact (``duration_us`` uses integer division) so
the closed-form DuckDB oracle of ``q_mp3_metadata`` reproduces every
field from the fixture formula without parsing a byte.

Scope: MPEG-1 Layer III (the overwhelmingly common case).  Other
versions/layers are treated as junk bytes — loudly visible in
``n_junk_bytes`` rather than silently misparsed.  Full PCM decode
(huffman + IMDCT) remains out of scope for a stdlib container.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

# MPEG-1 Layer III tables (index 0 = "free", 15 = invalid)
BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
SAMPLE_RATE_V1 = [44100, 48000, 32000, 0]
SAMPLES_PER_FRAME_V1L3 = 1152

MP3_META_SCHEMA = (
    "media_id bigint, valid boolean, n_frames bigint, "
    "sample_rate bigint, vbr boolean, sum_bitrate_kbps bigint, "
    "duration_us bigint, has_id3v2 boolean, n_junk_bytes bigint"
)


def parse_mp3(blob: bytes) -> dict:
    """Walk the sync frames of an MP3 payload; see module docstring."""
    n = len(blob)
    pos = 0
    has_id3 = False
    junk = 0
    if n >= 10 and blob[:3] == b"ID3":
        size = (
            ((blob[6] & 0x7F) << 21)
            | ((blob[7] & 0x7F) << 14)
            | ((blob[8] & 0x7F) << 7)
            | (blob[9] & 0x7F)
        )
        pos = min(10 + size, n)
        has_id3 = True
    frames = 0
    sr0 = 0
    sum_kbps = 0
    seen_kbps: set[int] = set()
    while pos + 4 <= n:
        b0, b1, b2 = blob[pos], blob[pos + 1], blob[pos + 2]
        ok = (
            b0 == 0xFF
            and (b1 & 0xE0) == 0xE0
            and ((b1 >> 3) & 3) == 3  # MPEG-1
            and ((b1 >> 1) & 3) == 1  # Layer III
        )
        if ok:
            bidx = b2 >> 4
            sridx = (b2 >> 2) & 3
            pad = (b2 >> 1) & 1
            if 1 <= bidx <= 14 and sridx <= 2:
                kbps = BITRATE_V1L3[bidx]
                sr = SAMPLE_RATE_V1[sridx]
                fsize = 144000 * kbps // sr + pad
                if pos + fsize > n:
                    # truncated trailing frame: junk, not a frame
                    junk += n - pos
                    pos = n
                    break
                frames += 1
                sum_kbps += kbps
                seen_kbps.add(kbps)
                if not sr0:
                    sr0 = sr
                pos += fsize
                continue
        junk += 1
        pos += 1
    junk += n - pos if pos < n else 0
    return {
        "valid": frames > 0,
        "n_frames": frames,
        "sample_rate": sr0,
        "vbr": len(seen_kbps) > 1,
        "sum_bitrate_kbps": sum_kbps,
        "duration_us": (
            frames * SAMPLES_PER_FRAME_V1L3 * 1_000_000 // sr0 if sr0 else 0
        ),
        "has_id3v2": has_id3,
        "n_junk_bytes": junk,
    }


def mp3_metadata(media: DataFrame) -> DataFrame:
    """(media_id, content) -> MP3_META_SCHEMA via Arrow-batched
    mapInPandas — same plumbing as every other media probe: blobs are
    opaque binary cells, one linear pass per blob, no grouping
    shuffle."""
    import pandas as pd

    def _probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                m = parse_mp3(bytes(blob) if blob is not None else b"")
                rows.append({"media_id": media_id, **m})
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _probe, MP3_META_SCHEMA
    )


def mp3_media(spark: SparkSession, n: int = 9) -> DataFrame:
    """Deterministic MP3 fixture clips, formula-driven so the oracle
    can reproduce every metadata field without parsing:

      clip i (0..n-2): sample rate [44100,48000,32000][i%3],
        30+5i frames; even i are CBR at bitrate index 2+(i%8), odd i
        are VBR cycling indexes 2+((i+j)%8); clips with i%3==1 set the
        padding bit on odd frames (size-calculation exercise, invisible
        in the outputs but desyncs a wrong parser);
      clip 2 carries a 123-byte ID3v2 tag; clip 5 has 7 junk bytes
        before the first frame and 5 mid-stream (resync exercise);
      clip 4's final frame is truncated by 30 bytes;
      clip n-1 is 64 bytes of pure junk (no frame at all).

    Payload bytes are < 251 so no false sync patterns occur.
    """
    rows = []
    for i in range(n - 1):
        sr_idx = i % 3
        sr = SAMPLE_RATE_V1[sr_idx]
        nf = 30 + 5 * i
        buf = bytearray()
        for j in range(nf):
            bidx = 2 + (i % 8) if i % 2 == 0 else 2 + ((i + j) % 8)
            pad = (j % 2) if i % 3 == 1 else 0
            kbps = BITRATE_V1L3[bidx]
            fsize = 144000 * kbps // sr + pad
            buf += bytes(
                [0xFF, 0xFB, (bidx << 4) | (sr_idx << 2) | (pad << 1), 0x00]
            )
            buf += bytes(((j * 17 + k * 3) % 251) for k in range(fsize - 4))
            if i == 5 and j == 9:
                buf += b"\x21" * 5
        blob = bytes(buf)
        if i == 2:
            blob = b"ID3\x03\x00\x00\x00\x00\x00\x7b" + b"\x21" * 123 + blob
        if i == 5:
            blob = b"\x21" * 7 + blob
        if i == 4:
            blob = blob[:-30]
        rows.append((i, "audio", blob))
    rows.append((n - 1, "audio", b"\x21" * 64))
    return spark.createDataFrame(
        rows, "media_id bigint, kind string, content binary"
    )


# --------------------------------------------------------------------------
# ID3v2 tag FIELD extraction (r14) — id3.org informal standards
# --------------------------------------------------------------------------

# v2.2 (3-char) → v2.3/2.4 (4-char) frame id mapping for the fields a
# curation pipeline actually uses
_ID3_FIELDS = {
    "TIT2": "title", "TT2": "title",
    "TPE1": "artist", "TP1": "artist",
    "TALB": "album", "TAL": "album",
    "TYER": "year", "TDRC": "year", "TYE": "year",
    "TRCK": "track", "TRK": "track",
}

ID3_SCHEMA = (
    "media_id bigint, valid boolean, version string, title string, "
    "artist string, album string, year string, track string, "
    "n_frames bigint"
)


def _id3_text(payload: bytes) -> str | None:
    """Decode one text frame: 1 encoding byte then the string.
    0 = latin-1, 1 = utf-16 with BOM, 2 = utf-16be, 3 = utf-8."""
    if not payload:
        return None
    enc, body = payload[0], payload[1:]
    try:
        if enc == 0:
            text = body.decode("latin-1")
        elif enc == 1:
            text = body.decode("utf-16")
        elif enc == 2:
            text = body.decode("utf-16-be")
        elif enc == 3:
            text = body.decode("utf-8")
        else:
            return None
    except UnicodeDecodeError:
        return None
    return text.rstrip("\x00") or None


def parse_id3v2(blob: bytes) -> dict:
    """ID3v2.2/2.3/2.4 tag walk → the common text fields.  Returns
    valid=False (all fields null) when no tag leads the payload —
    never raises on garbage."""
    out = {
        "valid": False, "version": None, "title": None,
        "artist": None, "album": None, "year": None, "track": None,
        "n_frames": 0,
    }
    if len(blob) < 10 or blob[:3] != b"ID3":
        return out
    major = blob[3]
    if major not in (2, 3, 4):
        return out
    flags = blob[5]
    size = (
        ((blob[6] & 0x7F) << 21) | ((blob[7] & 0x7F) << 14)
        | ((blob[8] & 0x7F) << 7) | (blob[9] & 0x7F)
    )
    out["valid"] = True
    out["version"] = f"2.{major}"
    pos, end = 10, min(10 + size, len(blob))
    if flags & 0x40 and major >= 3 and pos + 4 <= end:
        # extended header: skip by its own size field
        ext = int.from_bytes(blob[pos : pos + 4], "big")
        if major == 4:  # syncsafe in 2.4
            ext = (
                ((blob[pos] & 0x7F) << 21)
                | ((blob[pos + 1] & 0x7F) << 14)
                | ((blob[pos + 2] & 0x7F) << 7)
                | (blob[pos + 3] & 0x7F)
            )
            pos += ext
        else:
            pos += 4 + ext
    id_len = 3 if major == 2 else 4
    sz_len = 3 if major == 2 else 4
    while pos + id_len + sz_len <= end:
        fid = blob[pos : pos + id_len]
        if fid.rstrip(b"\x00") == b"":  # padding
            break
        try:
            fid_s = fid.decode("ascii")
        except UnicodeDecodeError:
            break
        raw_sz = blob[pos + id_len : pos + id_len + sz_len]
        if major == 4:  # syncsafe frame sizes in 2.4
            fsz = (
                ((raw_sz[0] & 0x7F) << 21)
                | ((raw_sz[1] & 0x7F) << 14)
                | ((raw_sz[2] & 0x7F) << 7)
                | (raw_sz[3] & 0x7F)
            )
        else:
            fsz = int.from_bytes(raw_sz, "big")
        hdr = id_len + sz_len + (0 if major == 2 else 2)  # v2.3+ flags
        payload = blob[pos + hdr : pos + hdr + fsz]
        if len(payload) < fsz:
            break
        out["n_frames"] += 1
        field = _ID3_FIELDS.get(fid_s)
        if field and out[field] is None:
            out[field] = _id3_text(payload)
        pos += hdr + fsz
    return out


def write_id3v2(major: int, fields: dict[str, str],
                encoding: int = 0) -> bytes:
    """Fixture-grade ID3v2.{2,3,4} tag writer (text frames only)."""
    name_for = {
        2: {"title": b"TT2", "artist": b"TP1", "album": b"TAL",
            "year": b"TYE", "track": b"TRK"},
        3: {"title": b"TIT2", "artist": b"TPE1", "album": b"TALB",
            "year": b"TYER", "track": b"TRCK"},
        4: {"title": b"TIT2", "artist": b"TPE1", "album": b"TALB",
            "year": b"TDRC", "track": b"TRCK"},
    }[major]
    body = bytearray()
    for key, value in fields.items():
        if encoding == 0:
            text = value.encode("latin-1")
        elif encoding == 1:
            text = value.encode("utf-16")  # BOM included
        elif encoding == 2:
            text = value.encode("utf-16-be")
        else:
            text = value.encode("utf-8")
        payload = bytes([encoding]) + text
        fid = name_for[key]
        if major == 2:
            body += fid + len(payload).to_bytes(3, "big") + payload
        else:
            n = len(payload)
            if major == 4:
                sz = bytes([
                    (n >> 21) & 0x7F, (n >> 14) & 0x7F,
                    (n >> 7) & 0x7F, n & 0x7F,
                ])
            else:
                sz = n.to_bytes(4, "big")
            body += fid + sz + b"\x00\x00" + payload
    size = len(body)
    header = b"ID3" + bytes([major, 0, 0]) + bytes([
        (size >> 21) & 0x7F, (size >> 14) & 0x7F,
        (size >> 7) & 0x7F, size & 0x7F,
    ])
    return header + bytes(body)


def id3_metadata(media: DataFrame) -> DataFrame:
    """(media_id, content) → one tag row per file (Arrow-batched)."""
    import pandas as pd

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                m = parse_id3v2(bytes(blob))
                recs.append((
                    mid, m["valid"], m["version"], m["title"],
                    m["artist"], m["album"], m["year"], m["track"],
                    m["n_frames"],
                ))
            yield pd.DataFrame(recs, columns=[
                "media_id", "valid", "version", "title", "artist",
                "album", "year", "track", "n_frames",
            ])

    return media.mapInPandas(_parse, schema=ID3_SCHEMA)


def id3_mp3_media(spark: SparkSession, n: int = 6) -> DataFrame:
    """Tagged-MP3 fixtures: clip i carries an ID3v2.{2|3|4} tag
    (major = 2 + i%3) in text encoding i%4, fields closed-form —
    title 'Track {i}', artist 'Artist {i%3}', album 'Album {i//2}',
    year str(2000+i), track str(i+1) — followed by real sync frames.
    Clip n-1 is untagged garbage (valid=false row)."""
    rows = []
    for i in range(n - 1):
        tag = write_id3v2(
            2 + (i % 3),
            {"title": f"Track {i}", "artist": f"Artist {i % 3}",
             "album": f"Album {i // 2}", "year": str(2000 + i),
             "track": str(i + 1)},
            encoding=i % 4,
        )
        # a couple of valid MPEG-1 L3 frames after the tag
        frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * (417 - 4)
        rows.append((i, bytearray(tag + frame * 2)))
    rows.append((n - 1, bytearray(b"\x21" * 32)))
    return spark.createDataFrame(
        rows, "media_id bigint, content binary"
    )
