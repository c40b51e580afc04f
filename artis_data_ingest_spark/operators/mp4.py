"""MP4 / ISO-BMFF container METADATA extraction — stdlib-pure, no
sample decode.

The dominant scraped-video transport (ISO/IEC 14496-12) previously hit
the loud ``_decode_stub`` in operators/multimodal.py; like mp3.py and
h264.py shrank the audio and elementary-stream stubs, this walks the
BOX structure for the curation-relevant facts:

  * box walk: 4-byte big-endian size + 4-byte fourcc; ``size == 1``
    reads the 8-byte largesize, ``size == 0`` extends to end-of-
    enclosure; known CONTAINER boxes (moov, trak, mdia, minf, stbl,
    edts) recurse; ``free``/``skip``/``wide`` are known padding;
    anything else is skipped by size and COUNTED (``n_unknown``) —
    never fatal;
  * ``ftyp``: major brand fourcc;
  * ``moov/mvhd``: timescale + duration, version 0 (32-bit) AND
    version 1 (64-bit) field layouts; ``duration_us`` is
    integer-exact (µs = duration · 1e6 // timescale) so the oracle
    reproduces it without floats;
  * ``trak/tkhd``: 16.16 fixed-point presentation geometry (both
    version layouts); the report keeps the max over tracks (the
    video track; audio tracks carry 0×0);
  * ``trak/…/stbl/stsd``: sample-entry fourccs (the codec list,
    distinct + sorted);
  * a box whose declared size overruns its enclosure marks the file
    ``truncated`` and is NOT counted — all boxes before it still
    report (a partially-downloaded clip yields its metadata);
  * no parseable top-level box at all → ``valid = false``.

Scope: container metadata only — sample tables beyond stsd fourccs
(stts/stsz/stco) and the codec-private configs (avcC/esds) stay
unread; h264.py already parses the elementary stream where the
pipeline needs geometry from the bitstream itself.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

MP4_META_SCHEMA = (
    "media_id bigint, valid boolean, major_brand string, "
    "timescale bigint, duration_us bigint, n_tracks bigint, "
    "codecs string, width bigint, height bigint, n_boxes bigint, "
    "n_unknown bigint, truncated boolean"
)

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}
_PADDING = {b"free", b"skip", b"wide"}

#: Real files nest ~6 deep (moov/trak/mdia/minf/stbl); a crafted blob
#: of ~1000 nested containers would otherwise hit Python's recursion
#: limit inside mapInPandas — cap well above any legitimate depth and
#: degrade to ``truncated`` instead.
_MAX_DEPTH = 32


def _walk(blob: bytes, lo: int, hi: int, state: dict, depth: int = 0) -> None:
    if depth > _MAX_DEPTH:
        state["truncated"] = True
        return
    pos = lo
    while pos + 8 <= hi:
        size = int.from_bytes(blob[pos : pos + 4], "big")
        typ = blob[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > hi:
                state["truncated"] = True
                return
            size = int.from_bytes(blob[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = hi - pos  # extends to end of enclosure
        if size < hdr or not typ.isalnum() and typ not in _PADDING:
            # not a plausible box header: stop this level, flag junk
            state["truncated"] = True
            return
        if pos + size > hi:
            state["truncated"] = True  # declared size overruns
            return
        state["n_boxes"] += 1
        body_lo, body_hi = pos + hdr, pos + size
        if typ == b"ftyp":
            state["major_brand"] = blob[body_lo : body_lo + 4].decode(
                "latin-1"
            )
        elif typ in _CONTAINERS:
            if typ == b"trak":
                state["n_tracks"] += 1
            _walk(blob, body_lo, body_hi, state, depth + 1)
        elif typ == b"mvhd":
            v = blob[body_lo]
            if v == 1:
                ts = int.from_bytes(blob[body_lo + 20 : body_lo + 24], "big")
                dur = int.from_bytes(blob[body_lo + 24 : body_lo + 32], "big")
            else:
                ts = int.from_bytes(blob[body_lo + 12 : body_lo + 16], "big")
                dur = int.from_bytes(blob[body_lo + 16 : body_lo + 20], "big")
            state["timescale"] = ts
            state["duration_us"] = dur * 1_000_000 // ts if ts else 0
        elif typ == b"tkhd":
            v = blob[body_lo]
            geo = body_lo + (88 if v == 1 else 76)
            if geo + 8 <= body_hi:
                w = int.from_bytes(blob[geo : geo + 4], "big") >> 16
                h = int.from_bytes(blob[geo + 4 : geo + 8], "big") >> 16
                state["width"] = max(state["width"], w)
                state["height"] = max(state["height"], h)
        elif typ == b"stsd":
            n = int.from_bytes(blob[body_lo + 4 : body_lo + 8], "big")
            p = body_lo + 8
            for _ in range(n):
                if p + 8 > body_hi:
                    break
                esize = int.from_bytes(blob[p : p + 4], "big")
                state["codecs"].add(blob[p + 4 : p + 8].decode("latin-1"))
                if esize < 8:
                    break
                p += esize
        elif typ not in _PADDING and typ not in (b"mdat", b"mvhd",
                                                 b"tkhd", b"stsd",
                                                 b"ftyp", b"mdhd",
                                                 b"hdlr", b"stts",
                                                 b"stsz", b"stco"):
            state["n_unknown"] += 1
        pos += size


def parse_mp4(blob: bytes) -> dict:
    state = {
        "major_brand": "",
        "timescale": 0,
        "duration_us": 0,
        "n_tracks": 0,
        "codecs": set(),
        "width": 0,
        "height": 0,
        "n_boxes": 0,
        "n_unknown": 0,
        "truncated": False,
    }
    _walk(blob, 0, len(blob), state)
    return {
        "valid": state["n_boxes"] > 0,
        "major_brand": state["major_brand"],
        "timescale": state["timescale"],
        "duration_us": state["duration_us"],
        "n_tracks": state["n_tracks"],
        "codecs": ",".join(sorted(state["codecs"])),
        "width": state["width"],
        "height": state["height"],
        "n_boxes": state["n_boxes"],
        "n_unknown": state["n_unknown"],
        "truncated": state["truncated"],
    }


MP4_TRACKS_SCHEMA = (
    "media_id bigint, track_id bigint, handler string, codec string, "
    "width bigint, height bigint, n_samples bigint, n_chunks bigint, "
    "duration_us bigint, total_bytes bigint, bitrate_bps bigint"
)


def parse_mp4_tracks(blob: bytes) -> list[dict]:
    """One row per ``trak`` box, document order: track id + geometry
    (tkhd, both version layouts), handler fourcc (hdlr), the first
    stsd sample-entry codec, and the SAMPLE-TABLE facts (r12):
    ``n_samples`` (stsz sample_count), ``n_chunks`` (stco entry
    count), ``duration_us`` — integer-exact from the stts
    (count, delta) runs over the mdhd media timescale, NOT the movie
    timescale — ``total_bytes`` (Σ stsz; the fixed-sample_size form
    multiplies, the table form sums), and the real
    ``bitrate_bps`` = total_bytes · 8 · 1e6 // duration_us.  Same
    tolerance rules as :func:`_walk`; a clip with no parseable boxes
    yields no rows, and a trak missing its sample tables reports
    zeros."""

    def boxes(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            size = int.from_bytes(blob[pos : pos + 4], "big")
            typ = blob[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > hi:
                    return
                size = int.from_bytes(blob[pos + 8 : pos + 16], "big")
                hdr = 16
            elif size == 0:
                size = hi - pos
            if size < hdr or pos + size > hi:
                return
            yield typ, pos + hdr, pos + size
            pos += size

    def find(lo: int, hi: int, want: bytes):
        for typ, blo, bhi in boxes(lo, hi):
            if typ == want:
                return blo, bhi
        return None

    out: list[dict] = []

    def visit(lo: int, hi: int, depth: int = 0) -> None:
        if depth > _MAX_DEPTH:
            return  # crafted nesting: degrade, never RecursionError
        for typ, blo, bhi in boxes(lo, hi):
            if typ == b"moov":
                visit(blo, bhi, depth + 1)
            elif typ == b"trak":
                row = {
                    "track_id": 0, "handler": "", "codec": "",
                    "width": 0, "height": 0, "n_samples": 0,
                    "n_chunks": 0, "duration_us": 0,
                    "total_bytes": 0, "bitrate_bps": 0,
                }
                tk = find(blo, bhi, b"tkhd")
                if tk:
                    v = blob[tk[0]]
                    tid_at = tk[0] + (20 if v == 1 else 12)
                    row["track_id"] = int.from_bytes(
                        blob[tid_at : tid_at + 4], "big"
                    )
                    geo = tk[0] + (88 if v == 1 else 76)
                    if geo + 8 <= tk[1]:
                        row["width"] = (
                            int.from_bytes(blob[geo : geo + 4], "big")
                            >> 16
                        )
                        row["height"] = (
                            int.from_bytes(blob[geo + 4 : geo + 8], "big")
                            >> 16
                        )
                md = find(blo, bhi, b"mdia")
                if md:
                    hd = find(md[0], md[1], b"hdlr")
                    if hd and hd[0] + 12 <= hd[1]:
                        row["handler"] = blob[
                            hd[0] + 8 : hd[0] + 12
                        ].decode("latin-1")
                    # mdhd media timescale (the stts deltas' clock)
                    mts = 0
                    mh = find(md[0], md[1], b"mdhd")
                    if mh and mh[0] + 4 <= mh[1]:
                        at = mh[0] + (20 if blob[mh[0]] == 1 else 12)
                        if at + 4 <= mh[1]:
                            mts = int.from_bytes(
                                blob[at : at + 4], "big"
                            )
                    mi = find(md[0], md[1], b"minf")
                    sb = find(mi[0], mi[1], b"stbl") if mi else None
                    sd = find(sb[0], sb[1], b"stsd") if sb else None
                    if sd and sd[0] + 16 <= sd[1]:
                        row["codec"] = blob[
                            sd[0] + 12 : sd[0] + 16
                        ].decode("latin-1")
                    if sb:
                        self_ticks = 0
                        st = find(sb[0], sb[1], b"stts")
                        if st and st[0] + 8 <= st[1]:
                            n = int.from_bytes(
                                blob[st[0] + 4 : st[0] + 8], "big"
                            )
                            p = st[0] + 8
                            for _ in range(n):
                                if p + 8 > st[1]:
                                    break
                                cnt = int.from_bytes(
                                    blob[p : p + 4], "big"
                                )
                                delta = int.from_bytes(
                                    blob[p + 4 : p + 8], "big"
                                )
                                self_ticks += cnt * delta
                                p += 8
                        if mts:
                            row["duration_us"] = (
                                self_ticks * 1_000_000 // mts
                            )
                        sz = find(sb[0], sb[1], b"stsz")
                        if sz and sz[0] + 12 <= sz[1]:
                            fixed = int.from_bytes(
                                blob[sz[0] + 4 : sz[0] + 8], "big"
                            )
                            cnt = int.from_bytes(
                                blob[sz[0] + 8 : sz[0] + 12], "big"
                            )
                            row["n_samples"] = cnt
                            if fixed:
                                row["total_bytes"] = fixed * cnt
                            else:
                                total = 0
                                p = sz[0] + 12
                                for _ in range(cnt):
                                    if p + 4 > sz[1]:
                                        break
                                    total += int.from_bytes(
                                        blob[p : p + 4], "big"
                                    )
                                    p += 4
                                row["total_bytes"] = total
                        co = find(sb[0], sb[1], b"stco")
                        if co and co[0] + 8 <= co[1]:
                            row["n_chunks"] = int.from_bytes(
                                blob[co[0] + 4 : co[0] + 8], "big"
                            )
                        if row["duration_us"]:
                            row["bitrate_bps"] = (
                                row["total_bytes"] * 8 * 1_000_000
                                // row["duration_us"]
                            )
                out.append(row)

    visit(0, len(blob))
    return out


def mp4_tracks(media: DataFrame) -> DataFrame:
    """(media_id, content) → MP4_TRACKS_SCHEMA, one row per trak —
    the per-track twin of :func:`mp4_metadata` (which reports the
    clip-level rollup)."""
    import pandas as pd

    def _probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                for t in parse_mp4_tracks(
                    bytes(blob) if blob is not None else b""
                ):
                    rows.append({"media_id": media_id, **t})
            yield pd.DataFrame(
                rows,
                columns=["media_id", "track_id", "handler", "codec",
                         "width", "height", "n_samples", "n_chunks",
                         "duration_us", "total_bytes", "bitrate_bps"],
            )

    return media.select("media_id", "content").mapInPandas(
        _probe, MP4_TRACKS_SCHEMA
    )


def mp4_metadata(media: DataFrame) -> DataFrame:
    """(media_id, content) → MP4_META_SCHEMA via Arrow-batched
    mapInPandas — blobs are opaque binary cells, one linear box walk
    per blob, no grouping shuffle; at 100 TB the parallelism unit is
    the clip and the probe reads headers, not samples."""
    import pandas as pd

    def _probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                m = parse_mp4(bytes(blob) if blob is not None else b"")
                rows.append({"media_id": media_id, **m})
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _probe, MP4_META_SCHEMA
    )


# --------------------------------------------------------------------------
# Fixture writer: formula-driven real ISO-BMFF clips.
# --------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes, large: bool = False) -> bytes:
    if large:
        return (
            (1).to_bytes(4, "big") + typ
            + (16 + len(payload)).to_bytes(8, "big") + payload
        )
    return (8 + len(payload)).to_bytes(4, "big") + typ + payload


def _mvhd(version: int, timescale: int, duration: int) -> bytes:
    if version == 1:
        body = (
            bytes([1, 0, 0, 0]) + (0).to_bytes(8, "big") * 2
            + timescale.to_bytes(4, "big") + duration.to_bytes(8, "big")
        )
    else:
        body = (
            bytes(4) + bytes(8)
            + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
        )
    body += bytes(80)  # rate/volume/matrix/next-track filler
    return _box(b"mvhd", body)


def _tkhd(version: int, track_id: int, w: int, h: int) -> bytes:
    if version == 1:
        body = bytes([1, 0, 0, 0]) + bytes(16) + track_id.to_bytes(4, "big")
        body += bytes(4) + bytes(8)   # reserved + 64-bit duration
        body += bytes(8) + bytes(8)   # reserved + layer/group/volume
        body += bytes(36)             # matrix
    else:
        body = bytes(4) + bytes(8) + track_id.to_bytes(4, "big")
        body += bytes(4) + bytes(4)   # reserved + duration
        body += bytes(8) + bytes(8)   # reserved + layer/group/volume
        body += bytes(36)             # matrix
    body += (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big")
    return _box(b"tkhd", body)


def _mdhd(timescale: int) -> bytes:
    # version 0: creation/modification + timescale + duration + lang
    return _box(
        b"mdhd",
        bytes(4) + bytes(8) + timescale.to_bytes(4, "big") + bytes(8),
    )


def _stts(entries: list[tuple[int, int]]) -> bytes:
    return _box(
        b"stts",
        bytes(4) + len(entries).to_bytes(4, "big")
        + b"".join(
            c.to_bytes(4, "big") + d.to_bytes(4, "big")
            for c, d in entries
        ),
    )


def _stsz(fixed: int, count: int, sizes: list[int] | None = None) -> bytes:
    tail = b"" if fixed else b"".join(
        s.to_bytes(4, "big") for s in (sizes or [])
    )
    return _box(
        b"stsz",
        bytes(4) + fixed.to_bytes(4, "big") + count.to_bytes(4, "big")
        + tail,
    )


def _stco(n: int) -> bytes:
    return _box(
        b"stco",
        bytes(4) + n.to_bytes(4, "big")
        + b"".join((48 + 16 * k).to_bytes(4, "big") for k in range(n)),
    )


def _trak(
    version: int,
    track_id: int,
    fourcc: bytes,
    w: int,
    h: int,
    samples: dict | None = None,
) -> bytes:
    """``samples`` (optional): {"mts": media timescale, "stts":
    [(count, delta), ...], "stsz": (fixed, count) | (0, count,
    sizes), "chunks": n} — emits mdhd + stts/stsz/stco so the
    sample-table reader has real structure to parse."""
    entry = (16).to_bytes(4, "big") + fourcc + bytes(8)
    stsd = _box(b"stsd", bytes(4) + (1).to_bytes(4, "big") + entry)
    stbl_body = stsd
    mdhd = b""
    if samples:
        mdhd = _mdhd(samples["mts"])
        stbl_body += _stts(samples["stts"])
        stbl_body += _stsz(*samples["stsz"])
        stbl_body += _stco(samples["chunks"])
    stbl = _box(b"stbl", stbl_body)
    minf = _box(b"minf", stbl)
    handler = b"vide" if fourcc == b"avc1" else b"soun"
    hdlr = _box(b"hdlr", bytes(8) + handler + bytes(12))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", _tkhd(version, track_id, w, h) + mdia)


def mp4_media(spark: SparkSession, n: int = 7) -> DataFrame:
    """Deterministic ISO-BMFF fixture clips, formula-driven so the
    oracle reproduces every metadata field without parsing:

      clip i (0..n-2): timescale [600,1000,90000][i%3], duration
        timescale·(3+i) (so duration_us = (3+i)·1e6 exactly), mvhd &
        tkhd version i%2 (32- vs 64-bit layouts), 1+(i%3) tracks —
        track t is avc1 320(t+1)×240(t+1) when t is even, else mp4a
        0×0 — and an mdat of 64+8i deterministic bytes;
      every track carries SAMPLE TABLES (r12), media timescale 1000:
        ns = 8+2t+i samples in two stts runs [(ns-4)·100, 4·150]
        (track duration_us = (100·ns+200)·1000 exactly); stsz is the
        fixed-size form (500+25t per sample) on even t and the
        per-sample table (300+k) on odd t; stco has 2+(t%2) chunks;
        bitrate_bps = total_bytes·8·1e6 // duration_us;
      clip 2 additionally carries a ``free`` padding box and an
        unknown ``junQ`` box before moov (skip + count exercise);
      clip 3's mdat uses the 64-bit largesize header;
      clip 4 is truncated 20 bytes into its mdat payload
        (truncated=true, mdat not counted, metadata intact);
      clip 5 has no ftyp (major_brand empty);
      clip n-1 is 48 bytes of non-box garbage (valid=false).
    """
    rows = []
    for i in range(n - 1):
        ts = [600, 1000, 90000][i % 3]
        ver = i % 2
        nt = 1 + (i % 3)
        traks = b""
        for t in range(nt):
            ns = 8 + 2 * t + i
            samples = {
                "mts": 1000,
                "stts": [(ns - 4, 100), (4, 150)],
                "stsz": (
                    (500 + 25 * t, ns)
                    if t % 2 == 0
                    else (0, ns, [300 + k for k in range(ns)])
                ),
                "chunks": 2 + (t % 2),
            }
            if t % 2 == 0:
                traks += _trak(ver, t + 1, b"avc1",
                               320 * (t + 1), 240 * (t + 1),
                               samples=samples)
            else:
                traks += _trak(ver, t + 1, b"mp4a", 0, 0,
                               samples=samples)
        moov = _box(b"moov", _mvhd(ver, ts, ts * (3 + i)) + traks)
        ftyp = _box(
            b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isommp42"
        )
        payload = bytes(((i * 13 + k * 7) % 251) for k in range(64 + 8 * i))
        mdat = _box(b"mdat", payload, large=(i == 3))
        blob = (b"" if i == 5 else ftyp)
        if i == 2:
            blob += _box(b"free", bytes(16)) + _box(b"junQ", bytes(24))
        blob += moov + mdat
        if i == 4:
            blob = blob[: len(blob) - len(mdat) + 8 + 20]
        rows.append((i, "video", blob))
    rows.append((n - 1, "video", bytes(range(48))))
    return spark.createDataFrame(
        rows, "media_id bigint, kind string, content binary"
    )
