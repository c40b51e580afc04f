"""H.264/AVC Annex-B METADATA extraction — stdlib-pure, no decode.

The remaining compressed-video gap (operators/multimodal.py
``_decode_stub``) does not need a macroblock decoder for curation
metadata: stream structure and display geometry live in the NAL
headers and the SPS, which is a plain Exp-Golomb bitstream (ITU-T
H.264 §7.3.2.1).  This module:

  * walks Annex-B start codes (00 00 01 / 00 00 00 01), classifying
    every NAL unit (SPS/PPS/IDR/non-IDR/SEI/other) — slice counts are
    the frame-structure signal a sampler needs;
  * un-escapes emulation-prevention bytes (00 00 03 → 00 00) before
    parsing, as the spec requires;
  * parses the first SPS: profile_idc, level_idc, and the cropped
    display WIDTH×HEIGHT from pic_width_in_mbs / pic_height_in_map_units
    and the frame-cropping offsets (4:2:0 crop units; the
    high-profile chroma/bit-depth branch is read and skipped so
    profile 100 streams parse too — scaling matrices and
    pic_order_cnt_type 1 are rejected as unsupported rather than
    misparsed);
  * tolerates garbage: bytes before the first start code and NALs
    with unknown types are counted, not fatal.

Everything is integer-exact, so the ``q_h264_metadata`` oracle
reproduces every field from the fixture formula without touching a
bit.  Scope: extraction only — actual pixel decode (CABAC/CAVLC +
transforms) stays out of a stdlib container, and the stub says so.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

H264_META_SCHEMA = (
    "media_id bigint, valid boolean, n_nals bigint, n_sps bigint, "
    "n_pps bigint, n_idr bigint, n_slices bigint, n_sei bigint, "
    "profile_idc bigint, level_idc bigint, width bigint, height bigint"
)

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("exp-golomb runaway")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _unescape_rbsp(nal: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(nal):
        if i + 2 < len(nal) and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
            out += nal[i : i + 2]
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


def parse_sps(rbsp: bytes) -> dict:
    """Parse an SPS RBSP (after the 1-byte NAL header) down to the
    cropped display geometry.  Raises ValueError on the (declared)
    unsupported branches rather than misparsing."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # sps_id
    chroma_format_idc = 1
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):  # seq_scaling_matrix_present
            raise ValueError("scaling matrices unsupported")
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        raise ValueError("pic_order_cnt_type 1 unsupported")
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field
    r.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # 4:2:0 crop units: x2 horizontally, x2·(2 - frame_mbs_only)
    # vertically (H.264 Table 6-1)
    sub_x = 2 if chroma_format_idc in (1, 2) else 1
    sub_y = 2 if chroma_format_idc == 1 else 1
    width = w_mbs * 16 - sub_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * h_units * 16 - sub_y * (
        2 - frame_mbs_only
    ) * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
    }


def parse_h264_annexb(blob: bytes) -> dict:
    n = len(blob)
    nals = []
    i = 0
    # find successive start codes; bytes before the first are junk
    starts = []
    while i + 3 <= n:
        if blob[i] == 0 and blob[i + 1] == 0:
            if blob[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i + 4 <= n and blob[i + 2] == 0 and blob[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    for k, (sc, body) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        if body < end:
            nals.append(blob[body:end])
    counts = {"sps": 0, "pps": 0, "idr": 0, "slice": 0, "sei": 0}
    sps_meta = None
    for nal in nals:
        ntype = nal[0] & 0x1F
        if ntype == 7:
            counts["sps"] += 1
            if sps_meta is None:
                try:
                    sps_meta = parse_sps(_unescape_rbsp(nal[1:]))
                except (ValueError, IndexError):
                    sps_meta = None
        elif ntype == 8:
            counts["pps"] += 1
        elif ntype == 5:
            counts["idr"] += 1
        elif ntype == 1:
            counts["slice"] += 1
        elif ntype == 6:
            counts["sei"] += 1
    meta = sps_meta or {
        "profile_idc": 0, "level_idc": 0, "width": 0, "height": 0
    }
    return {
        "valid": sps_meta is not None,
        "n_nals": len(nals),
        "n_sps": counts["sps"],
        "n_pps": counts["pps"],
        "n_idr": counts["idr"],
        "n_slices": counts["slice"],
        "n_sei": counts["sei"],
        **meta,
    }


def h264_metadata(media: DataFrame) -> DataFrame:
    """(media_id, content) -> H264_META_SCHEMA, Arrow-batched."""
    import pandas as pd

    def _probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                m = parse_h264_annexb(
                    bytes(blob) if blob is not None else b""
                )
                rows.append({"media_id": media_id, **m})
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _probe, H264_META_SCHEMA
    )


# --------------------------------------------------------------------------
# Fixture encoder: real Exp-Golomb SPS bitstreams from formulas.
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        nbits = code.bit_length()
        self.u(0, nbits - 1)
        self.u(code, nbits)

    def rbsp_trailing(self) -> bytes:
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _escape_rbsp(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def encode_sps(
    profile_idc: int,
    level_idc: int,
    w_mbs: int,
    h_units: int,
    crop: tuple[int, int, int, int] = (0, 0, 0, 0),
    sps_id: int = 0,
) -> bytes:
    """A minimal valid baseline/high SPS NAL (header byte 0x67) with
    the given geometry; emulation-prevention applied.  ``level_idc=0``
    + ``sps_id=127`` makes the RBSP contain a genuine 00 00 01 run
    (constraint byte, level byte, then ue(127)'s seven leading zeros),
    forcing the escape path."""
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint flags
    w.u(level_idc, 8)
    w.ue(sps_id)
    if profile_idc in _HIGH_PROFILES:
        w.ue(1)  # chroma_format_idc 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(0, 1)  # qpprime
        w.u(0, 1)  # no scaling matrices
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # poc_type 0
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(w_mbs - 1)
    w.ue(h_units - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui absent
    return b"\x67" + _escape_rbsp(w.rbsp_trailing())


def h264_media(spark: SparkSession, n: int = 7) -> DataFrame:
    """Deterministic Annex-B fixture clips, formula-driven:

      clip i (0..n-2): profile 66 for even i, 100 for odd; level
        10+i; geometry (2+i)×16 x (1+i)×16 MBs with cropping
        (i%2, i%3, 0, i%2) on clips where i%2==1; stream = SPS, PPS,
        SEI (i%2), IDR, then 3+i non-IDR slices;
      clip 2's SPS geometry forces a 00 00 run in the RBSP so the
        emulation-prevention escape/unescape path executes;
      clip 3 carries 5 junk bytes before the first start code;
      clip n-1 is start-code-free garbage (valid=false).

    Payload bytes for PPS/SEI/slices avoid 00, so no accidental start
    codes; slice payload length varies by formula.
    """
    rows = []
    for i in range(n - 1):
        profile = 66 if i % 2 == 0 else 100
        level = 10 + i
        w_mbs, h_units = 2 + i, 1 + i
        crop = (i % 2, i % 3, 0, i % 2) if i % 2 == 1 else (0, 0, 0, 0)
        sps = encode_sps(profile, level, w_mbs, h_units, crop)
        if i == 2:
            # level 0 + sps_id 127: constraint byte 00, level byte 00,
            # then ue(127)'s seven leading zero bits -> the RBSP holds
            # a literal 00 00 01, so the emulation-prevention escape
            # and the parser's unescape BOTH execute
            level = 0
            sps = encode_sps(profile, 0, w_mbs, h_units, crop, sps_id=127)
        sc = b"\x00\x00\x00\x01"
        stream = bytearray()
        stream += sc + sps
        stream += sc + b"\x68" + bytes([0x45] * 3)  # PPS
        if i % 2:
            stream += sc + b"\x66" + bytes([0x51] * 4)  # SEI
        stream += sc + b"\x65" + bytes(
            0x41 + ((i + k) % 63) for k in range(20)
        )  # IDR
        for s in range(3 + i):
            stream += b"\x00\x00\x01" + b"\x61" + bytes(
                0x41 + ((i + s + k) % 63) for k in range(10 + s)
            )
        blob = bytes(stream)
        if i == 3:
            blob = b"\x55" * 5 + blob
        rows.append((i, "video", blob))
    rows.append((n - 1, "video", b"\x21\x22\x23" * 20))
    return spark.createDataFrame(
        rows, "media_id bigint, kind string, content binary"
    )
