"""Baseline JPEG codec (stdlib ``struct`` + numpy only).

Round 7 closes the last big ``_decode_stub`` class with real-world
weight: most scraped images are JPEG.  Same playbook as the PNG / WAV /
AVI codecs in ``operators/multimodal.py`` — a spec-correct, dependency-
free implementation of the subset that matters, loud errors beyond it:

  * baseline sequential DCT (SOF0), Huffman entropy coding with the
    ITU-T T.81 Annex K tables,
  * grayscale (1 component) and YCbCr 4:4:4, 4:2:0 and 4:2:2 —
    arbitrary integer-ratio sampling factors on decode with
    nearest-neighbor chroma upsample (r8: 4:2:0 is the dominant
    wild-JPEG layout, so the honest stdlib path now covers the
    common case),
  * restart markers (DRI/RSTn) honored on decode,
  * progressive DCT (SOF2, r8): decode supports full spectral
    selection AND successive approximation (the T.81 G.2 scan
    algebra, incl. the G.1.2.3 AC-refinement correction bits and
    EOBn runs); encode emits spectral-selection scans — with
    baseline + 4:2:0 + progressive, the stdlib path now covers
    essentially all wild Huffman JPEGs,
  * arithmetic coding, hierarchical mode and 12-bit precision raise
    ``ValueError`` rather than guessing.

Exactness story for oracle-checked queries: with a FLAT quantization
table (all ones) an image built of constant 8x8 tiles is bit-exact
through encode→decode — a constant block's DCT is DC-only and integer
(F00 = 8*(v-128)), quantization divides by 1, and the IDCT of a DC-only
block reconstructs v exactly.  ``tile_jpeg_media`` builds such fixtures
with closed-form channel means, which is what ``q_jpeg_features`` pins
cross-engine (the same design as the PNG/AVI gradient fixtures).

The Huffman bitstream walk is sequential per block (inherent to JPEG),
in Python — fine for fixture-scale tests; a production deployment swaps
``decode_jpeg`` for libjpeg via Pillow behind the SAME ``image_stats``
mapInPandas plumbing, which is the part that matters at 100 TB (binary
never shuffles; only compact stats leave the scan stage).
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants: zigzag, Annex K quantization + Huffman tables -------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

FLAT_QUANT = np.ones(64, dtype=np.int64)

# ITU-T T.81 Annex K.1/K.2 example quantization tables (natural order)
STD_LUMA_QUANT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
STD_CHROMA_QUANT = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _huff_codes(spec: tuple[list[int], list[int]]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol → (length, code)."""
    bits, vals = spec
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(spec: tuple[list[int], list[int]]) -> dict[tuple[int, int], int]:
    return {lc: sym for sym, lc in _huff_codes(spec).items()}


# orthonormal 8x8 DCT-II basis: F = M @ f @ M.T, f = M.T @ F @ M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, stops at markers
    (returns them via ``marker``)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        b = self.buf
        if self.pos >= len(b):
            return False
        byte = b[self.pos]
        if byte == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                # restart marker: caller resets predictors via sync()
                self.marker = nxt
                return False
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._nbits += 8
        return True

    def bit(self) -> int:
        if self._nbits == 0 and not self._fill():
            raise ValueError("JPEG bitstream truncated")
        self._nbits -= 1
        v = (self._acc >> self._nbits) & 1
        # drop consumed bits so _acc stays bounded and decode stays
        # linear in entropy-stream length (mirrors _BitWriter.write)
        self._acc &= (1 << self._nbits) - 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Consume the pending RSTn marker and realign to a byte."""
        assert self.marker is not None and 0xD0 <= self.marker <= 0xD7
        self.pos += 2
        self._acc = 0
        self._nbits = 0
        self.marker = None


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits): negative values use the one's-
    complement form the spec mandates."""
    cat = _category(v)
    if v < 0:
        v += (1 << cat) - 1
    return cat, v


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    if v < (1 << (cat - 1)):
        return v - (1 << cat) + 1
    return v


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r = arr[..., 0].astype(np.float64)
    g = arr[..., 1].astype(np.float64)
    b = arr[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(
        np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255
    ).astype(np.uint8)


def _ycbcr_to_rgb(arr: np.ndarray) -> np.ndarray:
    y = arr[..., 0].astype(np.float64)
    cb = arr[..., 1].astype(np.float64) - 128.0
    cr = arr[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) → (n_blocks_y, n_blocks_x, 8, 8), edge-replicated padding."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    )


def encode_jpeg(
    arr: np.ndarray,
    quant: np.ndarray | str = "flat",
    restart_interval: int = 0,
    subsample: str = "444",
    progressive: bool = False,
) -> bytes:
    """Baseline-sequential JPEG encoder for uint8 ``(h, w)`` grayscale
    or ``(h, w, 3)`` RGB arrays.

    ``quant``: ``"flat"`` (all-ones tables — lossless for constant 8x8
    tiles, the fixture mode), ``"std"`` (Annex K example tables — real
    lossy compression), or a caller-provided 64-entry natural-order
    table used for every component.  ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every that many MCUs (exercises the
    decoder's predictor-reset path; real scrapes contain DRI streams).
    ``subsample``: ``"444"`` (no chroma subsampling), ``"420"`` (2x2
    luma sampling — the dominant wild-JPEG layout) or ``"422"`` (2x1);
    chroma planes are box-averaged, so constant 16x16 (420) / 16x8
    (422) tiles survive bit-exact under flat quantization (the same
    closed-form-fixture argument as 4:4:4 constant 8x8 tiles).
    ``progressive`` (r8) emits SOF2 with spectral-selection scans (one
    interleaved DC scan, then per-component AC 1-63 scans with EOB0
    block ends — the Annex K tables carry no EOBn>1 symbols, and a
    run of EOB0s is spec-legal); same coefficients as baseline, so
    flat-quant fixtures stay bit-exact through the progressive path
    too.  ``restart_interval`` applies to baseline only.
    """
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects uint8 (h, w) or (h, w, 3)")
    if progressive and restart_interval:
        raise ValueError(
            "progressive encoder does not emit restart markers"
        )
    if arr.ndim == 3 and arr.shape[2] != 3:
        raise ValueError("encode_jpeg expects 3 channels for color")
    h, w = arr.shape[:2]
    gray = arr.ndim == 2
    if isinstance(quant, str):
        if quant == "flat":
            qtabs = [FLAT_QUANT, FLAT_QUANT]
        elif quant == "std":
            qtabs = [STD_LUMA_QUANT, STD_CHROMA_QUANT]
        else:
            raise ValueError(f"unknown quant mode: {quant}")
    else:
        q = np.asarray(quant, dtype=np.int64).reshape(64)
        qtabs = [q, q]
    if gray:
        samp = [(1, 1)]
    elif subsample == "444":
        samp = [(1, 1)] * 3
    elif subsample == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    elif subsample == "422":
        samp = [(2, 1), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unknown subsample mode: {subsample}")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    full = (
        [arr.astype(np.float64)]
        if gray
        else [ _rgb_to_ycbcr(arr)[..., i].astype(np.float64) for i in range(3) ]
    )
    # pad full-res planes to whole MCUs (edge replicate keeps constant
    # tiles constant), then box-average each component down to its
    # sampling-factor resolution
    ph = -(-h // (8 * vmax)) * 8 * vmax
    pw = -(-w // (8 * hmax)) * 8 * hmax
    planes = []
    for (hi, vi), plane in zip(samp, full):
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:
            p = np.rint(
                p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
            )
        planes.append(p)
    dc_specs = [DC_LUMA_SPEC] + ([] if gray else [DC_CHROMA_SPEC] * 2)
    ac_specs = [AC_LUMA_SPEC] + ([] if gray else [AC_CHROMA_SPEC] * 2)
    dc_codes = [_huff_codes(s) for s in dc_specs]
    ac_codes = [_huff_codes(s) for s in ac_specs]
    comp_q = [0] + ([] if gray else [1, 1])

    # forward DCT + quantization per component, natural order
    comp_coeffs = []
    for ci, plane in enumerate(planes):
        blk = _blocks(plane) - 128.0
        coef = np.einsum("ux,byxv,wv->byuw", _M, blk, _M, optimize=True)
        # np.einsum above: F = M @ f @ M.T per block
        q = qtabs[comp_q[ci]].reshape(8, 8).astype(np.float64)
        comp_coeffs.append(
            np.rint(coef / q).astype(np.int64)
        )

    # entropy-coded segment: MCU = hi x vi blocks per component, in
    # component order then raster sub-block order (T.81 A.2.3)
    nmy, nmx = ph // (8 * vmax), pw // (8 * hmax)
    zz = ZIGZAG

    def _write_ac_run(bw2, codes, block, lo, hi_k):
        """Run-length/size-code the band [lo, hi_k] of a zigzag block;
        returns True if an explicit EOB is needed (trailing zeros)."""
        nz = np.nonzero(block[lo:hi_k + 1])[0]
        last = (nz[-1] + lo) if nz.size else lo - 1
        run = 0
        for k in range(lo, last + 1):
            v = int(block[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = codes[0xF0]  # ZRL
                bw2.write(code, ln)
                run -= 16
            cat, mag = _encode_magnitude(v)
            ln, code = codes[(run << 4) | cat]
            bw2.write(code, ln)
            bw2.write(mag, cat)
            run = 0
        return last < hi_k

    if progressive:
        # scan 1: interleaved DC (all components); then per-component
        # AC 1-63 scans in component-raster (non-interleaved) order
        scans: list[tuple[bytes, bytes]] = []
        bw = _BitWriter()
        pred = [0] * len(planes)
        for my in range(nmy):
            for mx in range(nmx):
                for ci in range(len(planes)):
                    hi, vi = samp[ci]
                    for by2 in range(vi):
                        for bx2 in range(hi):
                            dc = int(
                                comp_coeffs[ci][
                                    my * vi + by2, mx * hi + bx2
                                ].reshape(64)[zz][0]
                            )
                            diff = dc - pred[ci]
                            pred[ci] = dc
                            cat, mag = _encode_magnitude(diff)
                            ln, code = dc_codes[ci][cat]
                            bw.write(code, ln)
                            bw.write(mag, cat)
        bw.flush()
        sos1 = bytes([len(planes)])
        for ci in range(len(planes)):
            tid = 0 if ci == 0 else 1
            sos1 += bytes([ci + 1, (tid << 4) | 0])  # DC table only
        sos1 += bytes([0, 0, 0])  # Ss=0 Se=0 Ah=Al=0
        scans.append((sos1, bytes(bw.out)))
        for ci in range(len(planes)):
            bw = _BitWriter()
            nby, nbx = comp_coeffs[ci].shape[:2]
            codes = ac_codes[ci]
            for by in range(nby):
                for bx in range(nbx):
                    block = comp_coeffs[ci][by, bx].reshape(64)[zz]
                    need_eob = _write_ac_run(bw, codes, block, 1, 63)
                    if need_eob:
                        ln, code = codes[0x00]  # EOB0
                        bw.write(code, ln)
            bw.flush()
            tid = 0 if ci == 0 else 1
            sosn = bytes([1, ci + 1, (0 << 4) | tid, 1, 63, 0])
            scans.append((sosn, bytes(bw.out)))
    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu = 0
    for my in range(0 if progressive else nmy):
        for mx in range(nmx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out.extend(
                    bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
                )
                pred = [0] * len(planes)
            mcu += 1
            for ci in range(len(planes)):
                hi, vi = samp[ci]
                for by2 in range(vi):
                    for bx2 in range(hi):
                        block = comp_coeffs[ci][
                            my * vi + by2, mx * hi + bx2
                        ].reshape(64)[zz]
                        diff = int(block[0]) - pred[ci]
                        pred[ci] = int(block[0])
                        cat, mag = _encode_magnitude(diff)
                        ln, code = dc_codes[ci][cat]
                        bw.write(code, ln)
                        bw.write(mag, cat)
                        run = 0
                        nz = np.nonzero(block[1:])[0]
                        last = nz[-1] + 1 if nz.size else 0
                        for k in range(1, last + 1):
                            v = int(block[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_codes[ci][0xF0]  # ZRL
                                bw.write(code, ln)
                                run -= 16
                            cat, mag = _encode_magnitude(v)
                            ln, code = ac_codes[ci][(run << 4) | cat]
                            bw.write(code, ln)
                            bw.write(mag, cat)
                            run = 0
                        if last < 63:
                            ln, code = ac_codes[ci][0x00]  # EOB
                            bw.write(code, ln)
    bw.flush()

    # markers
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    n_q = 1 if gray else 2
    for t in range(n_q):
        zzq = qtabs[t][zz]
        seg(0xDB, bytes([t]) + bytes(int(x) for x in zzq))  # DQT
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, comp_q[ci]])
    seg(0xC2 if progressive else 0xC0, sof)  # SOF2 / SOF0

    def dht(cls: int, tid: int, spec: tuple[list[int], list[int]]) -> None:
        bits, vals = spec
        seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    dht(0, 0, DC_LUMA_SPEC)
    dht(1, 0, AC_LUMA_SPEC)
    if not gray:
        dht(0, 1, DC_CHROMA_SPEC)
        dht(1, 1, AC_CHROMA_SPEC)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    if progressive:
        for sos_payload, entropy in scans:
            seg(0xDA, sos_payload)
            out.extend(entropy)
    else:
        sos = bytes([ncomp])
        for ci in range(ncomp):
            tid = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tid << 4) | tid])
        sos += bytes([0, 63, 0])
        seg(0xDA, sos)
        out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def _skip_to_marker(blob: bytes, pos: int) -> int:
    """Advance past entropy bytes/padding to the next real marker
    (skipping stuffed FF00 and stray RSTn)."""
    n = len(blob)
    while pos + 1 < n:
        if blob[pos] == 0xFF and blob[pos + 1] != 0x00 and not (
            0xD0 <= blob[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return n


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _decode_progressive(
    blob: bytes,
    pos: int,
    first_sos: bytes,
    sof: tuple[int, int, int],
    comps: list[tuple[int, int, int, int]],
    qtabs: dict[int, np.ndarray],
    huff: dict[tuple[int, int], dict[tuple[int, int], int]],
    restart_interval: int,
) -> np.ndarray:
    """Progressive-DCT decode (ITU-T T.81 G.2, r8): accumulate
    coefficients across every scan — DC first/refinement, AC spectral
    bands with EOBn runs, AC successive-approximation refinement (the
    G.1.2.3 correction-bit algorithm) — then dequantize + IDCT once.
    Supports interleaved DC scans, per-component AC scans, restart
    markers (MCU units for interleaved scans, data units otherwise),
    and DHT/DRI updates between scans.  Most wild progressive files
    use both spectral selection and successive approximation; both
    paths here roundtrip against hand-built streams and parity-check
    against the baseline decoder in pytest."""
    h, w, nc = sof
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    for _, _, hi, vi in comps:
        if hmax % hi or vmax % vi:
            raise ValueError("non-integer JPEG sampling ratio unsupported")
    nmy, nmx = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    # per-component non-interleaved block grids (T.81 A.2.2)
    grids = []
    for _, _, hi, vi in comps:
        cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
        grids.append((-(-ch // 8), -(-cw // 8)))
    # coefficient store in zigzag order; MCU grid is always >= the
    # non-interleaved grid, so size by MCUs
    coefs = [
        np.zeros((nmy * vi, nmx * hi, 64), dtype=np.int64)
        for _, _, hi, vi in comps
    ]
    pred = [0] * nc

    def decode_scan(payload: bytes, start: int) -> int:
        nonlocal restart_interval
        ns = payload[0]
        sel: list[tuple[int, int, int]] = []
        for i in range(ns):
            cid, tids = payload[1 + 2 * i], payload[2 + 2 * i]
            matches = [j for j, c in enumerate(comps) if c[0] == cid]
            if not matches:
                raise ValueError(
                    f"JPEG SOS references unknown component id {cid}"
                )
            sel.append((matches[0], tids >> 4, tids & 0xF))
        ss, se, ahal = (
            payload[1 + 2 * ns], payload[2 + 2 * ns], payload[3 + 2 * ns]
        )
        ah, al = ahal >> 4, ahal & 0xF
        br = _BitReader(blob, start)
        eobrun = 0
        for ci, _, _ in sel:
            pred[ci] = 0

        def maybe_restart(unit: int) -> None:
            nonlocal eobrun
            if restart_interval and unit and unit % restart_interval == 0:
                while br.marker is None:
                    try:
                        br.bit()
                    except ValueError:
                        break
                if br.marker is not None and 0xD0 <= br.marker <= 0xD7:
                    br.sync_restart()
                    for ci, _, _ in sel:
                        pred[ci] = 0
                    eobrun = 0

        def dc_block(ci: int, dc_tid: int, by: int, bx: int) -> None:
            block = coefs[ci][by, bx]
            if ah == 0:  # first pass
                cat = _read_symbol(br, huff[(0, dc_tid)])
                diff = _extend(br.bits(cat), cat) if cat else 0
                pred[ci] += diff
                block[0] = pred[ci] << al
            else:  # refinement: one bit per block
                if br.bit():
                    block[0] |= 1 << al

        def ac_first(ci: int, ac_tid: int, by: int, bx: int) -> None:
            nonlocal eobrun
            block = coefs[ci][by, bx]
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            table = huff[(1, ac_tid)]
            while k <= se:
                rs = _read_symbol(br, table)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        return
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run overflows band")
                block[k] = _extend(br.bits(s), s) << al
                k += 1

        def ac_refine(ci: int, ac_tid: int, by: int, bx: int) -> None:
            # T.81 G.1.2.3 correction-bit algorithm
            nonlocal eobrun
            block = coefs[ci][by, bx]
            p1, m1 = 1 << al, -(1 << al)
            k = ss
            table = huff[(1, ac_tid)]
            if eobrun == 0:
                while k <= se:
                    rs = _read_symbol(br, table)
                    r, s = rs >> 4, rs & 0xF
                    val = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        # r == 15: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid AC refinement magnitude"
                            )
                        val = p1 if br.bit() else m1
                    while k <= se:
                        if block[k] != 0:
                            if br.bit() and (block[k] & p1) == 0:
                                block[k] += p1 if block[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        block[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    if block[k] != 0:
                        if br.bit() and (block[k] & p1) == 0:
                            block[k] += p1 if block[k] >= 0 else m1
                    k += 1
                eobrun -= 1

        if ss == 0:  # DC scan (se must be 0 for progressive)
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            if ns > 1:  # interleaved MCU walk
                mcu = 0
                for my in range(nmy):
                    for mx in range(nmx):
                        maybe_restart(mcu)
                        mcu += 1
                        for ci, dc_tid, _ in sel:
                            hi, vi = comps[ci][2], comps[ci][3]
                            for by2 in range(vi):
                                for bx2 in range(hi):
                                    dc_block(
                                        ci, dc_tid,
                                        my * vi + by2, mx * hi + bx2,
                                    )
            else:
                ci, dc_tid, _ = sel[0]
                nby, nbx = grids[ci]
                unit = 0
                for by in range(nby):
                    for bx in range(nbx):
                        maybe_restart(unit)
                        unit += 1
                        dc_block(ci, dc_tid, by, bx)
        else:  # AC scan: always single-component, non-interleaved
            if ns != 1:
                raise ValueError("progressive AC scan must be 1-component")
            ci, _, ac_tid = sel[0]
            nby, nbx = grids[ci]
            unit = 0
            for by in range(nby):
                for bx in range(nbx):
                    maybe_restart(unit)
                    unit += 1
                    if ah == 0:
                        ac_first(ci, ac_tid, by, bx)
                    else:
                        ac_refine(ci, ac_tid, by, bx)
        return _skip_to_marker(blob, br.pos)

    pos = decode_scan(first_sos, pos)
    # remaining marker stream: DHT/DRI updates and further scans
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynchronized")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        payload = blob[pos + 4:pos + 2 + length]
        pos += 2 + length
        if marker == 0xC4:
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                huff[(cls, tid)] = _huff_decode_map((bits, vals))
                p += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:
            pos = decode_scan(payload, pos)
        # APPn/COM: ignored

    # reconstruct: dequantize + IDCT per block, then upsample + crop
    zz = ZIGZAG
    planes = []
    for ci, (_, qid, hi, vi) in enumerate(comps):
        nby, nbx = nmy * vi, nmx * hi
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        q = qtabs[qid]
        for by in range(nby):
            for bx in range(nbx):
                nat = np.zeros(64, dtype=np.int64)
                nat[zz] = coefs[ci][by, bx]
                coef = (nat * q).reshape(8, 8)
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    _M.T @ coef.astype(np.float64) @ _M + 128.0
                )
        fy, fx = vmax // vi, hmax // hi
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane)
    out = np.clip(
        np.rint(np.stack(planes, axis=-1)), 0, 255
    ).astype(np.uint8)[:h, :w]
    if nc == 1:
        return out[..., 0]
    return _ycbcr_to_rgb(out)


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline-sequential JPEG decoder: marker walk → Huffman-decoded
    MCUs → dequantize → IDCT → level shift → (YCbCr→RGB) → crop.
    Returns uint8 ``(h, w)`` for grayscale or ``(h, w, 3)`` RGB.
    Handles any integer-ratio sampling-factor layout (4:4:4, 4:2:0,
    4:2:2, ...) with nearest-neighbor chroma upsampling, and (r8)
    progressive streams (SOF2) with full spectral selection AND
    successive approximation — see ``_decode_progressive``; raises
    ``ValueError`` on arithmetic/hierarchical/12-bit streams instead
    of guessing."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    comps: list[tuple[int, int, int, int]] = []  # (comp_id, qid, hi, vi)
    scan: list[tuple[int, int, int]] = []  # (comp_idx, dc_tid, ac_tid)
    restart_interval = 0
    progressive = False
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynchronized")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        payload = blob[pos + 4:pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tid = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(
                    payload[p + 1:p + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tid] = tab
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                huff[(cls, tid)] = _huff_decode_map((bits, vals))
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            for i in range(nc):
                cid, sampb, qid = payload[6 + 3 * i:9 + 3 * i]
                hi, vi = sampb >> 4, sampb & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"invalid JPEG sampling factors {hi}x{vi}"
                    )
                comps.append((cid, qid, hi, vi))
            sof = (h, w, nc)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            if progressive:
                if sof is None:
                    raise ValueError("JPEG missing SOF")
                return _decode_progressive(
                    blob, pos, payload, sof, comps, qtabs, huff,
                    restart_interval,
                )
            ns = payload[0]
            for i in range(ns):
                cid, tids = payload[1 + 2 * i], payload[2 + 2 * i]
                matches = [
                    j for j, c in enumerate(comps) if c[0] == cid
                ]
                if not matches:
                    raise ValueError(
                        f"JPEG SOS references unknown component id {cid}"
                    )
                scan.append((matches[0], tids >> 4, tids & 0xF))
            break
    if sof is None or not scan:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, nc = sof
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    for _, _, hi, vi in comps:
        if hmax % hi or vmax % vi:
            raise ValueError(
                "non-integer JPEG sampling ratio unsupported"
            )
    nmy, nmx = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    br = _BitReader(blob, pos)
    planes = [
        np.zeros((nmy * vi * 8, nmx * hi * 8), dtype=np.float64)
        for _, _, hi, vi in comps
    ]
    pred = [0] * nc
    zz = ZIGZAG

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | br.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    mcu = 0
    for my in range(nmy):
        for mx in range(nmx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # skip to the RSTn marker boundary
                while br.marker is None:
                    try:
                        br.bit()
                    except ValueError:
                        break
                if br.marker is not None and 0xD0 <= br.marker <= 0xD7:
                    br.sync_restart()
                    pred = [0] * nc
            mcu += 1
            for ci, dc_tid, ac_tid in scan:
                hi, vi = comps[ci][2], comps[ci][3]
                for by2 in range(vi):
                    for bx2 in range(hi):
                        block = np.zeros(64, dtype=np.int64)
                        cat = read_symbol(huff[(0, dc_tid)])
                        diff = _extend(br.bits(cat), cat) if cat else 0
                        pred[ci] += diff
                        block[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = read_symbol(huff[(1, ac_tid)])
                            if sym == 0x00:  # EOB
                                break
                            run, cat = sym >> 4, sym & 0xF
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflows block")
                            block[k] = _extend(br.bits(cat), cat)
                            k += 1
                        nat = np.zeros(64, dtype=np.int64)
                        nat[zz] = block
                        coef = (nat * qtabs[comps[ci][1]]).reshape(8, 8)
                        pix = (
                            _M.T @ coef.astype(np.float64) @ _M + 128.0
                        )
                        by = my * vi + by2
                        bx = mx * hi + bx2
                        planes[ci][
                            by * 8:by * 8 + 8, bx * 8:bx * 8 + 8
                        ] = pix
    # nearest-neighbor upsample subsampled components to full MCU grid
    up = []
    for (_, _, hi, vi), plane in zip(comps, planes):
        fy, fx = vmax // vi, hmax // hi
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        up.append(plane)
    out = np.clip(
        np.rint(np.stack(up, axis=-1)), 0, 255
    ).astype(np.uint8)[:h, :w]
    if nc == 1:
        return out[..., 0]
    return _ycbcr_to_rgb(out)


def parse_jpeg_header(blob: bytes) -> tuple[int, int, int] | None:
    """(height, width, n_components) from SOF0/1, or None if not a
    baseline JPEG — the cheap probe for ``parse_media_header``."""
    if blob[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            return None
        marker = blob[pos + 1]
        if marker in (0xD9, 0xDA):
            return None
        (length,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        if marker in (0xC0, 0xC1):
            _, h, w, nc = struct.unpack(">BHHB", blob[pos + 4:pos + 10])
            return h, w, nc
        pos += 2 + length
    return None
