"""RoaringBitmap deletion-vector codec for the Delta Lake protocol.

Delta serializes per-file deletion vectors (the set of deleted row
indexes) as a 64-bit **RoaringBitmapArray** in its "portable" format,
wrapped either inline in the ``add`` action (Z85 text) or in a
sidecar ``deletion_vector_<uuid>.bin`` file.  All formats are public:

  * Delta PROTOCOL.md "Deletion Vectors" — the ``deletionVector``
    struct (``storageType`` 'u' UUID-file / 'i' inline / 'p' absolute
    path, ``pathOrInlineDv``, ``offset``, ``sizeInBytes``,
    ``cardinality``), the DV file layout (1-byte format version, then
    per-DV ``<int32 BE size><bitmap bytes><int32 BE CRC-32>``), and
    the bitmap payload: a little-endian int32 magic ``1681511377``
    followed by the RoaringBitmapArray portable serialization.
  * RoaringBitmapArray portable = ``<int64 LE bitmap count>`` then
    each 32-bit bitmap (key = array index = high 32 bits of the row
    index) in the standard interoperable 32-bit format.
  * 32-bit portable format (github.com/RoaringBitmap/RoaringFormatSpec):
    cookie 12346 (no run containers: ``<int32 LE cookie><int32 LE
    container count>``) or 12347 (``cookie | (count-1)<<16`` plus a
    run-flag bitset), a descriptive header of ``<uint16 key><uint16
    cardinality-1>`` pairs, an offset table (always for cookie 12346,
    for ≥4 containers under 12347), then the containers: sorted
    uint16 arrays (cardinality ≤ 4096), 8 KiB bitsets, or
    ``<uint16 run count>`` + ``<uint16 start><uint16 length-1>`` runs.
  * Z85 (ZeroMQ RFC 32) — 4 bytes → 5 chars over an 85-char alphabet;
    Delta pads the payload with zeros to a multiple of 4 and records
    the true length in ``sizeInBytes``.

The decoder accepts everything a conforming engine may emit (both
cookies, all three container kinds); the encoder emits the simplest
conforming form (cookie 12346, array/bitset containers), the same
choice delta-spark's own ``RoaringBitmapArray.serializeAsByteArray``
makes for fresh DVs.

Scale posture: a DV is per-file METADATA (delta-spark materializes
the same bitmaps on its scan driver before pushing row-skipping into
the reader); everything here is O(deleted rows of one file) and runs
driver-side, after which masking is a distributed broadcast anti-join
(see sources/delta.py).

Reference tie-in: artis-data-ingest's cleaning passes drop rows from
upstream snapshots wholesale (clean_fao.qmd filters); DVs are the
lake-native row-drop encoding this repo must honour to read modern
Delta tables at all.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = 1681511377  # little-endian int32 prefix of every DV payload
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4  # cookie-12347 bitmaps ≥ this carry offsets

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """Z85-encode ``data`` (padded with zeros to a multiple of 4, per
    Delta's Base85 codec; callers record the true length)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        (n,) = struct.unpack(">I", data[i:i + 4])
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, length: int | None = None) -> bytes:
    """Decode Z85 text; ``length`` truncates the zero padding Delta's
    encoder added (``sizeInBytes``)."""
    if len(text) % 5:
        raise ValueError(f"Z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for ch in text[i:i + 5]:
            try:
                n = n * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"invalid Z85 character {ch!r}") from None
        if n > 0xFFFFFFFF:
            raise ValueError("Z85 group overflows 32 bits")
        out += struct.pack(">I", n)
    return bytes(out[:length]) if length is not None else bytes(out)


# ---------------------------------------------------------------------------
# 32-bit roaring bitmap (one array entry of the 64-bit RoaringBitmapArray)
# ---------------------------------------------------------------------------


def _serialize_bitmap32(values) -> bytes:
    """Sorted uint32 values → standard portable serialization (cookie
    12346; array containers ≤4096 cardinality, bitsets above)."""
    import numpy as np

    values = np.asarray(values, dtype=np.uint32)
    keys = (values >> 16).astype(np.uint16)
    lows = (values & 0xFFFF).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(values)]
    containers: list[tuple[int, int, bytes]] = []  # (key, card, payload)
    for i, k in enumerate(uniq_keys):
        vals = lows[bounds[i]:bounds[i + 1]]
        card = len(vals)
        if card <= 4096:
            payload = vals.astype("<u2").tobytes()
        else:
            bits = np.zeros(65536, dtype=bool)
            bits[vals] = True
            payload = np.packbits(bits, bitorder="little").tobytes()
        containers.append((int(k), card, payload))

    head = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(containers))
    desc = b"".join(
        struct.pack("<HH", k, card - 1) for k, card, _ in containers
    )
    # offsets are from the START of this bitmap's serialization
    base = len(head) + len(desc) + 4 * len(containers)
    offsets, blobs, pos = [], [], base
    for _, _, payload in containers:
        offsets.append(struct.pack("<I", pos))
        blobs.append(payload)
        pos += len(payload)
    return head + desc + b"".join(offsets) + b"".join(blobs)


def _deserialize_bitmap32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one 32-bit bitmap at ``buf[pos:]`` → (values, next pos)."""
    import numpy as np

    (cookie,) = struct.unpack_from("<i", buf, pos)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = ((cookie >> 16) & 0xFFFF) + 1
        pos += 4
        nflag = (n + 7) // 8
        run_flags = buf[pos:pos + nflag]
        pos += nflag
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    desc = struct.unpack_from(f"<{2 * n}H", buf, pos)
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # sequential parse; offsets are redundant
    values: list[int] = []
    for i in range(n):
        key, card = desc[2 * i], desc[2 * i + 1] + 1
        hi = key << 16
        if run_flags[i // 8] & (1 << (i % 8)):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = struct.unpack_from(f"<{2 * n_runs}H", buf, pos)
            pos += 4 * n_runs
            for j in range(n_runs):
                start, rlen = runs[2 * j], runs[2 * j + 1]
                values.extend(hi | v for v in range(start, start + rlen + 1))
        elif card > 4096:
            bits = np.frombuffer(buf, dtype=np.uint8,
                                 count=8192, offset=pos)
            pos += 8192
            idx = np.nonzero(
                np.unpackbits(bits, bitorder="little")
            )[0]
            if len(idx) != card:
                raise ValueError(
                    f"bitset container cardinality {len(idx)} != {card}"
                )
            values.extend(int(hi | v) for v in idx)
        else:
            arr = np.frombuffer(buf, dtype="<u2", count=card, offset=pos)
            pos += 2 * card
            values.extend(int(hi | v) for v in arr)
    return values, pos


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (the DV payload behind the magic number)
# ---------------------------------------------------------------------------


def serialize_dv(positions) -> bytes:
    """Sorted row indexes → DV payload bytes (magic + portable
    RoaringBitmapArray), the exact bytes ``sizeInBytes`` measures."""
    import numpy as np

    positions = np.asarray(sorted(set(int(p) for p in positions)),
                           dtype=np.uint64)
    if len(positions) == 0:
        raise ValueError("deletion vector must delete at least one row")
    highs = (positions >> np.uint64(32)).astype(np.uint32)
    n_maps = int(highs.max()) + 1
    out = [struct.pack("<i", MAGIC), struct.pack("<q", n_maps)]
    for k in range(n_maps):
        vals = (positions[highs == k] & np.uint64(0xFFFFFFFF)).astype(
            np.uint32
        )
        out.append(_serialize_bitmap32(vals))
    return b"".join(out)


def deserialize_dv(data: bytes) -> list[int]:
    """DV payload bytes → sorted deleted row indexes."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad DV magic {magic} (want {MAGIC})")
    (n_maps,) = struct.unpack_from("<q", data, 4)
    pos, values = 12, []
    for k in range(n_maps):
        vals, pos = _deserialize_bitmap32(data, pos)
        values.extend((k << 32) | v for v in vals)
    return values


# ---------------------------------------------------------------------------
# DV file wrapper (storageType 'u' / 'p')
# ---------------------------------------------------------------------------


def read_dv_entry(path: str, offset: int, size_in_bytes: int) -> bytes:
    """Read one DV's payload from a sidecar ``.bin`` file: seek to
    ``offset``, length-check against the stored int32 BE size, verify
    the trailing CRC-32."""
    with open(path, "rb") as fh:
        head = fh.read(1)
        if not head or head[0] != 1:
            raise ValueError(
                f"unsupported DV file format version "
                f"{head[0] if head else 'EOF'} in {path}"
            )
        fh.seek(offset)
        (stored,) = struct.unpack(">i", fh.read(4))
        if stored != size_in_bytes:
            raise ValueError(
                f"DV size mismatch in {path}@{offset}: file says "
                f"{stored}, add action says {size_in_bytes}"
            )
        data = fh.read(stored)
        (crc,) = struct.unpack(">I", fh.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch in {path}@{offset}")
    return data


def append_dv_entry(path: str, data: bytes) -> int:
    """Append one DV payload to a sidecar file (creating it with the
    version-1 header) → the entry's ``offset``."""
    import os

    new = not os.path.exists(path)
    with open(path, "ab") as fh:
        if new:
            fh.write(b"\x01")
        offset = fh.tell()
        fh.write(struct.pack(">i", len(data)))
        fh.write(data)
        fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return offset
