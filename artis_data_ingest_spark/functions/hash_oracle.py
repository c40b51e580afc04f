"""DuckDB SQL generators that reproduce Spark's hash functions bit-exactly.

Purpose: the MinHash (`q_minhash_neardup`) and SimHash
(`q_simhash_neardup`) production queries hash with Spark's built-ins —
``F.hash`` (Murmur3_x86_32, seed 42, Spark's byte-at-a-time tail
variant) and ``F.xxhash64`` (XXH64, seed 42).  Those were the last two
queries without a value-hash oracle ("rows-only" since round 1): the
hash family is engine-specific, so no straightforward SQL reproduces
the candidate sets.  This module closes that gap by *generating* DuckDB
SQL that evaluates the same algorithms bit-for-bit, using

  * BIGINT for 32-bit lanes (every intermediate < 2^47 except the two
    Murmur3 multiplies, which route through HUGEINT ``% 2^32``),
  * HUGEINT as an unsigned-64 carrier for XXH64 (DuckDB's ``xor``
    accepts HUGEINT; shifts become ``* 2^r % 2^64`` / ``// 2^r``;
    64x64 wrapping multiplication splits the left operand into 32-bit
    halves so no intermediate exceeds ~2^97 < HUGEINT max),
  * Java/Spark ``%`` (sign-follows-dividend) matching DuckDB's ``%``.

Both generators are pinned against Spark itself in
tests/test_hash_oracle.py (random strings + the fixture corpus) and
against a pure-Python reference.  Scope notes, both matching the Spark
semantics actually exercised by the queries:

  * strings are assumed ASCII (the fixture corpus is; non-ASCII would
    need a UTF-8 byte expansion — Spark hashes UTF-8 bytes, and
    ``unicode(substring(s,i,1))`` reads codepoints);
  * the XXH64 generator implements the sub-32-byte path only (no
    32-byte stripe accumulators — whitespace tokens in the corpus max
    out at 8 bytes; a test pins the bound).

Composition rule learned the hard way: NEVER substitute one generated
expression into another that references it more than once.  ``_fmix32``
re-references its input 8x and ``_mul64`` 3x, so textual nesting — or
DuckDB lateral column aliases, which the binder expands textually —
explodes exponentially (a 4-element hashLong chain passed 10^6 nodes
and hung the binder).  The safe carriers are (a) ``list_reduce`` with a
fixed-size lambda body (variables are not expanded) and (b) nested
subquery LAYERS where each step is a column referencing the child
projection.
"""

from __future__ import annotations

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 4294967295  # mask
_W32 = 4294967296  # 2^32
_W64 = 18446744073709551616  # 2^64

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


# --------------------------------------------------------------------------
# 32-bit lane helpers (operands are nonneg BIGINT < 2^32)
# --------------------------------------------------------------------------


def _mul32(a: str, c: int) -> str:
    """(a * c) mod 2^32 via HUGEINT (a < 2^32, c a 32-bit constant)."""
    return f"CAST((CAST({a} AS HUGEINT) * {c}) % {_W32} AS BIGINT)"


def _rotl32(v: str, r: int) -> str:
    # v < 2^32 so v << r < 2^63 for r <= 31: plain BIGINT arithmetic
    return f"((({v}) * {1 << r} + ({v}) // {1 << (32 - r)}) % {_W32})"


def _mixk1(k: str) -> str:
    return _mul32(_rotl32(_mul32(k, _C1), 15), _C2)


def _mixh1(h: str, k: str) -> str:
    x = f"xor(CAST({h} AS BIGINT), CAST({k} AS BIGINT))"
    return f"(({_rotl32(x, 13)}) * 5 + 3864292196) % {_W32}"


def _fmix32(h: str, n: str, signed: bool) -> str:
    e = f"xor(CAST({h} AS BIGINT), CAST({n} AS BIGINT))"
    e = f"xor({e}, ({e}) // 65536)"
    e = _mul32(e, 0x85EBCA6B)
    e = f"xor({e}, ({e}) // 8192)"
    e = _mul32(e, 0xC2B2AE35)
    e = f"xor({e}, ({e}) // 65536)"
    if signed:
        e = f"(CASE WHEN ({e}) >= 2147483648 THEN ({e}) - {_W32} ELSE ({e}) END)"
    return e


def murmur3_ascii_sql(s: str, seed: int = 42) -> str:
    """Spark ``F.hash(<string col>)`` for an ASCII string expression:
    4-byte little-endian blocks, then Spark's per-byte tail (each tail
    byte mixK1'd individually), as a single list_reduce."""
    n = f"length({s})"
    blocks = (
        f"[CAST(unicode(substring({s}, 4*i + 1, 1)) AS BIGINT)"
        f" + unicode(substring({s}, 4*i + 2, 1)) * 256"
        f" + unicode(substring({s}, 4*i + 3, 1)) * 65536"
        f" + unicode(substring({s}, 4*i + 4, 1)) * 16777216"
        f" for i in range(0, {n} // 4)]"
    )
    tail = (
        f"[CAST(unicode(substring({s}, p, 1)) AS BIGINT)"
        f" for p in range({n} - ({n} % 4) + 1, {n} + 1)]"
    )
    folded = (
        f"list_reduce(list_prepend(CAST({seed} AS BIGINT), "
        f"list_concat({blocks}, {tail})), "
        f"(h, v) -> {_mixh1('h', _mixk1('v'))})"
    )
    return _fmix32(folded, n, signed=True)


def murmur3_ascii_fixed_sql(byte_exprs: list[str], seed: int = 42) -> str:
    """Unrolled ``murmur3_ascii_sql`` for a FIXED byte count < 4 (the
    3-char MinHash shingle hot path): no list machinery, one flat
    expression per row."""
    if len(byte_exprs) >= 4:
        raise ValueError("fixed form covers the tail-only case (< 4 bytes)")
    h = str(seed)
    for b in byte_exprs:
        h = _mixh1(h, _mixk1(f"CAST({b} AS BIGINT)"))
    return _fmix32(h, str(len(byte_exprs)), signed=True)


def spark_hash_long_chain_sql(list_expr: str, seed: int = 42) -> str:
    """Spark ``F.hash(array(<longs>))`` over a BIGINT[] expression:
    Murmur3 hashLong per element with the running hash as the next
    element's seed, folded with ONE list_reduce whose lambda body is
    fixed-size (textually nesting the chain, or spelling it as lateral
    column aliases, both explode exponentially in DuckDB's binder —
    fmix alone re-references its input 8x per element).  Returns the
    UNSIGNED 32-bit representative (used as a join key only)."""
    low = f"(v & {_M32})"
    # arithmetic >> then mask == Java's (int)(v >>> 32) bits
    high = f"((v >> 32) & {_M32})"
    body = _mixh1("h", _mixk1(low))
    body = _mixh1(body, _mixk1(high))
    body = _fmix32(body, "8", signed=False)
    return (
        f"list_reduce(list_prepend(CAST({seed} AS BIGINT), {list_expr}), "
        f"(h, v) -> {body})"
    )


# --------------------------------------------------------------------------
# 64-bit lane helpers (operands are nonneg HUGEINT < 2^64)
# --------------------------------------------------------------------------


def _mul64(a: str, b: int) -> str:
    """(a * b) mod 2^64 with a < 2^64 variable, b a 64-bit constant.
    Split a into 32-bit halves: a0*b < 2^96 and (a1 * (b mod 2^32))
    mod 2^32 * 2^32 < 2^64 — every intermediate fits HUGEINT."""
    b_lo = b % _W32
    return (
        f"(((({a}) % {_W32}) * CAST({b} AS HUGEINT)"
        f" + (((({a}) // {_W32}) * {b_lo}) % {_W32}) * {_W32})"
        f" % {_W64})"
    )


def _rotl64(v: str, r: int) -> str:
    # v < 2^64; v * 2^r < 2^127 fits HUGEINT for r <= 31 (max used: 31)
    if r > 31:
        raise ValueError("rotl64 shift bound exceeded")
    return f"((({v}) * {1 << r}) % {_W64} + ({v}) // {1 << (64 - r)})"


def _x64(a: str, b: str) -> str:
    return f"xor(CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"


def xxhash64_ascii_sql(s: str, seed: int = 42) -> str:
    """Spark ``F.xxhash64(<string col>)`` for ASCII strings < 32 bytes:
    the XXH64 short path (no stripe accumulators) — 8-byte LE chunks,
    one optional 4-byte chunk, byte tail, avalanche.  Signed BIGINT
    result, bit-identical to Spark (pinned)."""
    n = f"length({s})"

    def byte(p: str) -> str:
        return f"unicode(substring({s}, {p}, 1))"

    chunk8 = (
        "CAST("
        + " + ".join(
            f"{byte(f'8*i + {j + 1}')} * {1 << (8 * j)}" for j in range(8)
        )
        + " AS HUGEINT)"
    )
    chunks8 = f"[{chunk8} for i in range(0, {n} // 8)]"
    # step8: h ^= rotl(k*P2,31)*P1 ; h = rotl(h,27)*P1 + P4
    k8 = _mul64(_rotl64(_mul64("k", _P2), 31), _P1)
    step8 = f"({_mul64(_rotl64(_x64('h', k8), 27), _P1)} + {_P4}) % {_W64}"
    h0 = f"(({seed} + {_P5} + {n}) % {_W64})"
    h = (
        f"list_reduce(list_prepend(CAST({h0} AS HUGEINT), {chunks8}), "
        f"(h, k) -> {step8})"
    )
    # optional 4-byte chunk at position 8*(n//8) + 1 when n % 8 >= 4
    base4 = f"(({n} // 8) * 8)"
    k4 = (
        "CAST("
        + " + ".join(
            f"{byte(f'{base4} + {j + 1}')} * {1 << (8 * j)}" for j in range(4)
        )
        + " AS HUGEINT)"
    )
    with4 = f"({_mul64(_rotl64(_x64('h', _mul64('k', _P1)), 23), _P2)} + {_P3}) % {_W64}"
    h = (
        f"list_reduce(list_prepend(CAST({h} AS HUGEINT), "
        f"CASE WHEN {n} % 8 >= 4 THEN [{k4}] ELSE CAST([] AS HUGEINT[]) END), "
        f"(h, k) -> {with4})"
    )
    # byte tail: positions n - (n % 4) + 1 .. n
    tail = (
        f"[CAST({byte('p')} AS HUGEINT)"
        f" for p in range({n} - ({n} % 4) + 1, {n} + 1)]"
    )
    stepb = _mul64(_rotl64(_x64("h", _mul64("k", _P5)), 11), _P1)
    h = (
        f"list_reduce(list_prepend(CAST({h} AS HUGEINT), {tail}), "
        f"(h, k) -> {stepb})"
    )
    # avalanche
    h = _x64(h, f"({h}) // {1 << 33}")
    h = _mul64(h, _P2)
    h = _x64(h, f"({h}) // {1 << 29}")
    h = _mul64(h, _P3)
    h = _x64(h, f"({h}) // {1 << 32}")
    return (
        f"CAST(CASE WHEN ({h}) >= {1 << 63} THEN ({h}) - {_W64}"
        f" ELSE ({h}) END AS BIGINT)"
    )


def xxhash64_ascii_layers(
    inner_sql: str, s: str, carry_cols: list[str], out: str = "h"
) -> str:
    """``xxhash64_ascii_sql`` restructured as nested subquery layers —
    each mixing phase is a named column of its own projection, so a
    step that references its input several times (``_mul64``: 3x) costs
    column references, not re-expanded expression trees.  Use this form
    when hashing more than a handful of rows.

    ``inner_sql`` is a SELECT producing ``carry_cols`` + the ASCII
    string column ``s``; the result selects ``carry_cols`` + ``out``
    (signed BIGINT, bit-identical to Spark ``F.xxhash64``)."""
    carry = ", ".join(carry_cols)
    seed = 42
    n = f"length({s})"

    def byte(p: str) -> str:
        return f"unicode(substring({s}, {p}, 1))"

    chunk8 = (
        "CAST("
        + " + ".join(
            f"{byte(f'8*i + {j + 1}')} * {1 << (8 * j)}" for j in range(8)
        )
        + " AS HUGEINT)"
    )
    chunks8 = f"[{chunk8} for i in range(0, {n} // 8)]"
    k8 = _mul64(_rotl64(_mul64("k", _P2), 31), _P1)
    step8 = f"({_mul64(_rotl64(_x64('h', k8), 27), _P1)} + {_P4}) % {_W64}"
    h0 = f"CAST(({seed} + {_P5} + {n}) % {_W64} AS HUGEINT)"
    base4 = f"(({n} // 8) * 8)"
    k4 = (
        "CAST("
        + " + ".join(
            f"{byte(f'{base4} + {j + 1}')} * {1 << (8 * j)}" for j in range(4)
        )
        + " AS HUGEINT)"
    )
    with4 = f"({_mul64(_rotl64(_x64('h', _mul64('k', _P1)), 23), _P2)} + {_P3}) % {_W64}"
    tail = (
        f"[CAST({byte('p')} AS HUGEINT)"
        f" for p in range({n} - ({n} % 4) + 1, {n} + 1)]"
    )
    stepb = _mul64(_rotl64(_x64("h", _mul64("k", _P5)), 11), _P1)
    q = f"SELECT {carry}, {s} FROM ({inner_sql})"
    q = (
        f"SELECT {carry}, {s}, "
        f"list_reduce(list_prepend({h0}, {chunks8}), (h, k) -> {step8})"
        f" AS _p1 FROM ({q})"
    )
    q = (
        f"SELECT {carry}, {s}, "
        f"list_reduce(list_prepend(CAST(_p1 AS HUGEINT), "
        f"CASE WHEN {n} % 8 >= 4 THEN [{k4}] ELSE CAST([] AS HUGEINT[]) END), "
        f"(h, k) -> {with4}) AS _p2 FROM ({q})"
    )
    q = (
        f"SELECT {carry}, "
        f"list_reduce(list_prepend(CAST(_p2 AS HUGEINT), {tail}), "
        f"(h, k) -> {stepb}) AS _a0 FROM ({q})"
    )
    q = f"SELECT {carry}, {_x64('_a0', f'_a0 // {1 << 33}')} AS _a1 FROM ({q})"
    q = f"SELECT {carry}, {_mul64('_a1', _P2)} AS _a2 FROM ({q})"
    q = f"SELECT {carry}, {_x64('_a2', f'_a2 // {1 << 29}')} AS _a3 FROM ({q})"
    q = f"SELECT {carry}, {_mul64('_a3', _P3)} AS _a4 FROM ({q})"
    q = f"SELECT {carry}, {_x64('_a4', f'_a4 // {1 << 32}')} AS _a5 FROM ({q})"
    return (
        f"SELECT {carry}, CAST(CASE WHEN _a5 >= {1 << 63} THEN _a5 - {_W64}"
        f" ELSE _a5 END AS BIGINT) AS {out} FROM ({q})"
    )


def murmur3_tail_layers(
    inner_sql: str,
    byte_exprs: list[str],
    carry_cols: list[str],
    out: str = "h",
    seed: int = 42,
) -> str:
    """Spark ``F.hash`` of a FIXED byte count < 4 (the 3-char MinHash
    shingle path) as nested subquery layers: plain 32-bit arithmetic on
    named columns, no per-row list machinery — ~50x faster than the
    ``list_reduce`` string form on shingle-exploded tables.

    ``inner_sql`` must produce ``carry_cols`` plus whatever the
    ``byte_exprs`` reference; result selects ``carry_cols`` + ``out``
    (the signed Java int Spark returns)."""
    if len(byte_exprs) >= 4:
        raise ValueError("tail form covers < 4 bytes")
    carry = ", ".join(carry_cols)
    q = inner_sql
    h = str(seed)
    for i, b in enumerate(byte_exprs):
        q = f"SELECT {carry}, {h if i else str(seed)} AS _h{i}, CAST({b} AS BIGINT) AS _b FROM ({q})"
        q = f"SELECT {carry}, _h{i}, {_mul32('_b', _C1)} AS _k FROM ({q})"
        q = f"SELECT {carry}, _h{i}, {_rotl32('_k', 15)} AS _k FROM ({q})"
        q = f"SELECT {carry}, _h{i}, {_mul32('_k', _C2)} AS _k FROM ({q})"
        q = (
            f"SELECT {carry}, xor(CAST(_h{i} AS BIGINT), _k) AS _x "
            f"FROM ({q})"
        )
        q = (
            f"SELECT {carry}, ({_rotl32('_x', 13)}) * 5 + 3864292196 AS _x "
            f"FROM ({q})"
        )
        q = f"SELECT {carry}, _x % {_W32} AS _m{i} FROM ({q})"
        h = f"_m{i}"
    n = len(byte_exprs)
    q = f"SELECT {carry}, xor({h}, {n}) AS _f FROM ({q})"
    q = f"SELECT {carry}, xor(_f, _f // 65536) AS _f FROM ({q})"
    q = f"SELECT {carry}, {_mul32('_f', 0x85EBCA6B)} AS _f FROM ({q})"
    q = f"SELECT {carry}, xor(_f, _f // 8192) AS _f FROM ({q})"
    q = f"SELECT {carry}, {_mul32('_f', 0xC2B2AE35)} AS _f FROM ({q})"
    q = f"SELECT {carry}, xor(_f, _f // 65536) AS _f FROM ({q})"
    return (
        f"SELECT {carry}, CASE WHEN _f >= 2147483648 THEN _f - {_W32}"
        f" ELSE _f END AS {out} FROM ({q})"
    )
