"""Pure-Python replica of Spark's XxHash64 expression (the 64-bit
xxHash variant Catalyst codegen uses for `xxhash64(...)`), for the
specific input shapes our deterministic samplers hash: LongType and
IntegerType columns.

Why this exists: seeded corpus sampling rides `F.xxhash64(key, lit(seed))`
everywhere (BPE merge training, k-means init, PQ codebooks). Golden-value
generators must NOT run the Spark query they are the oracle for — that is
circular (r4 verdict, "What's wrong" #1). With this replica a generator
can reproduce the exact sample membership/order in plain Python + pyarrow,
no SparkSession, making the golden a genuinely independent second
implementation. Equality with Spark is pinned by tests/test_xxh.py over
value sweeps and both argument shapes.

Semantics mirrored (public Spark source, catalyst XXH64.java):
  - expression seed 42; children fold left: hash_n = H(child_n, hash_{n-1})
  - LongType  -> hashLong(v, seed)   (8-byte lane)
  - IntegerType -> hashInt(v, seed)  (4-byte lane — an int literal is NOT
    promoted to long; `lit(0)` and `lit(0).cast("long")` hash differently)
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    x &= _M
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h &= _M
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64.hashLong: one 8-byte lane. `value` is interpreted as a signed
    64-bit long (python ints are masked)."""
    v = value & _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl(v * _P2, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64.hashInt: one 4-byte lane (value masked to unsigned 32-bit,
    exactly the `input & 0xFFFFFFFFL` of the Java source)."""
    v = value & 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M
    h ^= (v * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_long_int(key: int, seed_lit: int) -> int:
    """`F.xxhash64(F.col(long_key), F.lit(int_seed))` — the exact chain the
    deterministic samplers use. Returns the SIGNED value Spark yields."""
    return _signed(hash_int(seed_lit, hash_long(key)))


def xxhash64_longs(*values: int) -> int:
    """`F.xxhash64(long_col, long_col, ...)` for all-long children."""
    h = SPARK_SEED
    for v in values:
        h = hash_long(v, h)
    return _signed(h)
