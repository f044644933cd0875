"""Deterministic, engine-portable hash helpers.

Two families live here:

1. The reference's three signature hashes, reimplemented bit-exactly from
   their public-domain definitions with the reference's exact C semantics
   (Util/Util.cpp:822-838,944-960: simpleHash, APHash, BKDRHash — the first
   three entries of Util::hash[], consumed by
   Signature/Signature.cpp:125-131). Byte signedness matters for non-ASCII
   UTF-8: ``simpleHash`` iterates ``unsigned char`` (Util.cpp:843) while
   ``BKDRHash``/``APHash`` iterate plain ``char`` — **signed** on x86 — so
   bytes >= 0x80 are sign-extended before entering the mix; both ports
   reproduce that. All three mask to 31 bits (`key & 0x7FFFFFFF`).

   Each hash exists in two shapes: a per-string pure-python reference (the
   test oracle) and a numpy batch version (``*_batch``) that processes a
   whole Arrow batch column-wise — one vectorized op per byte *position*
   instead of one interpreter step per byte, the hot-path implementation
   used by the signature UDF.

2. md5-based helpers that evaluate identically in Spark SQL and DuckDB SQL —
   these power every query that must be verified against the DuckDB oracle
   (MinHash, SimHash, fingerprints), since both engines expose the same
   ``md5`` builtin over the same UTF-8 bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np

_M32 = 0xFFFFFFFF


def _sx(b: int) -> int:
    """Sign-extend a byte the way C promotes a (signed) char to int,
    viewed as uint32: 0x80..0xFF -> 0xFFFFFF80..0xFFFFFFFF."""
    return b | 0xFFFFFF00 if b >= 0x80 else b


def simple_hash(s: str) -> int:
    """key = 31*key + byte (uint32), masked to 31 bits (Util.cpp:838-847).
    Iterates *unsigned* char — no sign extension."""
    key = 0
    for b in s.encode("utf-8"):
        key = (31 * key + b) & _M32
    return key & 0x7FFFFFFF


def ap_hash(s: str) -> int:
    """Arash Partow hash, gStore variant (Util.cpp:944-960). Iterates
    signed char: bytes >= 0x80 enter the XORs sign-extended."""
    key = 0
    for i, b in enumerate(s.encode("utf-8")):
        ch = _sx(b)
        if (i & 1) == 0:
            key ^= ((key << 7) & _M32) ^ ch ^ (key >> 3)
        else:
            key ^= (~(((key << 11) & _M32) ^ ch ^ (key >> 5))) & _M32
        key &= _M32
    return key & 0x7FFFFFFF


def bkdr_hash(s: str) -> int:
    """BKDR hash, seed 131 (Util.cpp:822-836; also the crossing-edge hash
    seed used at Query/GeneralEvaluation.cpp:346-388). Iterates signed
    char: bytes >= 0x80 are added sign-extended."""
    key = 0
    for b in s.encode("utf-8"):
        key = (key * 131 + _sx(b)) & _M32
    return key & 0x7FFFFFFF


# Util::hash[0..2] as wired at Util/Util.cpp:43 and used with
# HASH_NUM = 3 (Signature/Signature.h:26).
HASH_FAMILY = (simple_hash, ap_hash, bkdr_hash)


# ---- numpy batch versions (column-wise Horner over a padded byte matrix) ----


def byte_matrix(strs) -> tuple[np.ndarray, np.ndarray]:
    """iterable[str] -> (B x Lmax uint8 matrix zero-padded, lengths int64)."""
    bs = [s.encode("utf-8") for s in strs]
    n = len(bs)
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    lmax = int(lens.max()) if n and lens.max() > 0 else 0
    m = np.zeros((n, lmax), dtype=np.uint8)
    for i, b in enumerate(bs):
        if b:
            m[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return m, lens


def _signed_ext(col: np.ndarray) -> np.ndarray:
    c = col.astype(np.uint32)
    return np.where(c >= 0x80, c | np.uint32(0xFFFFFF00), c)


def simple_hash_batch(m: np.ndarray, lens: np.ndarray) -> np.ndarray:
    key = np.zeros(m.shape[0], dtype=np.uint32)
    for j in range(m.shape[1]):
        nk = key * np.uint32(31) + m[:, j].astype(np.uint32)
        key = np.where(lens > j, nk, key)
    return (key & np.uint32(0x7FFFFFFF)).astype(np.int64)


def ap_hash_batch(m: np.ndarray, lens: np.ndarray) -> np.ndarray:
    key = np.zeros(m.shape[0], dtype=np.uint32)
    for j in range(m.shape[1]):
        ch = _signed_ext(m[:, j])
        if (j & 1) == 0:
            nk = key ^ ((key << np.uint32(7)) ^ ch ^ (key >> np.uint32(3)))
        else:
            nk = key ^ ~((key << np.uint32(11)) ^ ch ^ (key >> np.uint32(5)))
        key = np.where(lens > j, nk, key)
    return (key & np.uint32(0x7FFFFFFF)).astype(np.int64)


def bkdr_hash_batch(m: np.ndarray, lens: np.ndarray) -> np.ndarray:
    key = np.zeros(m.shape[0], dtype=np.uint32)
    for j in range(m.shape[1]):
        nk = key * np.uint32(131) + _signed_ext(m[:, j])
        key = np.where(lens > j, nk, key)
    return (key & np.uint32(0x7FFFFFFF)).astype(np.int64)


def hash_family_batch(strs) -> np.ndarray:
    """iterable[str] -> (3, B) int64 array of (simple, AP, BKDR) hashes."""
    m, lens = byte_matrix(strs)
    return np.stack(
        [simple_hash_batch(m, lens), ap_hash_batch(m, lens), bkdr_hash_batch(m, lens)]
    )


def md5_int(s: str, bits: int = 60) -> int:
    """Top ``bits`` of md5(s) as a non-negative int. Portable: Spark's and
    DuckDB's ``md5`` produce the same hex digest, so SQL oracles can
    reproduce this with string ops on the digest."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[: bits // 4], 16)
