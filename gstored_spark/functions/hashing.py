"""Deterministic, engine-portable hash helpers.

Two families live here:

1. The reference's three signature hashes, reimplemented bit-exactly from
   their public-domain definitions with the reference's uint32 semantics
   (Util/Util.cpp:822-838,944-960: simpleHash, APHash, BKDRHash — the first
   three entries of Util::hash[], consumed by
   Signature/Signature.cpp:125-131). They operate on the UTF-8 bytes of the
   term and mask to 31 bits exactly like the C++ (`key & 0x7FFFFFFF`).

2. md5-based helpers that evaluate identically in Spark SQL and DuckDB SQL —
   these power every query that must be verified against the DuckDB oracle
   (MinHash, SimHash, fingerprints), since both engines expose the same
   ``md5`` builtin over the same UTF-8 bytes.
"""

from __future__ import annotations

import hashlib

_M32 = 0xFFFFFFFF


def simple_hash(s: str) -> int:
    """key = 31*key + byte (uint32), masked to 31 bits (Util.cpp:838-847)."""
    key = 0
    for b in s.encode("utf-8"):
        key = (31 * key + b) & _M32
    return key & 0x7FFFFFFF


def ap_hash(s: str) -> int:
    """Arash Partow hash, gStore variant (Util.cpp:944-960)."""
    key = 0
    for i, b in enumerate(s.encode("utf-8")):
        if (i & 1) == 0:
            key ^= ((key << 7) & _M32) ^ b ^ (key >> 3)
        else:
            key ^= (~(((key << 11) & _M32) ^ b ^ (key >> 5))) & _M32
        key &= _M32
    return key & 0x7FFFFFFF


def bkdr_hash(s: str) -> int:
    """BKDR hash, seed 131 (Util.cpp:822-836; also the crossing-edge hash
    seed used at Query/GeneralEvaluation.cpp:346-388)."""
    key = 0
    for b in s.encode("utf-8"):
        key = (key * 131 + b) & _M32
    return key & 0x7FFFFFFF


# Util::hash[0..2] as wired at Util/Util.cpp:43 and used with
# HASH_NUM = 3 (Signature/Signature.h:26).
HASH_FAMILY = (simple_hash, ap_hash, bkdr_hash)


def md5_int(s: str, bits: int = 60) -> int:
    """Top ``bits`` of md5(s) as a non-negative int. Portable: Spark's and
    DuckDB's ``md5`` produce the same hex digest, so SQL oracles can
    reproduce this with string ops on the digest."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[: bits // 4], 16)
