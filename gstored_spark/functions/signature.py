"""gStoreD vertex-signature bit math, bit-exact to the reference.

Layout (Signature/Signature.h:20-40):
  - STR_SIG_BASE=100, HASH_NUM=3 -> STR_SIG_LENGTH = 2*100*3 = 600 bits:
    entity-neighbor bits in [0,300), literal-neighbor bits in [300,600).
  - EDGE_SIG_INTERVAL_NUM_HALF=5, EDGE_SIG_INTERVAL_BASE=20 ->
    EDGE_SIG_LENGTH = 200 bits in [600,800): in-edges use intervals 0-4,
    out-edges intervals 5-9.
  - ENTITY_SIG_LENGTH = 800 bits, packed here as 13 little-endian int64
    words (``array<long>``), the Spark-friendly analog of
    ``std::bitset<800>``.

Formulas:
  - neighbor string (Signature.cpp:112-155 encodeStr2Entity): for i in 0..2,
    bit = 100*i + hash_i(str) % 100, where hash_i = Util::hash[i]
    (simpleHash/APHash/BKDRHash, Util/Util.cpp:43); +300 if the neighbor is
    a literal (first char '"'); strings starting '?' (query vars) encode
    nothing.
  - incident predicate (Signature.cpp:34-76 encodePredicate2Entity, method
    1): interval = pre_id % 5 (+5 for out-edges); bit =
    600 + 20*interval + (pre_id*5003 % 49957) % 20.

The VS*-tree (VSTree/VSTree.cpp) parent-OR hierarchy becomes per-partition
OR-aggregated signatures; containment pruning
(SigEntry::cover, Signature/SigEntry.h:31-32) is the word-wise test
``(data & query) == query`` expressed as DataFrame column ops.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

from gstored_spark.functions.hashing import HASH_FAMILY

STR_SIG_BASE = 100
HASH_NUM = 3
STR_SIG_LENGTH = 2 * STR_SIG_BASE * HASH_NUM  # 600
STR_SIG_LENGTH2 = STR_SIG_BASE * HASH_NUM  # 300
EDGE_SIG_INTERVAL_NUM_HALF = 5
EDGE_SIG_INTERVAL_BASE = 20
EDGE_SIG_LENGTH = 2 * EDGE_SIG_INTERVAL_NUM_HALF * EDGE_SIG_INTERVAL_BASE  # 200
ENTITY_SIG_LENGTH = STR_SIG_LENGTH + EDGE_SIG_LENGTH  # 800
SIG_WORDS = (ENTITY_SIG_LENGTH + 63) // 64  # 13


def str_bits(neighbor: str) -> list[int]:
    """Bit positions a neighbor term sets in a vertex signature."""
    if not neighbor or neighbor[0] == "?":
        return []
    off = STR_SIG_LENGTH2 if neighbor[0] == '"' else 0
    return [
        STR_SIG_BASE * i + h(neighbor) % STR_SIG_BASE + off
        for i, h in enumerate(HASH_FAMILY)
    ]


def edge_bits(pre_id: int, is_out: bool) -> list[int]:
    """Bit position an incident predicate sets (method 1)."""
    interval = pre_id % EDGE_SIG_INTERVAL_NUM_HALF
    if is_out:
        interval += EDGE_SIG_INTERVAL_NUM_HALF
    seed = pre_id * 5003 % 49957
    return [STR_SIG_LENGTH + EDGE_SIG_INTERVAL_BASE * interval + seed % EDGE_SIG_INTERVAL_BASE]


def contribution_bits(neighbor: str, pre_id: int, is_out: bool) -> list[int]:
    return str_bits(neighbor) + edge_bits(pre_id, is_out)


def pack_bits(positions: list[int]) -> list[int]:
    """positions -> SIG_WORDS little-endian int64 words (two's complement)."""
    words = [0] * SIG_WORDS
    for p in positions:
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


@pandas_udf(ArrayType(IntegerType()))
def contribution_bits_udf(
    neighbor: pd.Series, pre_id: pd.Series, is_out: pd.Series
) -> pd.Series:
    """Vectorized over the Arrow batch: the three signature hashes run
    column-wise over a padded byte matrix (functions/hashing.py batch
    family) — one numpy op per byte *position*, no per-byte interpreter
    loop. Bit-exact to contribution_bits (asserted in tests)."""
    import numpy as np

    from gstored_spark.functions.hashing import hash_family_batch

    n = neighbor.fillna("").to_numpy(dtype=object)
    h = hash_family_batch(n)  # (3, B)
    first = np.array([s[0] if s else "?" for s in n])
    valid = first != "?"
    off = np.where(first == '"', STR_SIG_LENGTH2, 0)
    p0 = h[0] % STR_SIG_BASE + off
    p1 = STR_SIG_BASE + h[1] % STR_SIG_BASE + off
    p2 = 2 * STR_SIG_BASE + h[2] % STR_SIG_BASE + off
    pid = pre_id.to_numpy(dtype=np.int64)
    interval = pid % EDGE_SIG_INTERVAL_NUM_HALF + np.where(
        is_out.to_numpy(dtype=bool), EDGE_SIG_INTERVAL_NUM_HALF, 0
    )
    edge = (
        STR_SIG_LENGTH
        + EDGE_SIG_INTERVAL_BASE * interval
        + (pid * 5003 % 49957) % EDGE_SIG_INTERVAL_BASE
    )
    mat = np.column_stack([p0, p1, p2, edge]).astype(np.int32).tolist()
    return pd.Series([row if v else row[3:] for row, v in zip(mat, valid)])


@pandas_udf(ArrayType(IntegerType()))
def term_str_bits_udf(term: pd.Series) -> pd.Series:
    """The three neighbor-string bit positions ONE TERM contributes
    (str_bits, Signature.cpp:112-155) — run once per distinct dictionary
    term instead of once per triple occurrence; the per-occurrence work
    then becomes a long-keyed join plus JVM arithmetic
    (vertex_signatures_from_ids)."""
    import numpy as np

    from gstored_spark.functions.hashing import hash_family_batch

    n = term.fillna("").to_numpy(dtype=object)
    h = hash_family_batch(n)  # (3, B)
    first = np.array([s[0] if s else "?" for s in n])
    valid = first != "?"
    off = np.where(first == '"', STR_SIG_LENGTH2, 0)
    p0 = h[0] % STR_SIG_BASE + off
    p1 = STR_SIG_BASE + h[1] % STR_SIG_BASE + off
    p2 = 2 * STR_SIG_BASE + h[2] % STR_SIG_BASE + off
    mat = np.column_stack([p0, p1, p2]).astype(np.int32).tolist()
    return pd.Series([row if v else [] for row, v in zip(mat, valid)])


def _m32l() -> Column:
    """0xFFFFFFFF as a long literal (built lazily: F.lit needs an active
    SparkContext, so no module-level Column constants)."""
    return F.lit(0xFFFFFFFF).cast("long")


def _utf8_byte_array(col: Column) -> Column:
    """string -> array<long> of its UTF-8 byte values (0..255), via the hex
    encoding of the binary form — pure catalyst expressions, no Python.
    Guarded for the empty string (sequence(1,0) would DESCEND in Spark)."""
    h = F.hex(F.encode(col, "UTF-8"))
    n = (F.length(h) / 2).cast("int")
    arr = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.conv(h.substr(i * 2 - 1, F.lit(2)), 16, 10).cast("long"),
    )
    return F.when(n > 0, arr).otherwise(F.array().cast("array<long>"))


def _sx_col(b: Column) -> Column:
    """C signed-char promotion viewed as uint32 (hashing._sx):
    0x80..0xFF -> 0xFFFFFF80..0xFFFFFFFF."""
    return F.when(b >= 128, b + F.lit(4294967040)).otherwise(b)


def simple_hash_col(bytes_arr: Column) -> Column:
    """JVM twin of hashing.simple_hash over a UTF-8 byte array."""
    key = F.aggregate(
        bytes_arr,
        F.lit(0).cast("long"),
        lambda acc, b: (acc * 31 + b).bitwiseAND(_m32l()),
    )
    return key.bitwiseAND(F.lit(0x7FFFFFFF))


def bkdr_hash_col(bytes_arr: Column) -> Column:
    """JVM twin of hashing.bkdr_hash (signed-char bytes, seed 131)."""
    key = F.aggregate(
        bytes_arr,
        F.lit(0).cast("long"),
        lambda acc, b: (acc * 131 + _sx_col(b)).bitwiseAND(_m32l()),
    )
    return key.bitwiseAND(F.lit(0x7FFFFFFF))


def ap_hash_col(bytes_arr: Column) -> Column:
    """JVM twin of hashing.ap_hash: alternating-by-index XOR mix, tracked
    with a (key, i) struct accumulator."""
    def step(acc, b):
        key, i = acc["key"], acc["i"]
        ch = _sx_col(b)
        even = key.bitwiseXOR(
            F.shiftleft(key, 7).bitwiseAND(_m32l()).bitwiseXOR(ch).bitwiseXOR(
                F.shiftright(key, 3)
            )
        )
        odd = key.bitwiseXOR(
            F.bitwise_not(
                F.shiftleft(key, 11).bitwiseAND(_m32l()).bitwiseXOR(ch).bitwiseXOR(
                    F.shiftright(key, 5)
                )
            ).bitwiseAND(_m32l())
        )
        nk = F.when(i % 2 == 0, even).otherwise(odd).bitwiseAND(_m32l())
        return F.struct(nk.alias("key"), (i + 1).alias("i"))

    return F.aggregate(
        bytes_arr,
        F.struct(F.lit(0).cast("long").alias("key"), F.lit(0).alias("i")),
        step,
        lambda acc: acc["key"].bitwiseAND(F.lit(0x7FFFFFFF)),
    )


def term_str_bits_col(term: Column) -> Column:
    """JVM twin of term_str_bits_udf: the three neighbor-string bit
    positions one term contributes (str_bits, Signature.cpp:112-155) as
    pure catalyst higher-order expressions — zero Python workers. Bit-exact
    to str_bits (asserted in tests); empty/NULL/'?'-prefixed terms
    contribute nothing, '"'-prefixed literals take the +300 offset.

    Measured (1M distinct IRIs, local[16], warm): 9.6 s vs 0.70 s for
    term_str_bits_udf — catalyst higher-order aggregates evaluate per
    element in the interpreter, while the UDF's numpy batch runs one
    vectorized op per byte POSITION over the whole Arrow batch. The UDF
    therefore stays the default (vertex_signatures_from_ids
    term_bits_impl="udf"); this twin exists for Python-less deployments
    and as the living spec of the byte-level semantics."""
    b = _utf8_byte_array(term)
    first = term.substr(1, 1)
    valid = term.isNotNull() & (F.length(term) > 0) & (first != "?")
    off = F.when(first == '"', F.lit(STR_SIG_LENGTH2)).otherwise(F.lit(0))
    p0 = (simple_hash_col(b) % STR_SIG_BASE + off).cast("int")
    p1 = (F.lit(STR_SIG_BASE) + ap_hash_col(b) % STR_SIG_BASE + off).cast("int")
    p2 = (F.lit(2 * STR_SIG_BASE) + bkdr_hash_col(b) % STR_SIG_BASE + off).cast("int")
    return F.when(valid, F.array(p0, p1, p2)).otherwise(
        F.array().cast("array<int>")
    )


def edge_bit_col(pid: Column, is_out: bool) -> Column:
    """JVM twin of edge_bits (Signature.cpp:34-76 method 1): pure column
    arithmetic on the predicate id — no Python in the per-triple path."""
    interval = F.pmod(pid, F.lit(EDGE_SIG_INTERVAL_NUM_HALF)) + (
        EDGE_SIG_INTERVAL_NUM_HALF if is_out else 0
    )
    return (
        F.lit(STR_SIG_LENGTH)
        + F.lit(EDGE_SIG_INTERVAL_BASE) * interval
        + F.pmod(F.pmod(pid * 5003, F.lit(49957)), F.lit(EDGE_SIG_INTERVAL_BASE))
    ).cast("int")


def sig_words_from_bits(df, key_cols: list[str], bits_col: str = "bits"):
    """(keys..., bits array<int>) -> (keys..., sig array<long>[SIG_WORDS]).

    JVM-side one-pass aggregation: explode bit positions, then ONE
    groupBy(keys) with SIG_WORDS conditional ``bit_or`` accumulators (word
    w ORs mask iff pos//64 == w). Map-side partial aggregation reduces the
    shuffle to one SIG_WORDS-wide row per key per map partition; the prior
    two-level shape ((keys, word) OR -> (keys) collect_list ->
    map_from_entries -> transform) paid a second shuffle plus per-key map
    assembly — measured 12.1s -> 2.9s for the 1.66M-vertex store build
    (bit-identical, plan: 2 HashAggregate/1 Exchange vs 4/2).
    """
    # 64-entry bit-mask lookup (shiftleft needs a literal count); entry 64
    # is the sign bit as a negative long
    masks = F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(64)]
    )
    exploded = df.select(
        *key_cols, F.explode(bits_col).alias("pos")
    ).select(
        *key_cols,
        (F.col("pos") / 64).cast("int").alias("word"),
        F.element_at(masks, (F.col("pos") % 64).cast("int") + 1).alias("mask"),
    )
    zero = F.lit(0).cast("long")
    agg = exploded.groupBy(*key_cols).agg(
        *[
            F.bit_or(F.when(F.col("word") == w, F.col("mask")).otherwise(zero)).alias(f"_w{w}")
            for w in range(SIG_WORDS)
        ]
    )
    return agg.select(
        *key_cols, F.array(*[F.col(f"_w{w}") for w in range(SIG_WORDS)]).alias("sig")
    )


def sig_or(df, key_cols: list[str], sig_col: str = "sig"):
    """OR-aggregate signatures across rows per key (VS*-tree parent analog:
    VSTree/VSTree.cpp:146-219 builds parents as child ORs).

    One groupBy with SIG_WORDS ``bit_or(element_at(sig, w+1))`` accumulators
    — no explode, no second aggregation, no map reassembly; map-side partial
    aggregation reduces the shuffle to one wide row per key per map
    partition (same restructure as sig_words_from_bits, bit-identical)."""
    agg = df.groupBy(*key_cols).agg(
        *[
            F.bit_or(F.element_at(F.col(sig_col), w + 1)).alias(f"_w{w}")
            for w in range(SIG_WORDS)
        ]
    )
    return agg.select(
        *key_cols, F.array(*[F.col(f"_w{w}") for w in range(SIG_WORDS)]).alias(sig_col)
    )


def covers(data_sig: Column, query_sig: Column) -> Column:
    """Signature containment: data covers query iff every query bit is set
    (SigEntry::cover, Signature/SigEntry.h:31-32). Word-wise AND/compare."""
    return F.forall(
        F.zip_with(data_sig, query_sig, lambda d, q: d.bitwiseAND(q) == q),
        lambda x: x,
    )
