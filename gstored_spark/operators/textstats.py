"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

Everything except the rolling-hash winnowing fingerprint is pure built-in
column expressions (whole-stage codegen, zero Python); each has an exact
ANSI-SQL twin used as the DuckDB oracle. The winnowing fingerprint is a
vectorized pandas UDF (Arrow-batched) because it is inherently sequential
per document — it is verified by a pure-Python reference implementation in
the test suite instead.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from gstored_spark.operators.dedup import normalized_text, tokens

# tiny deterministic stopword marker lists per language (shared with the SQL
# oracle — keep in sync with __spark_entry__.oracle_sql)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "was", "with"],
    "de": ["und", "der", "die", "das", "mit", "von", "ist"],
    "fr": ["le", "la", "les", "des", "et", "dans", "pour"],
    "es": ["el", "los", "las", "una", "con", "por", "que"],
}


def _marker_hits(toks, markers: list[str]) -> "F.Column":
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """n-gram/stopword-heuristic language ID -> (id, lang_pred, score).

    Picks the language with the most marker-token hits; ties break
    alphabetically ('de' < 'en' < 'es' < 'fr'), 'und' (undetermined) when
    zero hits everywhere.
    """
    toks = tokens(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        *[_marker_hits(toks, m).alias(f"hits_{lang}") for lang, m in sorted(LANG_MARKERS.items())],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    # reverse order so earlier (alphabetical) languages win ties
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        id_col, pred.alias("lang_pred"), best.cast("int").alias("score")
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / stopword heuristics -> one row per doc:
    (id, n_chars, n_tokens, mean_token_len, stopword_ratio, punct_ratio,
    quality). All ratios are exact integer divisions in double, rounded to
    6 — bit-identical across engines for identical inputs."""
    s = normalized_text(F.col(text_col))
    toks = tokens(F.col(text_col))
    n_chars = F.length(s)
    n_tokens = F.size(toks)
    stop_hits = _marker_hits(toks, LANG_MARKERS["en"])
    n_punct = n_chars - F.length(F.regexp_replace(s, r"[^\w\s]", ""))
    mean_tok = F.round((n_chars - (n_tokens - 1)) / n_tokens, 6)
    stop_ratio = F.round(stop_hits / n_tokens, 6)
    punct_ratio = F.round(n_punct / n_chars, 6)
    quality = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + stop_ratio * 2.0
        + (F.lit(1.0) - punct_ratio) * 0.1,
        6,
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish subword count (word chunks of <=4
    chars + standalone non-word marks), both as built-in regexp ops."""
    s = normalized_text(F.col(text_col))
    ws = F.size(tokens(F.col(text_col)))
    # BPE-ish: every word contributes ceil(len/4) subword units; punctuation
    # marks are one unit each.
    toks = tokens(F.col(text_col))
    subwords = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(F.regexp_replace(t, r"[^\w]", "")) / 4.0).cast("long")
        + F.length(F.regexp_replace(t, r"[\w]", "")).cast("long"),
    )
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        subwords.alias("bpe_tokens"),
    )


def content_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """md5 fingerprint of the normalized text (engine-portable)."""
    return df.select(
        F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("fingerprint")
    )


# ---- winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) --------
#
# Two hash families:
#   * the original rolling polynomial hash (winnow_fingerprint /
#     winnowed) — kept as the cheapest per-char scheme, verified against a
#     pure-python reference in tests;
#   * an md5-k-gram variant (winnow_features*) whose selection is
#     reproducible in ANSI SQL, giving the operator a real DuckDB oracle.
#     It exists in two equivalent shapes: a map-only Arrow UDF (the 100 TB
#     path — no shuffle, one pass per document) and a pure-built-in
#     window-function twin (JVM-side, used to cross-check the UDF and as
#     the blueprint for the oracle SQL).

_B = 1000003
_M = (1 << 61) - 1
_WINDOW = 8
_GRAM = 5


def winnow_fingerprint(text: str) -> list[int]:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): k-gram rolling
    hashes, keep the min of each sliding window (rightmost min), dedupe."""
    s = " ".join(text.lower().split())
    if len(s) < _GRAM:
        return []
    hs = []
    h = 0
    power = pow(_B, _GRAM - 1, _M)
    for i, ch in enumerate(s):
        h = (h * _B + ord(ch)) % _M
        if i >= _GRAM:
            h = (h - ord(s[i - _GRAM]) * power * _B) % _M
        if i >= _GRAM - 1:
            hs.append(h)
    out = []
    last = -1
    for w in range(len(hs) - _WINDOW + 1):
        window = hs[w : w + _WINDOW]
        m = min(window)
        idx = w + max(i for i, v in enumerate(window) if v == m)
        if idx != last:
            out.append(m)
            last = idx
    seen = set()
    dedup = []
    for v in out:
        if v not in seen:
            seen.add(v)
            dedup.append(v)
    return dedup


@pandas_udf(ArrayType(LongType()))
def winnow_fingerprint_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: winnow_fingerprint(t) if t is not None else [])


def winnowed(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), winnow_fingerprint_udf(F.col(text_col)).alias("winnow_fp")
    )


# ---- md5-k-gram winnowing with a SQL-expressible selection ------------------

def winnow_md5(text: str, k: int = _GRAM, window: int = _WINDOW) -> tuple[int, str | None]:
    """(n_fp, fp_hash) for one document: md5 each char k-gram of the
    normalized text, slide a ``window``-gram window picking the min hash
    (rightmost position on ties), fingerprint = distinct selected hashes in
    position order, fp_hash = md5(','-joined hashes). Documents shorter than
    k grams yield (0, None)."""
    import hashlib

    s = " ".join(text.lower().split())
    if len(s) < k:
        return 0, None
    hs = [hashlib.md5(s[i : i + k].encode("utf-8")).hexdigest() for i in range(len(s) - k + 1)]
    n = len(hs)
    sel: set[tuple[int, str]] = set()
    for w in range(max(n - window + 1, 1)):
        frame = hs[w : w + window]
        best = min(range(len(frame)), key=lambda j: (frame[j], -j))
        sel.add((w + best, frame[best]))
    ordered = [h for _, h in sorted(sel)]
    return len(ordered), hashlib.md5(",".join(ordered).encode("utf-8")).hexdigest()


def _winnow_md5_vec(text: str, k: int = _GRAM, window: int = _WINDOW) -> tuple[int, str | None]:
    """Vectorized twin of winnow_md5 (identical output, asserted in tests):
    the per-gram md5 loop hashes memoryview slices to raw digests (no hex
    materialization), and the sliding-window rightmost-min selection runs
    as numpy array ops over the digests' order codes instead of a Python
    min() per window. Digest BYTE order equals hex-string order (md5 hex
    compares like the 128-bit value), so the selection is unchanged."""
    import hashlib

    import numpy as np

    s = " ".join(text.lower().split())
    if len(s) < k:
        return 0, None
    n = len(s) - k + 1
    m = hashlib.md5
    if s.isascii():
        mv = memoryview(s.encode())
        buf = b"".join([m(mv[i : i + k]).digest() for i in range(n)])
    else:
        # char grams != byte grams for non-ASCII: slice the str, like the
        # reference implementation
        buf = b"".join([m(s[i : i + k].encode("utf-8")).digest() for i in range(n)])
    digs = np.frombuffer(buf, dtype="S16")
    # rank codes preserve digest order (trailing-NUL stripping in numpy's
    # bytes compare cannot reorder equal-length strings: NUL is minimal)
    codes = np.unique(digs, return_inverse=True)[1]
    if n <= window:
        mn = codes.min()
        sel_pos = np.nonzero(codes == mn)[0][-1:]
    else:
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(codes, window)
        mn = win.min(axis=1)
        eq = win == mn[:, None]
        # rightmost occurrence of the window minimum (the -j tie-break)
        idx = window - 1 - np.argmax(eq[:, ::-1], axis=1)
        sel_pos = np.unique(np.arange(win.shape[0]) + idx)
    ordered = [buf[p * 16 : (p + 1) * 16].hex() for p in sel_pos]
    return len(ordered), m(",".join(ordered).encode("utf-8")).hexdigest()


@pandas_udf(
    StructType(
        [StructField("n_fp", LongType()), StructField("fp_hash", StringType())]
    )
)
def winnow_md5_udf(text: pd.Series) -> pd.DataFrame:
    rows = [_winnow_md5_vec(t) if t is not None else (0, None) for t in text]
    return pd.DataFrame(rows, columns=["n_fp", "fp_hash"])


def winnow_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Map-only winnowing -> (id, n_fp, fp_hash). The 100 TB shape: one
    Arrow batch pass, no shuffle; selection identical to
    winnow_features_sql (asserted in tests) and to the DuckDB oracle."""
    from gstored_spark.partitioning import spread_scan

    # n_fp > 0 iff the normalized text has at least one k-gram — filter
    # BEFORE the UDF with the equivalent JVM predicate (the same WHERE the
    # SQL oracle uses). Filtering on the UDF's own output column made the
    # optimizer push the filter (and a duplicate ArrowEvalPython) below
    # the spread exchange: the whole corpus paid the Python pass twice,
    # once single-task (guide §4.4).
    base = df.select(F.col(id_col), F.col(text_col)).filter(
        F.length(normalized_text(F.col(text_col))) >= _GRAM
    )
    return (
        spread_scan(base)
        .select(F.col(id_col), winnow_md5_udf(F.col(text_col)).alias("w"))
        .select(id_col, F.col("w.n_fp").alias("n_fp"), F.col("w.fp_hash").alias("fp_hash"))
    )


def winnow_features_sql(
    df: DataFrame, id_col: str, text_col: str, k: int = _GRAM, window: int = _WINDOW
) -> DataFrame:
    """Pure-built-in twin of winnow_features: explode k-gram positions,
    window-min with a (hash asc, pos desc) composite key encoded as
    ``h || lpad(10^8 - pos)`` so the string min realizes the rightmost-min
    tie-break, then reassemble per document. Shuffles once per doc on the
    window sort — use winnow_features for the map-only shape."""
    from pyspark.sql.window import Window

    s = normalized_text(F.col(text_col))
    base = df.select(F.col(id_col), s.alias("s")).filter(F.length("s") >= k)
    grams = base.select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.length("s") - (k - 1))).alias("pos"),
        (F.length("s") - (k - 1)).alias("n"),
        F.col("s"),
    ).select(
        id_col,
        "pos",
        "n",
        F.md5(F.col("s").substr(F.col("pos"), F.lit(k))).alias("h"),
    )
    key = F.concat(
        F.col("h"), F.lpad((F.lit(100_000_000) - F.col("pos")).cast("string"), 9, "0")
    )
    w = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    starts = grams.withColumn("sel", F.min(key).over(w)).filter(
        F.col("pos") <= F.greatest(F.col("n") - (window - 1), F.lit(1))
    )
    selected = starts.select(
        id_col,
        F.substring("sel", 1, 32).alias("h"),
        (F.lit(100_000_000) - F.substring("sel", 33, 9).cast("long")).alias("p"),
    ).distinct()
    return selected.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("p", "h"))), lambda x: x["h"]
                ),
                ",",
            )
        ).alias("fp_hash"),
    )
