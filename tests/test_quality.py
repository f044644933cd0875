"""Repetition-quality signals (operators/quality.py)."""

from gstored_spark.operators.quality import repetition_stats


def test_repetition_stats(spark):
    rows = [
        (1, "a b c d e f g h"),                  # all distinct, varied
        (2, "spam spam spam spam spam spam"),    # one token repeated
        (3, "x y x y x y x y"),                  # one dominant bigram
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["dup_word_frac"] == 0.0 and not got[1]["repetitive"]
    assert got[2]["dup_word_frac"] > 0.8 and got[2]["repetitive"]
    # doc 3: bigrams = x y / y x alternating; 'x y' holds 4 of 7
    assert abs(got[3]["top_bigram_frac"] - 4 / 7) < 1e-6
    assert got[3]["repetitive"]
    assert got[1]["n_words"] == 8


def test_short_docs_keep_rows_with_zero_bigram_frac(spark):
    """Docs with <2 tokens have no bigrams but must still get a row
    (top_bigram_frac 0.0) — inner explode would silently drop them."""
    rows = [(1, "solo"), (2, ""), (3, "a b a b")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["top_bigram_frac"] == 0.0 and not got[1]["repetitive"]
    assert got[2]["top_bigram_frac"] == 0.0
    assert got[3]["top_bigram_frac"] > 0.5
