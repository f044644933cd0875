"""Benchmark decontamination (operators/decontam.py)."""

from gstored_spark.operators.decontam import decontaminate, eval_ngram_set


def test_decontaminate_flags_shared_ngrams(spark):
    eval_rows = [(100, "the quick brown fox jumps over the lazy dog")]
    cand_rows = [
        # contains the eval 4-gram "quick brown fox jumps"
        (1, "we saw a quick brown fox jumps right here today"),
        # same words, different order: no shared 4-gram
        (2, "fox brown quick jumps dog lazy the over"),
        # clean document
        (3, "completely unrelated text about spark plans and shuffles"),
        # shorter than n: zero grams, must still get a row
        (4, "too short"),
    ]
    eval_df = spark.createDataFrame(eval_rows, "doc_id long, text string")
    cands = spark.createDataFrame(cand_rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in decontaminate(cands, eval_df, n=4).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["contaminated"] and got[1]["n_hits"] >= 1
    assert not got[2]["contaminated"] and got[2]["n_hits"] == 0
    assert not got[3]["contaminated"]
    assert got[4]["n_grams"] == 0 and got[4]["contamination"] == 0.0
    # contamination is n_hits / n_grams of doc 1: 10 tokens -> 7 grams
    assert got[1]["n_grams"] == 7
    # contamination is rounded to 6 decimals for cross-engine stability
    assert abs(got[1]["contamination"] - got[1]["n_hits"] / 7) < 1e-6


def test_decontaminate_counts_distinct_grams_once(spark):
    """A doc repeating the same contaminated n-gram counts it once:
    n-grams are deduplicated inside the row before the probe."""
    eval_df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    cands = spark.createDataFrame(
        [(1, "a b c d a b c d")], "doc_id long, text string"
    )
    row = decontaminate(cands, eval_df, n=4).collect()[0]
    # distinct 4-grams of the repeated text: abcd, bcda, cdab, dabc, abcd(dup)
    assert row["n_grams"] == 4
    assert row["n_hits"] == 1 and row["contaminated"]


def test_eval_ngram_set_distinct(spark):
    eval_df = spark.createDataFrame(
        [(0, "x y z w"), (1, "x y z w")], "doc_id long, text string"
    )
    grams = eval_ngram_set(eval_df, n=4).collect()
    assert [r["gram"] for r in grams] == ["x y z w"]


def test_corpus_frequency_stats(spark):
    from gstored_spark.operators.quality import corpus_frequency_stats

    rows = [
        (1, "common common common"),
        (2, "common rareword"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in corpus_frequency_stats(df, rare_max=1).collect()
    }
    # corpus counts: common=4, rareword=1
    assert got[1]["n_tokens"] == 3 and got[1]["mean_tok_freq"] == 4.0
    assert got[1]["rare_frac"] == 0.0 and not got[1]["unfamiliar"]
    assert got[2]["mean_tok_freq"] == 2.5
    assert got[2]["rare_frac"] == 0.5 and not got[2]["unfamiliar"]


def test_corpus_frequency_probe_joins_distinct_token_stream(spark):
    """r06 shuffle-shrink: the probe join's corpus side must be the
    pre-aggregated per-document DISTINCT (id, tok, cnt) stream, not the
    raw occurrence explode — the corpus explode runs exactly once."""
    from gstored_spark.operators.quality import corpus_frequency_stats

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    out = corpus_frequency_stats(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    # the explode was materialized away behind the checkpoint: the executed
    # plan joins two scans of the SAME pre-aggregated RDD and contains no
    # Generate (explode) node at all
    assert "Generate" not in plan
    # tree + detail section each list the two scans of the checkpointed RDD
    assert plan.count("Scan ExistingRDD") == 4
