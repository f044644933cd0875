"""Deterministic hash-based sampling (operators/sampling.py)."""

from gstored_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    train_holdout_split,
)


def _docs(spark, n=2000):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 10 < 6 THEN 'en' WHEN id % 10 < 8 THEN 'de' "
        "ELSE 'fr' END AS lang",
    )


def test_sample_stable_under_repartition(spark):
    d = _docs(spark)
    a = {r[0] for r in deterministic_sample(d, "doc_id", 0.3).collect()}
    b = {
        r[0]
        for r in deterministic_sample(d.repartition(13), "doc_id", 0.3).collect()
    }
    assert a == b and 0.2 < len(a) / 2000 < 0.4


def test_sample_merge_property(spark):
    # sample(union) == union(samples): membership is per-key
    d = _docs(spark, 2000)
    lo = d.filter("doc_id < 1000")
    hi = d.filter("doc_id >= 1000")
    whole = {r[0] for r in deterministic_sample(d, "doc_id", 0.2).collect()}
    parts = {
        r[0] for r in deterministic_sample(lo, "doc_id", 0.2).collect()
    } | {r[0] for r in deterministic_sample(hi, "doc_id", 0.2).collect()}
    assert whole == parts


def test_sample_nested_fractions(spark):
    # the 10% sample is a subset of the 30% sample (same salt -> same order)
    d = _docs(spark)
    s10 = {r[0] for r in deterministic_sample(d, "doc_id", 0.1).collect()}
    s30 = {r[0] for r in deterministic_sample(d, "doc_id", 0.3).collect()}
    assert s10 <= s30
    # a different salt gives an (almost surely) different sample
    s10b = {
        r[0] for r in deterministic_sample(d, "doc_id", 0.1, salt="x").collect()
    }
    assert s10 != s10b


def test_stratified_fractions(spark):
    d = _docs(spark)
    out = stratified_sample(
        d, "doc_id", "lang", {"en": 0.1, "de": 0.5}, default=1.0
    )
    rates = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg({"*": "count"})
        .withColumnRenamed("count(1)", "n").collect()
    }
    assert rates["fr"] == 400  # default 1.0 keeps every row
    assert 0.05 < rates["en"] / 1200 < 0.2
    assert 0.35 < rates["de"] / 400 < 0.65


def test_split_no_migration_as_corpus_grows(spark):
    small = train_holdout_split(_docs(spark, 500), "doc_id", 0.2)
    big = train_holdout_split(_docs(spark, 2000), "doc_id", 0.2)
    m_small = {r["doc_id"]: r["split"] for r in small.collect()}
    m_big = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(m_big[k] == v for k, v in m_small.items())
    assert set(m_big.values()) == {"train", "holdout"}


def test_mix_sources_targets_proportions(spark):
    from gstored_spark.operators.sampling import mix_sources

    d = spark.range(4000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 2 = 0 THEN 'big' ELSE 'small' END AS src"
    ).filter("src = 'big' OR doc_id < 400")  # big: 2000 rows, small: 200
    out = mix_sources(d, "doc_id", "src", {"big": 1.0, "small": 1.0}, 800)
    got = {r["src"]: r["n"] for r in out.groupBy("src").agg(
        {"*": "count"}).withColumnRenamed("count(1)", "n").collect()}
    # big: 400/2000 = 0.2 sample; small under-supplied -> keeps all 200
    assert got["small"] == 200
    assert 300 < got["big"] < 500
    # unmentioned sources drop
    out2 = mix_sources(d, "doc_id", "src", {"small": 1.0}, 100)
    assert out2.filter("src = 'big'").count() == 0
    # determinism under repartition
    a = {r[0] for r in out.select("doc_id").collect()}
    b = {
        r[0]
        for r in mix_sources(
            d.repartition(7), "doc_id", "src", {"big": 1.0, "small": 1.0}, 800
        ).select("doc_id").collect()
    }
    assert a == b
