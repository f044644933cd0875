"""Dictionary encoding determinism + gStoreD partition-routing invariants
(Main/gloadD.cpp:118-153 semantics, internal bitmap
Database/Database.cpp:1572-1639)."""

import pytest
from pyspark.sql import functions as F

from gstored_spark.kg.ids import (
    LITERAL_FIRST_ID,
    assign_dense_ids,
    build_dictionaries,
    encode_triples,
)
from gstored_spark.kg.partition import (
    hot_subjects,
    internal_vertices,
    owner,
    route_triples,
    salted_shuffle_key,
)


@pytest.fixture(scope="module")
def toy_triples(spark):
    rows = [
        ("<a>", "<p1>", "<b>", True),
        ("<a>", "<p2>", '"lit one"@en', False),
        ("<b>", "<p1>", "<c>", True),
        ("<c>", "<p3>", "<a>", True),
        ("<c>", "<p2>", '"lit two"@en', False),
        ("<d>", "<p1>", "<d>", True),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj", "o_is_entity"])


def test_dense_ids_deterministic_across_parallelism(spark):
    terms = spark.createDataFrame([(f"t{i:03d}",) for i in range(257)], ["term"])
    a = {r["term"]: r["id"] for r in assign_dense_ids(terms, "term", 0, buckets=2).collect()}
    b = {r["term"]: r["id"] for r in assign_dense_ids(terms.repartition(13), "term", 0, buckets=11).collect()}
    assert a == b
    # dense, lexicographic
    assert sorted(a.values()) == list(range(257))
    ordered = sorted(a, key=lambda t: a[t])
    assert ordered == sorted(a)


def test_namespaces(spark, toy_triples):
    ent, lit, pred = build_dictionaries(toy_triples)
    ents = ent.collect()
    lits = lit.collect()
    assert all(r["id"] < LITERAL_FIRST_ID for r in ents)
    assert all(r["id"] >= LITERAL_FIRST_ID for r in lits)
    # literal identified purely by id range (Database.cpp:3889-3894)
    enc = encode_triples(toy_triples, ent, lit, pred)
    for r in enc.collect():
        assert (r["o"] >= LITERAL_FIRST_ID) == (not r["o_is_entity"])


def test_routing_invariants(spark, toy_triples):
    n_parts = 3
    ent, lit, pred = build_dictionaries(toy_triples)
    enc = encode_triples(toy_triples, ent, lit, pred)
    routed = route_triples(enc, n_parts)
    rows = routed.collect()
    own = {r["s"]: None for r in rows}
    own_df = {r["v"]: r["part"] for r in
              routed.select(owner(F.col("s"), n_parts).alias("part"), F.col("s").alias("v")).collect()}
    # 1. primary copy lives in the subject's partition
    for r in rows:
        if not r["is_crossing"]:
            assert r["part"] == own_df[r["s"]]
    # 2. crossing entity edges are replicated to the object's partition
    base = {(r["s"], r["p"], r["o"]) for r in rows if not r["is_crossing"]}
    for r in rows:
        if r["is_crossing"]:
            assert r["o_is_entity"]
            assert (r["s"], r["p"], r["o"]) in base  # replica, not a new edge
    # 3. every entity-object edge exists in the object's partition too
    #    (star short-circuit property, Database.cpp:661-671)
    oparts = routed.filter("o_is_entity").select(
        "s", "p", "o", "part", owner(F.col("o"), n_parts).alias("want")
    )
    missing = oparts.groupBy("s", "p", "o", "want").agg(
        F.max((F.col("part") == F.col("want")).cast("int")).alias("hit")
    ).filter("hit = 0").count()
    assert missing == 0


def test_internal_flags(spark, toy_triples):
    n_parts = 3
    ent, lit, pred = build_dictionaries(toy_triples)
    enc = encode_triples(toy_triples, ent, lit, pred)
    routed = route_triples(enc, n_parts)
    internal = internal_vertices(routed, n_parts)
    chk = internal.withColumn("want", owner(F.col("v"), n_parts) == F.col("part"))
    assert chk.filter(F.col("is_internal") != F.col("want")).count() == 0
    # each vertex internal in exactly one partition
    per_v = internal.filter("is_internal").groupBy("v").count()
    assert per_v.filter("count > 1").count() == 0


def test_explicit_partition_map_worked_example(spark):
    """Reference worked example semantics (gloadD.cpp:118-153): mapped
    subject -> its partition; mapped entity object elsewhere -> crossing
    replica; subject unmapped + object mapped -> ONLY the object-partition
    copy; BOTH unmapped -> broadcast everywhere."""
    trips = spark.createDataFrame(
        [(1, 0, 2, True), (2, 0, 3, True), (9, 0, 1, True), (8, 0, 9, True)],
        ["s", "p", "o", "o_is_entity"],
    )
    pmap = spark.createDataFrame([(1, 0), (2, 1), (3, 1)], ["vid", "part"])
    routed = route_triples(trips, 2, partition_map=pmap)
    collected = routed.collect()
    rows = {(r["s"], r["o"], r["part"], r["is_crossing"]) for r in collected}
    assert (1, 2, 0, False) in rows and (1, 2, 1, True) in rows  # crossing edge
    assert (2, 3, 1, False) in rows and not any(
        r for r in rows if r[0] == 2 and r[2] == 0
    )  # co-located, no replica
    # subject unmapped, object mapped: exactly one copy, in the object's
    # partition (the round-1 code emitted a duplicate broadcast copy here)
    assert {(p, c) for s, o, p, c in rows if s == 9} == {(0, True)}
    # both endpoints unmapped: broadcast to every partition
    assert {(p, c) for s, o, p, c in rows if s == 8} == {(0, False), (1, False)}
    # no duplicate (s,p,o,part) rows anywhere — bag semantics stay exact
    assert len(collected) == len({(r["s"], r["o"], r["part"]) for r in collected})


def test_partition_map_not_broadcast_when_big(spark):
    """The partition map is per-vertex (reference holds it in a disk
    B+-tree, gloadD.cpp:44-65); a big map must go through a shuffle join,
    not a driver broadcast."""
    from gstored_spark.kg import link as LK

    big = spark.range(1000).select(F.col("id").alias("vid"), F.lit(0).alias("part"))
    assert LK.maybe_broadcast(big, limit_rows=100) is big  # hint withheld
    small = spark.range(10).select(F.col("id").alias("vid"), F.lit(0).alias("part"))
    assert LK.maybe_broadcast(small, limit_rows=100) is not small  # hinted

    # end-to-end: with the broadcast hint withheld and auto-broadcast off,
    # the routing plan contains no BroadcastExchange for the map joins
    trips = spark.range(500).select(
        F.col("id").alias("s"), F.lit(0).alias("p"),
        (F.col("id") + 1).alias("o"), F.lit(True).alias("o_is_entity"),
    )
    pmap = spark.range(600).select(F.col("id").alias("vid"), F.pmod("id", F.lit(4)).cast("int").alias("part"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        import unittest.mock as mock

        with mock.patch.object(LK, "maybe_broadcast", side_effect=lambda df, **kw: df):
            routed = route_triples(trips, 4, partition_map=pmap)
            plan = routed._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salting(spark):
    trips = spark.createDataFrame(
        [(1, 0, o, True) for o in range(200)] + [(2, 0, 5, True)],
        ["s", "p", "o", "o_is_entity"],
    )
    routed = route_triples(trips, 2)
    hot = hot_subjects(routed, salt_threshold=50)
    assert {r["s"] for r in hot.collect()} == {1}
    salted = salted_shuffle_key(routed, hot, salt_buckets=8)
    salts_hot = {r["salt"] for r in salted.filter("s = 1").collect()}
    assert len(salts_hot) > 1  # hot subject spread over buckets
    assert {r["salt"] for r in salted.filter("s = 2").collect()} == {0}
