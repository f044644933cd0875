"""Signature bit-exactness vs the reference formulas
(Signature/Signature.cpp:34-76,112-155) and containment semantics."""

from pyspark.sql import functions as F

from gstored_spark.functions.hashing import ap_hash, bkdr_hash, simple_hash
from gstored_spark.functions import signature as S


def test_hash_reference_values():
    # uint32 semantics spot checks (computed from the C++ definitions)
    assert simple_hash("") == 0
    assert simple_hash("a") == ord("a")
    assert simple_hash("ab") == (31 * 97 + 98)
    assert bkdr_hash("ab") == (131 * 97 + 98)
    # 31-bit masking
    for h in (simple_hash, ap_hash, bkdr_hash):
        v = h("<http://dbpedia.org/resource/Woody_Allen>")
        assert 0 <= v <= 0x7FFFFFFF
    # signed-char semantics for non-ASCII (Util.cpp: BKDR/AP iterate plain
    # char — signed on x86 — simpleHash iterates unsigned char): the byte
    # 0xC3 of 'é' enters BKDR sign-extended, i.e. as 0xC3 - 0x100 = -61
    b = "é".encode("utf-8")  # 0xC3 0xA9
    assert bkdr_hash("é") == ((131 * (0xC3 - 0x100) + (0xA9 - 0x100)) & 0xFFFFFFFF) & 0x7FFFFFFF
    assert simple_hash("é") == ((31 * 0xC3 + 0xA9) & 0xFFFFFFFF) & 0x7FFFFFFF


def test_hash_batch_matches_pure_python():
    from gstored_spark.functions.hashing import hash_family_batch

    strs = ["", "a", "ab", "<ent:x>", '"lit"@en', "é-ünïcødé-漢字",
            "<http://dbpedia.org/resource/Woody_Allen>", "x" * 300]
    h = hash_family_batch(strs)
    for i, s in enumerate(strs):
        assert h[0][i] == simple_hash(s), s
        assert h[1][i] == ap_hash(s), s
        assert h[2][i] == bkdr_hash(s), s


def test_str_bits_layout():
    ent = S.str_bits("<ent:x>")
    lit = S.str_bits('"some literal"@en')
    assert len(ent) == 3 and len(lit) == 3
    for i, b in enumerate(ent):
        assert 100 * i <= b < 100 * (i + 1)  # entity region [0,300)
    for i, b in enumerate(lit):
        assert 300 + 100 * i <= b < 300 + 100 * (i + 1)  # literal region
    assert S.str_bits("?var") == []
    # exact formula
    assert ent[0] == simple_hash("<ent:x>") % 100
    assert ent[1] == 100 + ap_hash("<ent:x>") % 100
    assert ent[2] == 200 + bkdr_hash("<ent:x>") % 100


def test_edge_bits_formula():
    for pid in (0, 1, 4, 5, 7, 12345):
        for out in (False, True):
            (b,) = S.edge_bits(pid, out)
            interval = pid % 5 + (5 if out else 0)
            want = 600 + 20 * interval + (pid * 5003 % 49957) % 20
            assert b == want
            assert 600 <= b < 800


def test_pack_and_covers_roundtrip(spark):
    bits_a = S.str_bits("<ent:a>") + S.edge_bits(3, True)
    bits_b = bits_a + S.str_bits('"extra"@en')
    packed_a, packed_b = S.pack_bits(bits_a), S.pack_bits(bits_b)
    df = spark.createDataFrame([(packed_a, packed_b)], ["qa", "db"])
    row = df.select(
        S.covers(F.col("db"), F.col("qa")).alias("sup"),
        S.covers(F.col("qa"), F.col("db")).alias("sub"),
    ).first()
    assert row["sup"] is True and row["sub"] is False


def test_sig_words_from_bits_matches_pack_bits(spark):
    data = [("v1", S.str_bits("<ent:a>") + S.edge_bits(2, True)),
            ("v1", S.str_bits('"l"@en') + S.edge_bits(2, False)),
            ("v2", S.edge_bits(9, True))]
    df = spark.createDataFrame(data, ["v", "bits"])
    got = {r["v"]: r["sig"] for r in S.sig_words_from_bits(df, ["v"]).collect()}
    assert got["v1"] == S.pack_bits(data[0][1] + data[1][1])
    assert got["v2"] == S.pack_bits(data[2][1])


def test_contribution_udf_matches_pure(spark):
    rows = [("<ent:neighbor>", 7, True), ('"lit"@en', 3, False)]
    df = spark.createDataFrame(rows, ["n", "p", "o"])
    got = df.select(
        S.contribution_bits_udf(F.col("n"), F.col("p"), F.col("o")).alias("bits")
    ).collect()
    for (n, p, o), r in zip(rows, got):
        assert sorted(r["bits"]) == sorted(S.contribution_bits(n, p, o))


def test_partition_or_aggregate_covers_members(spark):
    sigs = [("a", S.pack_bits(S.str_bits("<ent:a>"))),
            ("b", S.pack_bits(S.str_bits("<ent:b>") + S.edge_bits(1, False)))]
    df = spark.createDataFrame(sigs, ["v", "sig"]).withColumn("part", F.lit(0))
    root = S.sig_or(df, ["part"]).first()["sig"]
    rdf = spark.createDataFrame([(root,)], ["root"])
    for _, sig in sigs:
        assert rdf.select(S.covers(F.col("root"), F.lit(sig))).first()[0]


def test_term_bits_col_matches_pure(spark):
    """The catalyst higher-order term-bits expression (term_str_bits_col)
    is bit-exact to str_bits on ASCII, multi-byte UTF-8 (signed-char
    promotion!), literals, vars, and the empty string."""
    import random
    import string

    rng = random.Random(7)
    cases = ["<ent:a1>", '"special one"@en', "?v", "", "x" * 300]
    alphabet = string.ascii_letters + string.digits + "é中ÿ߿:<>\"@^#/._-"
    for _ in range(60):
        n = rng.randrange(0, 40)
        cases.append("".join(rng.choice(alphabet) for _ in range(n)))
    df = spark.createDataFrame([(c,) for c in cases], ["term"])
    got = {
        r["term"]: list(r["bits"])
        for r in df.select(
            "term", S.term_str_bits_col(F.col("term")).alias("bits")
        ).collect()
    }
    for c in cases:
        assert got[c] == S.str_bits(c), repr(c)
