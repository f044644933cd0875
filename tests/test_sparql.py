"""SPARQL text front-end: the reference's worked example executed VERBATIM
(example/query.txt + query_2.txt over dbpedia_example_distgStore.n3), plus
PREFIX / FILTER builtins / OPTIONAL / UNION / MINUS / modifiers / ASK text
syntax, all cross-checked against a pure-python BGP matcher or hand-derived
expectations."""

import itertools
import re

import pytest
from pyspark.sql import functions as F

from gstored_spark.plans.sparql import parse_sparql, run_sparql
from gstored_spark.sources.ntriples import read_ntriples

EXAMPLE_N3 = "/root/reference/example/dbpedia_example_distgStore.n3"
EXAMPLE_Q1 = "/root/reference/example/query.txt"
EXAMPLE_Q2 = "/root/reference/example/query_2.txt"


def _pure_triples():
    out = []
    line = re.compile(r"^\s*(<[^>]+>)\s+(<[^>]+>)\s+(.+?)\s*\.\s*$")
    with open(EXAMPLE_N3) as f:
        for ln in f:
            m = line.match(ln)
            if m:
                out.append((m.group(1), m.group(2), m.group(3)))
    return out


def _pure_bgp(triples, patterns, proj):
    """Brute-force homomorphism matcher (the semantics of Join::multi_join,
    Database/Join.cpp:1418-1633) used as the oracle for the verbatim run."""
    results = set()
    for combo in itertools.product(triples, repeat=len(patterns)):
        binding = {}
        ok = True
        for (s, p, o), pat in zip(combo, patterns):
            for term, val in ((pat.s, s), (pat.p, p), (pat.o, o)):
                if term.startswith("?"):
                    if binding.get(term, val) != val:
                        ok = False
                        break
                    binding[term] = val
                elif term != val:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            results.add(tuple(binding["?" + v] for v in proj))
    return results


@pytest.fixture(scope="module")
def example_triples(spark):
    return read_ntriples(spark, EXAMPLE_N3).persist()


@pytest.mark.parametrize("qfile", [EXAMPLE_Q1, EXAMPLE_Q2])
def test_reference_example_verbatim(spark, example_triples, qfile):
    text = open(qfile).read()
    q = parse_sparql(text)
    got = {tuple(r) for r in run_sparql(example_triples, text).collect()}
    want = _pure_bgp(_pure_triples(), q.group.patterns, q.projection)
    assert got == want
    if qfile == EXAMPLE_Q1:
        # query.txt has 7 distinct spouse/director/starring matches (6 via
        # Woody Allen/Louise Lasser, 1 via Edmond O'Brien/Nancy Kelly);
        # query_2.txt's triangle has NO homomorphism in the 29-triple
        # example (no film directed by one spouse stars the other) — the
        # empty result is the correct answer and both matchers agree on it.
        assert len(want) == 7


def test_prefix_expansion(spark, example_triples):
    text = """
        PREFIX dbo: <http://dbpedia.org/ontology/>
        PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        SELECT ?f ?n WHERE {
            ?f dbo:director <http://dbpedia.org/resource/Woody_Allen> .
            ?f foaf:name ?n .
        }
    """
    rows = run_sparql(example_triples, text).collect()
    assert len(rows) > 0
    assert all(r["n"].startswith('"') for r in rows)


def test_filter_builtins(spark):
    triples = spark.createDataFrame(
        [
            ("<ent:a>", "<p:name>", '"Alice"@en'),
            ("<ent:b>", "<p:name>", '"Bob"@fr'),
            ("<ent:c>", "<p:name>", '"Carol"'),
            ("<ent:a>", "<p:age>", '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'),
            ("<ent:b>", "<p:age>", '"17"^^<http://www.w3.org/2001/XMLSchema#integer>'),
            ("<ent:a>", "<p:knows>", "<ent:b>"),
        ],
        ["subj", "pred", "obj"],
    )
    run = lambda t: {tuple(r) for r in run_sparql(triples, t).collect()}

    # LANG + LANGMATCHES
    assert run('SELECT ?s WHERE { ?s <p:name> ?n . FILTER (LANG(?n) = "en") }') == {("<ent:a>",)}
    assert run('SELECT ?s WHERE { ?s <p:name> ?n . FILTER LANGMATCHES(LANG(?n), "*") }') == {
        ("<ent:a>",), ("<ent:b>",)
    }
    # numeric comparison on typed literal
    assert run("SELECT ?s WHERE { ?s <p:age> ?a . FILTER (?a >= 18) }") == {("<ent:a>",)}
    # arithmetic
    assert run("SELECT ?s WHERE { ?s <p:age> ?a . FILTER (?a * 2 > 50) }") == {("<ent:a>",)}
    # STR / REGEX (case-insensitive flag)
    assert run('SELECT ?s WHERE { ?s <p:name> ?n . FILTER REGEX(?n, "^ali", "i") }') == {("<ent:a>",)}
    # isIRI / isLITERAL on object position
    assert run("SELECT ?o WHERE { <ent:a> ?p ?o . FILTER isIRI(?o) }") == {("<ent:b>",)}
    assert run("SELECT ?o WHERE { <ent:a> ?p ?o . FILTER isLITERAL(?o) }") == {
        ('"Alice"@en',), ('"42"^^<http://www.w3.org/2001/XMLSchema#integer>',)
    }
    # DATATYPE
    assert run(
        "SELECT ?s WHERE { ?s <p:age> ?a . FILTER (DATATYPE(?a) = "
        "<http://www.w3.org/2001/XMLSchema#integer>) }"
    ) == {("<ent:a>",), ("<ent:b>",)}
    # sameTerm / plain-literal value comparison
    assert run('SELECT ?s WHERE { ?s <p:name> ?n . FILTER (?n = "Carol") }') == {("<ent:c>",)}
    # IN
    assert run('SELECT ?s WHERE { ?s <p:name> ?n . FILTER (STR(?n) IN ("Alice", "Bob")) }') == {
        ("<ent:a>",), ("<ent:b>",)
    }
    # BOUND over OPTIONAL (post-filter placement)
    assert run(
        "SELECT ?s WHERE { ?s <p:name> ?n . OPTIONAL { ?s <p:age> ?a } "
        "FILTER (!BOUND(?a)) }"
    ) == {("<ent:c>",)}


def test_group_algebra_text(spark, example_triples):
    # UNION
    got = run_sparql(
        example_triples,
        """SELECT ?x WHERE {
            { ?x <http://dbpedia.org/ontology/director> <http://dbpedia.org/resource/Woody_Allen> }
            UNION
            { ?x <http://dbpedia.org/ontology/starring> <http://dbpedia.org/resource/Mia_Farrow> }
        }""",
    ).count()
    a = example_triples.filter(
        (F.col("pred") == "<http://dbpedia.org/ontology/director>")
        & (F.col("obj") == "<http://dbpedia.org/resource/Woody_Allen>")
    ).count()
    b = example_triples.filter(
        (F.col("pred") == "<http://dbpedia.org/ontology/starring>")
        & (F.col("obj") == "<http://dbpedia.org/resource/Mia_Farrow>")
    ).count()
    assert got == a + b and got > 0

    # OPTIONAL keeps unmatched left rows with NULL
    rows = run_sparql(
        example_triples,
        """SELECT ?f ?n WHERE {
            ?f <http://dbpedia.org/ontology/director> ?d .
            OPTIONAL { ?f <http://xmlns.com/foaf/0.1/name> ?n }
        }""",
    ).collect()
    assert len(rows) > 0

    # MINUS removes matching rows
    all_films = run_sparql(
        example_triples, "SELECT ?f WHERE { ?f <http://dbpedia.org/ontology/director> ?d }"
    ).count()
    minus = run_sparql(
        example_triples,
        """SELECT ?f WHERE {
            ?f <http://dbpedia.org/ontology/director> ?d .
            MINUS { ?f <http://xmlns.com/foaf/0.1/name> ?n }
        }""",
    ).count()
    assert minus < all_films


def test_modifiers_and_ask(spark, example_triples):
    rows = run_sparql(
        example_triples,
        """SELECT DISTINCT ?p WHERE { ?s ?p ?o } ORDER BY ?p LIMIT 2 OFFSET 1""",
    ).collect()
    preds = [r["p"] for r in rows]
    assert preds == sorted(preds) and len(preds) == 2

    assert run_sparql(
        example_triples,
        "ASK { ?f <http://dbpedia.org/ontology/director> <http://dbpedia.org/resource/Woody_Allen> }",
    ).count() == 1
    assert run_sparql(
        example_triples, "ASK { ?f <http://dbpedia.org/ontology/director> <ent:nobody> }"
    ).count() == 0


def test_select_star(spark, example_triples):
    df = run_sparql(
        example_triples,
        "SELECT * WHERE { ?f <http://dbpedia.org/ontology/director> ?d }",
    )
    assert df.columns == ["f", "d"]
    assert df.count() > 0


def test_update_text_forms(spark):
    """INSERT DATA / DELETE DATA / DELETE WHERE text parsing + execution
    (GeneralEvaluation.cpp:3008-3065 surface)."""
    from gstored_spark.plans.sparql import parse_update, run_update

    triples = spark.createDataFrame(
        [("<e:a>", "<p:knows>", "<e:b>", True),
         ("<e:a>", "<p:name>", '"al"@en', False)],
        ["subj", "pred", "obj", "o_is_entity"],
    )
    out = run_update(triples, 'INSERT DATA { <e:c> <p:knows> <e:a> . }')
    assert out.count() == 3
    out = run_update(triples, 'DELETE DATA { <e:a> <p:knows> <e:b> . }')
    assert {r["subj"] for r in out.collect()} == {"<e:a>"} and out.count() == 1
    out = run_update(triples, "DELETE WHERE { ?x <p:knows> ?y }")
    assert out.count() == 1  # only the name triple survives
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_update("INSERT DATA { ?x <p:knows> <e:b> . }")  # non-ground


def test_modify_text_form(spark):
    """MODIFY (DELETE {...} INSERT {...} WHERE {...}) — the reference's
    most common read-write statement (dispatch Database.cpp:619-635,
    materialization GeneralEvaluation.cpp:3008-3065)."""
    from gstored_spark.plans.sparql import parse_update, run_update

    triples = spark.createDataFrame(
        [("<e:a>", "<p:knows>", "<e:b>", True),
         ("<e:b>", "<p:knows>", "<e:c>", True),
         ("<e:a>", "<p:name>", '"al"@en', False)],
        ["subj", "pred", "obj", "o_is_entity"],
    )
    u = parse_update(
        "DELETE { ?x <p:knows> ?y } INSERT { ?y <p:known_by> ?x } "
        "WHERE { ?x <p:knows> ?y }"
    )
    assert u.form == "modify"
    assert len(u.delete_templates) == 1 and len(u.insert_templates) == 1
    out = run_update(
        triples,
        "DELETE { ?x <p:knows> ?y } INSERT { ?y <p:known_by> ?x } "
        "WHERE { ?x <p:knows> ?y }",
    )
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert got == {
        ("<e:b>", "<p:known_by>", "<e:a>"),
        ("<e:c>", "<p:known_by>", "<e:b>"),
        ("<e:a>", "<p:name>", '"al"@en'),
    }
    # INSERT-only form (no delete clause)
    out = run_update(
        triples, "INSERT { ?x <p:linked> ?y } WHERE { ?x <p:knows> ?y }"
    )
    assert out.count() == 5
    # DELETE-only form with a filtered WHERE
    out = run_update(
        triples,
        "DELETE { ?x <p:knows> ?y } WHERE { ?x <p:knows> ?y . "
        "FILTER (?y = <e:c>) }",
    )
    assert out.count() == 2
    # template groups must be plain triples
    with pytest.raises(ValueError):
        parse_update(
            "DELETE { ?x <p:knows> ?y . FILTER (?x = ?y) } WHERE { ?x <p:knows> ?y }"
        )


def test_predicate_object_lists(spark):
    """';' and ',' lists in group patterns desugar to triples sharing the
    subject / the (subject, predicate) — the Turtle loop shape."""
    triples = spark.createDataFrame(
        [("<e:a>", "<p:knows>", "<e:b>"),
         ("<e:a>", "<p:name>", '"al"'),
         ("<e:b>", "<p:name>", '"bee"')],
        ["subj", "pred", "obj"],
    )
    got = {tuple(r) for r in run_sparql(
        triples,
        'SELECT ?x ?n WHERE { ?x <p:knows> ?y ; <p:name> ?n . }',
    ).collect()}
    assert got == {("<e:a>", '"al"')}
    # object list: ?x knows <e:b>, <e:c> -> both edges required
    q = parse_sparql("SELECT ?x WHERE { ?x <p:knows> <e:b> , <e:c> . }")
    assert len(q.group.patterns) == 2
    assert {p.o for p in q.group.patterns} == {"<e:b>", "<e:c>"}


def test_order_by_non_projected_and_unbound_projection(spark):
    triples = spark.createDataFrame(
        [("<e:a>", "<p:age>", '"3"^^<http://www.w3.org/2001/XMLSchema#integer>'),
         ("<e:b>", "<p:age>", '"1"^^<http://www.w3.org/2001/XMLSchema#integer>'),
         ("<e:c>", "<p:age>", '"2"^^<http://www.w3.org/2001/XMLSchema#integer>')],
        ["subj", "pred", "obj"],
    )
    # ORDER BY a var that is not projected
    rows = run_sparql(
        triples, "SELECT ?x WHERE { ?x <p:age> ?a } ORDER BY ?a"
    ).collect()
    assert [r["x"] for r in rows] == ["<e:b>", "<e:c>", "<e:a>"]
    # projecting a var bound nowhere yields NULL, not an AnalysisException
    rows = run_sparql(triples, "SELECT ?x ?ghost WHERE { ?x <p:age> ?a }").collect()
    assert len(rows) == 3 and all(r["ghost"] is None for r in rows)


def test_num_term_exponent_is_double():
    """Query constants with exponents must match Turtle-normalized data:
    exponent -> xsd:double (sources/turtle.py), fraction -> xsd:decimal."""
    from gstored_spark.plans.sparql import _Parser

    assert _Parser.num_term("1e3") == '"1e3"^^<http://www.w3.org/2001/XMLSchema#double>'
    assert _Parser.num_term("1.5") == '"1.5"^^<http://www.w3.org/2001/XMLSchema#decimal>'
    assert _Parser.num_term("-7") == '"-7"^^<http://www.w3.org/2001/XMLSchema#integer>'


def test_filter_exists_text(spark):
    """FILTER EXISTS / NOT EXISTS text forms -> semi/anti joins on shared
    vars (GeneralEvaluation.cpp:2257-2286 nested-group existence)."""
    triples = spark.createDataFrame(
        [("<e:a>", "<p:knows>", "<e:b>"),
         ("<e:b>", "<p:knows>", "<e:c>"),
         ("<e:a>", "<p:name>", '"al"@en')],
        ["subj", "pred", "obj"],
    )
    run = lambda t: {tuple(r) for r in run_sparql(triples, t).collect()}
    assert run(
        "SELECT ?x WHERE { ?x <p:knows> ?y . FILTER EXISTS { ?x <p:name> ?n } }"
    ) == {("<e:a>",)}
    assert run(
        "SELECT ?x WHERE { ?x <p:knows> ?y . FILTER NOT EXISTS { ?x <p:name> ?n } }"
    ) == {("<e:b>",)}


# -- SPARQL 1.1 aggregation / BIND / VALUES (beyond the reference grammar) --


@pytest.fixture(scope="module")
def agg_triples(spark):
    rows = [
        ("c1", "<in>", "n1"), ("c2", "<in>", "n1"), ("c3", "<in>", "n2"),
        ("c1", "<bal>", '"10"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("c2", "<bal>", '"30"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("c3", "<bal>", '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_group_by_having(spark, agg_triples):
    got = run_sparql(
        agg_triples,
        "SELECT ?n (COUNT(?c) AS ?cnt) WHERE { ?c <in> ?n } "
        "GROUP BY ?n HAVING (COUNT(?c) > 1)",
    ).collect()
    assert [(r["n"], r["cnt"]) for r in got] == [("n1", 2)]


def test_global_aggregate_and_arith_arg(spark, agg_triples):
    (row,) = run_sparql(
        agg_triples,
        "SELECT (SUM(?b) AS ?t) (COUNT(*) AS ?n) (MIN(?b + 0) AS ?lo) "
        "WHERE { ?c <bal> ?b }",
    ).collect()
    assert (row["t"], row["n"], row["lo"]) == (45.0, 3, 5.0)


def test_select_expression_over_aggregate(spark, agg_triples):
    # (COUNT(?c) * 2 AS ?dbl): agg runs hidden, expression applies after
    (row,) = run_sparql(
        agg_triples, "SELECT (COUNT(?c) * 2 AS ?dbl) WHERE { ?c <in> ?n }"
    ).collect()
    assert row["dbl"] == 6.0


def test_group_by_without_aggregates_is_distinct_keys(spark, agg_triples):
    got = run_sparql(
        agg_triples, "SELECT ?n WHERE { ?c <in> ?n } GROUP BY ?n"
    ).collect()
    assert sorted(r["n"] for r in got) == ["n1", "n2"]


def test_aggregate_outside_select_rejected(spark):
    import pytest as _pytest

    from gstored_spark.plans.sparql import parse_sparql

    with _pytest.raises(ValueError, match="only allowed"):
        parse_sparql("SELECT ?x WHERE { ?x <p> ?y . FILTER (COUNT(?y) > 1) }")


def test_bind_feeds_filter(spark, agg_triples):
    got = run_sparql(
        agg_triples,
        'SELECT ?c WHERE { ?c <in> ?n . BIND(REGEX(?c, "1$") AS ?f) '
        "FILTER (?f) }",
    ).collect()
    assert [r["c"] for r in got] == ["c1"]


def test_values_single_and_multi_var(spark, agg_triples):
    got = run_sparql(
        agg_triples,
        'SELECT ?c ?n WHERE { ?c <in> ?n . VALUES ?n { "n2" } }',
    ).collect()
    assert [tuple(r) for r in got] == [("c3", "n2")]
    rows = run_sparql(
        agg_triples,
        'SELECT ?x ?y WHERE { VALUES (?x ?y) { ("a" "b") ("c" UNDEF) } }',
    ).collect()
    assert sorted((r["x"], r["y"]) for r in rows) == [("a", "b"), ("c", None)]


def test_construct_templates(spark, agg_triples):
    out = run_sparql(
        agg_triples,
        "CONSTRUCT { ?c <member_of> ?n . ?n <has> ?c } WHERE { ?c <in> ?n }",
    )
    assert out.columns == ["subj", "pred", "obj"]
    got = {tuple(r) for r in out.collect()}
    assert ("c1", "<member_of>", "n1") in got
    assert ("n1", "<has>", "c1") in got
    assert len(got) == 6


def test_construct_drops_incomplete_instantiations(spark, agg_triples):
    # ?z bound nowhere -> its template instantiations all drop
    out = run_sparql(
        agg_triples,
        "CONSTRUCT { ?c <member_of> ?z } WHERE { ?c <in> ?n }",
    )
    assert out.count() == 0


def test_subselect_scoping_and_join(spark, agg_triples):
    out = run_sparql(
        agg_triples,
        """SELECT ?c ?n ?cnt WHERE {
             ?c <in> ?n .
             { SELECT ?n (COUNT(?c) AS ?cnt) WHERE { ?c <in> ?n } GROUP BY ?n }
           }""",
    )
    # inner ?c is invisible outside (projected vars only join): every outer
    # member row survives, annotated with its group's count
    assert sorted(map(tuple, out.collect())) == [
        ("c1", "n1", 2), ("c2", "n1", 2), ("c3", "n2", 1),
    ]


def test_group_concat_and_sample(spark, agg_triples):
    out = run_sparql(
        agg_triples,
        'SELECT ?n (GROUP_CONCAT(?c; SEPARATOR="|") AS ?m) (SAMPLE(?c) AS ?s) '
        "WHERE { ?c <in> ?n } GROUP BY ?n",
    ).collect()
    got = {r["n"]: (r["m"], r["s"]) for r in out}
    assert got == {"n1": ("c1|c2", "c1"), "n2": ("c3", "c3")}


def test_string_and_conditional_builtins(spark):
    t = spark.createDataFrame(
        [("a", "<name>", '"Alice Smith"@en'), ("b", "<name>", '"bob"')],
        "subj string, pred string, obj string",
    )
    out = run_sparql(
        t,
        """SELECT ?s ?up ?l ?first ?before ?after ?iffy ?cat WHERE {
             ?s <name> ?n .
             BIND(UCASE(?n) AS ?up)
             BIND(STRLEN(?n) AS ?l)
             BIND(SUBSTR(?n, 1, 3) AS ?first)
             BIND(STRBEFORE(?n, " ") AS ?before)
             BIND(STRAFTER(?n, " ") AS ?after)
             BIND(IF(CONTAINS(?n, "Smith"), "hit", "miss") AS ?iffy)
             BIND(CONCAT(?s, "/", LCASE(?n)) AS ?cat)
           }""",
    )
    got = {r["s"]: r for r in out.collect()}
    a = got["a"]
    assert (a["up"], a["l"], a["first"]) == ("ALICE SMITH", 11, "Ali")
    assert (a["before"], a["after"], a["iffy"]) == ("Alice", "Smith", "hit")
    assert a["cat"] == "a/alice smith"
    b = got["b"]
    # separator absent -> STRBEFORE/STRAFTER return "" (spec)
    assert (b["before"], b["after"], b["iffy"]) == ("", "", "miss")


def test_numeric_builtins(spark):
    t = spark.createDataFrame(
        [("x", "<v>", '"-2.6"^^<http://www.w3.org/2001/XMLSchema#decimal>')],
        "subj string, pred string, obj string",
    )
    (r,) = run_sparql(
        t,
        """SELECT ?a ?c ?f ?r WHERE {
             ?s <v> ?v .
             BIND(ABS(?v) AS ?a) BIND(CEIL(?v) AS ?c)
             BIND(FLOOR(?v) AS ?f) BIND(ROUND(?v) AS ?r)
           }""",
    ).collect()
    assert (r["a"], r["c"], r["f"], r["r"]) == (2.6, -2.0, -3.0, -3.0)


def test_describe_constant_and_var(spark, agg_triples):
    # constant: every triple touching n1 (as subj or obj)
    out = run_sparql(agg_triples, 'DESCRIBE "n1"')
    assert {tuple(r) for r in out.collect()} == {
        ("c1", "<in>", "n1"), ("c2", "<in>", "n1"),
    }
    # var form: describe members of n2 -> their triples in BOTH directions
    out2 = run_sparql(
        agg_triples, 'DESCRIBE ?c WHERE { ?c <in> ?n . VALUES ?n { "n2" } }'
    )
    got = {tuple(r) for r in out2.collect()}
    assert ("c3", "<in>", "n2") in got and ("c3", "<bal>",
        '"5"^^<http://www.w3.org/2001/XMLSchema#integer>') in got
    assert len(got) == 2


def test_bind_over_optional_var_defers(spark):
    t = spark.createDataFrame(
        [("a", "<p>", "x"), ("b", "<p>", "y"), ("a", "<q>", "z")],
        "subj string, pred string, obj string",
    )
    out = run_sparql(
        t,
        """SELECT ?s ?l WHERE {
             ?s <p> ?o OPTIONAL { ?s <q> ?x } BIND(STRLEN(?x) AS ?l)
           }""",
    )
    got = {r["s"]: r["l"] for r in out.collect()}
    # OPTIONAL miss -> ?x NULL -> STRLEN(?x) NULL, not an analysis error
    assert got == {"a": 1, "b": None}


def test_select_star_includes_bind_values_subselect_vars(spark, agg_triples):
    out = run_sparql(
        agg_triples,
        'SELECT * WHERE { ?c <in> ?n . BIND(STRLEN(?c) AS ?l) }',
    )
    assert set(out.columns) == {"c", "n", "l"}
    out2 = run_sparql(agg_triples, 'SELECT * WHERE { VALUES ?x { "a" "b" } }')
    assert out2.columns == ["x"] and out2.count() == 2
    out3 = run_sparql(
        agg_triples,
        """SELECT * WHERE {
             ?c <in> ?n .
             { SELECT ?n (COUNT(?c) AS ?cnt) WHERE { ?c <in> ?n } GROUP BY ?n }
           }""",
    )
    assert set(out3.columns) == {"c", "n", "cnt"}


def test_update_groups_reject_paths_and_binds(spark):
    import pytest as _pytest

    from gstored_spark.plans.sparql import parse_update

    with _pytest.raises(ValueError, match="only triple"):
        parse_update("DELETE WHERE { ?s <p>/<q> ?o }")
    with _pytest.raises(ValueError, match="only triple"):
        parse_update('INSERT DATA { <a> <p> "x" . VALUES ?x { "y" } }')
    # MODIFY's WHERE group evaluates through eval_group, so paths there
    # are legal — only template/data groups reject them
    u = parse_update("DELETE { ?s <broke> ?o } WHERE { ?s <p>/<q> ?o }")
    assert u.where.path_patterns


def test_values_undef_is_join_compatible(spark, agg_triples):
    """An UNDEF cell is the spec's wildcard: the row constrains only its
    bound vars — an inner join keyed on the NULL would drop solutions."""
    got = run_sparql(
        agg_triples,
        'SELECT ?c ?n WHERE { ?c <in> ?n . '
        'VALUES (?c ?n) { ("c1" UNDEF) (UNDEF "n2") } }',
    ).collect()
    assert sorted((r["c"], r["n"]) for r in got) == [("c1", "n1"), ("c3", "n2")]
    # mixed bound/UNDEF rows in the SAME var
    got = run_sparql(
        agg_triples,
        'SELECT ?c ?n WHERE { ?c <in> ?n . '
        'VALUES (?c ?n) { ("c2" "n1") ("c3" UNDEF) } }',
    ).collect()
    assert sorted((r["c"], r["n"]) for r in got) == [("c2", "n1"), ("c3", "n2")]


def test_sequential_bind_scoping(spark):
    """A triple pattern AFTER a BIND that mentions its var must treat the
    computed value as a binding (join key), not have it overwritten."""
    rows = [
        ("a", "<p>", "x"),
        ("x_tag", "<q>", "hit"),
        ("y_tag", "<q>", "other"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = run_sparql(
        t,
        'SELECT ?s ?z ?r WHERE { ?s <p> ?y . '
        'BIND(CONCAT(?y, "_tag") AS ?z) . ?z <q> ?r }',
    ).collect()
    assert [(r["s"], r["z"], r["r"]) for r in got] == [("a", "x_tag", "hit")]
    # a BIND consuming a var bound only by the tail pattern defers cleanly
    got = run_sparql(
        t,
        'SELECT ?s ?rr WHERE { ?s <p> ?y . '
        'BIND(CONCAT(?y, "_tag") AS ?z) . ?z <q> ?r . '
        "BIND(UCASE(?r) AS ?rr) }",
    ).collect()
    assert [(r["s"], r["rr"]) for r in got] == [("a", "HIT")]
