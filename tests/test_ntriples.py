"""N-Triples source/sink roundtrip + worked-example-shaped data
(lexical-form semantics per Parser/RDFParser.cpp:36-63)."""

from gstored_spark.plans.bgp import run_query_text
from gstored_spark.sources.ntriples import read_ntriples, write_ntriples

EXAMPLE = """\
<ex:Woody>\t<ex:name>\t"Woody A."@en.
<ex:Woody>\t<ex:spouse>\t<ex:Louise>.
<ex:Sleeper>\t<ex:director>\t<ex:Woody>.
<ex:Sleeper>\t<ex:starring>\t<ex:Louise>.
<ex:Louise>\t<ex:name>\t"Louise L."@en.
malformed line without triple
<ex:Count>\t<ex:value>\t"42"^^<http://www.w3.org/2001/XMLSchema#integer>.
"""


def test_read_ntriples_and_query(spark, tmp_path):
    p = tmp_path / "ex.n3"
    p.write_text(EXAMPLE)
    t = read_ntriples(spark, str(p))
    rows = {(r["subj"], r["pred"], r["obj"], r["o_is_entity"]) for r in t.collect()}
    assert len(rows) == 6  # malformed line dropped
    assert ("<ex:Woody>", "<ex:spouse>", "<ex:Louise>", True) in rows
    assert ("<ex:Woody>", "<ex:name>", '"Woody A."@en', False) in rows
    assert ("<ex:Count>", "<ex:value>",
            '"42"^^<http://www.w3.org/2001/XMLSchema#integer>', False) in rows

    # the reference's triangle query shape over the parsed file
    q = """select ?f ?a where {
    ?f <ex:director> ?w.
    ?f <ex:starring> ?a.
    ?w <ex:spouse> ?a.
    }"""
    m = [tuple(r) for r in run_query_text(t, q, distinct=True).collect()]
    assert m == [("<ex:Sleeper>", "<ex:Louise>")]


def test_ntriples_roundtrip(spark, tmp_path):
    p = tmp_path / "in.n3"
    p.write_text(EXAMPLE)
    t = read_ntriples(spark, str(p))
    out = tmp_path / "out"
    write_ntriples(t, str(out))
    t2 = read_ntriples(spark, str(out))
    a = {tuple(r) for r in t.collect()}
    b = {tuple(r) for r in t2.collect()}
    assert a == b


def test_read_turtle_prefixes_and_lists(spark, tmp_path):
    """Turtle source: prefixes, ;/, lists, typed-literal normalization
    exactly as the reference ingest (Parser/RDFParser.cpp:33-62)."""
    from gstored_spark.sources.turtle import read_turtle

    doc = """
    @prefix dbo: <http://dbpedia.org/ontology/> .
    @prefix foaf: <http://xmlns.com/foaf/0.1/> .
    dbo:W foaf:name "Woody Allen"@en ;
        dbo:age 42 ;
        dbo:spouse dbo:L, _:b1 .
    _:b1 foaf:name "esc\\"aped" .
    """
    p = tmp_path / "t.ttl"
    p.write_text(doc)
    got = {tuple(r) for r in read_turtle(spark, str(p)).collect()}
    assert ("<http://dbpedia.org/ontology/W>", "<http://xmlns.com/foaf/0.1/name>",
            '"Woody Allen"@en', False) in got
    assert ("<http://dbpedia.org/ontology/W>", "<http://dbpedia.org/ontology/age>",
            '"42"^^<http://www.w3.org/2001/XMLSchema#integer>', False) in got
    assert ("<http://dbpedia.org/ontology/W>", "<http://dbpedia.org/ontology/spouse>",
            "<http://dbpedia.org/ontology/L>", True) in got
    assert ("<http://dbpedia.org/ontology/W>", "<http://dbpedia.org/ontology/spouse>",
            "_:b1", True) in got
    assert ("_:b1", "<http://xmlns.com/foaf/0.1/name>", '"esc"aped"', False) in got


def test_turtle_anonymous_blanks_and_collections():
    """[...] desugars to fresh _: labels with nested property lists;
    (...) desugars to rdf:first/rdf:rest chains ending in rdf:nil
    (Parser/TurtleParser.cpp blankNodePropertyList / collection) — checked
    against hand-derived triples for a nested-bracket document."""
    from gstored_spark.sources.turtle import parse_turtle

    doc = """
    @prefix ex: <http://ex.org/> .
    ex:a ex:knows [ ex:name "Anon" ; ex:knows [ ex:name "Deep" ] ] .
    [ ex:label "subjectless" ] .
    ex:a ex:list ( ex:x "2"^^<http://www.w3.org/2001/XMLSchema#int> ) .
    ex:a ex:empty () .
    """
    EX = "http://ex.org/"
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    got = set(parse_turtle(doc))
    assert got == {
        ("_:b1", f"<{EX}name>", '"Anon"', False),
        ("_:b2", f"<{EX}name>", '"Deep"', False),
        ("_:b1", f"<{EX}knows>", "_:b2", True),
        (f"<{EX}a>", f"<{EX}knows>", "_:b1", True),
        ("_:b3", f"<{EX}label>", '"subjectless"', False),
        ("_:b4", f"<{RDF}first>", f"<{EX}x>", True),
        ("_:b4", f"<{RDF}rest>", "_:b5", True),
        ("_:b5", f"<{RDF}first>",
         '"2"^^<http://www.w3.org/2001/XMLSchema#int>', False),
        ("_:b5", f"<{RDF}rest>", f"<{RDF}nil>", True),
        (f"<{EX}a>", f"<{EX}list>", "_:b4", True),
        (f"<{EX}a>", f"<{EX}empty>", f"<{RDF}nil>", True),
    }
    # generated labels avoid collision with document labels
    doc2 = "@prefix ex: <http://ex.org/> .\n_:b1 ex:p [ ex:q _:b1 ] ."
    rows = set(parse_turtle(doc2))
    anon = {s for s, _, _, _ in rows if s.startswith("_:bb")}
    assert len(anon) == 1  # fresh label took the non-colliding _:bb prefix
