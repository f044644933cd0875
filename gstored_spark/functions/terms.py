"""RDF-term builtin functions over stored lexical forms — pure column
expressions (regexp/when/substring), zero Python in the data path.

The engine stores every RDF term as its lexical form, exactly like the
reference (Parser/RDFParser.cpp:36-63 normalization):

  IRI            ``<http://...>``
  blank node     ``_:label``
  plain literal  ``"abc"``
  lang literal   ``"abc"@en``
  typed literal  ``"42"^^<http://www.w3.org/2001/XMLSchema#integer>``

The reference evaluates the SPARQL 1.0 builtin set over these forms inside
FILTER trees (Query/QueryTree.h:118-119 BuiltinFuncType = STR | LANG |
LANGMATCHES | DATATYPE | BOUND | sameTERM | isIRI | isURI | isBLANK |
isLITERAL; evaluation GeneralEvaluation.cpp:1535-1851 with the multitype
value lattice GeneralEvaluation.h:118-133). Each function below is the
column twin of one of those, plus ``num_of`` — the typed-numeric extraction
the lattice performs before arithmetic/comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

# lexical-form classifiers ----------------------------------------------------


def is_iri(t: Column) -> Column:
    """isIRI/isURI(term) — IRIs are <>-wrapped (RDFParser.cpp:42)."""
    return t.isNotNull() & t.startswith("<")


def is_blank(t: Column) -> Column:
    """isBLANK(term) — blank nodes keep the _: prefix."""
    return t.isNotNull() & t.startswith("_:")


def is_literal(t: Column) -> Column:
    """isLITERAL(term) — literals are quote-led (RDFParser.cpp:47-62)."""
    return t.isNotNull() & t.startswith('"')


def bound(t: Column) -> Column:
    """BOUND(?v) — unbound vars surface as NULL columns (OPTIONAL pads
    with -1 in the reference, GeneralEvaluation.cpp:1217-1269; NULL here)."""
    return t.isNotNull()


def same_term(a: Column, b: Column) -> Column:
    """sameTerm — identity of lexical forms (the reference compares ids)."""
    return a == b


# accessors -------------------------------------------------------------------

_LEX = r'^"((?:[^"\\]|\\.)*)"'  # group 1 = literal lexical value


def str_of(t: Column) -> Column:
    """STR(term): IRI -> text between <>; literal -> lexical value without
    quotes/tags (GeneralEvaluation.cpp STR case)."""
    return (
        F.when(is_iri(t), F.regexp_extract(t, r"^<(.*)>$", 1))
        .when(is_literal(t), F.regexp_extract(t, _LEX, 1))
        .otherwise(t)
    )


def lang_of(t: Column) -> Column:
    """LANG(literal): language tag lowercased, '' when none (SPARQL 1.0)."""
    return F.when(
        is_literal(t), F.lower(F.regexp_extract(t, _LEX + r"@([A-Za-z0-9\-]+)$", 2))
    ).otherwise(F.lit(""))


def datatype_of(t: Column) -> Column:
    """DATATYPE(literal): explicit ^^<dt>, rdf:langString for @lang literals,
    xsd:string for plain literals, NULL for non-literals."""
    explicit = F.regexp_extract(t, _LEX + r"\^\^<(.*)>$", 2)
    return F.when(
        is_literal(t),
        F.when(explicit != "", F.concat(F.lit("<"), explicit, F.lit(">")))
        .when(lang_of(t) != "", F.lit(f"<{RDF_LANGSTRING}>"))
        .otherwise(F.lit(f"<{XSD}string>")),
    ).otherwise(F.lit(None).cast("string"))


def lang_matches(lang: Column, rng: Column) -> Column:
    """LANGMATCHES(lang, range): '*' matches any non-empty tag; otherwise
    case-insensitive exact-or-prefix ('en' matches 'en-US')."""
    lang_lc, rng_lc = F.lower(lang), F.lower(rng)
    return F.when(rng_lc == "*", lang_lc != "").otherwise(
        (lang_lc == rng_lc) | lang_lc.startswith(F.concat(rng_lc, F.lit("-")))
    )


_NUM_TYPES = (
    "integer|decimal|double|float|long|int|short|byte|nonNegativeInteger|"
    "positiveInteger|negativeInteger|nonPositiveInteger|unsignedLong|"
    "unsignedInt|unsignedShort|unsignedByte"
)


def num_of(t: Column) -> Column:
    """Numeric effective value as double: typed numeric literals
    ("42"^^<xsd:integer> etc.), and bare-number plain literals ("3.5").
    NULL for everything else — the column analog of the reference's
    multitype promotion (GeneralEvaluation.h:118-133)."""
    typed = F.regexp_extract(t, _LEX + rf"\^\^<{XSD}(?:{_NUM_TYPES})>$", 1)
    plain = F.regexp_extract(t, _LEX + r"$", 1)
    raw = F.when(typed != "", typed).otherwise(
        F.when(plain.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"), plain)
    )
    return raw.cast("double")


def ebv(c: Column) -> Column:
    """Effective boolean value of a *term* column: "true"/"false" xsd:boolean
    literals, non-zero numerics, non-empty plain strings (SPARQL 17.2.2)."""
    s = str_of(c)
    n = num_of(c)
    return (
        F.when(s.isin("true", "1") & is_literal(c), F.lit(True))
        .when(s.isin("false", "0") & is_literal(c) & num_of(c).isNull(), F.lit(False))
        .when(n.isNotNull(), n != 0.0)
        .otherwise(F.length(s) > 0)
    )
