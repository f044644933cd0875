"""Turtle source beyond the N-Triples line dialect: prefixes, ';'/','
predicate-object lists, blank-node labels, comments, typed/lang literals,
multi-line (long) strings — with lexical forms normalized EXACTLY like the
reference ingest (Parser/RDFParser.cpp:33-62):

  IRI                  -> <iri>              (entity)
  plain literal        -> "lex"              (literal)
  @lang literal        -> "lex"@lang
  typed literal        -> "lex"^^<full-datatype-iri>
  bare integer         -> "lex"^^<xsd:integer>
  bare decimal         -> "lex"^^<xsd:decimal>
  bare double (exp)    -> "lex"^^<xsd:double>
  true/false           -> "lex"^^<xsd:boolean>

Subset: anonymous blank nodes ``[...]`` and RDF collections ``(...)`` are
rejected with a clear error (the reference's TurtleParser supports them;
they do not occur in its example corpora or tests).

Distribution: one file = one parse unit (``spark.read.text(wholetext)`` +
``mapInPandas``) — multi-line statements never straddle a split, and a
many-file 100 TB corpus parallelizes by file exactly like the reference's
one-parser-per-fragment ingest (Main/gloadD.cpp batches).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

XSD = "http://www.w3.org/2001/XMLSchema#"

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<long_string>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<string>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<blank>_:[A-Za-z0-9_\-]+(?:\.[A-Za-z0-9_\-]+)*)
  | (?P<double>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
  | (?P<decimal>[+-]?(?:\d+\.\d+|\.\d+))
  | (?P<integer>[+-]?\d+)
  | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<dtype>\^\^)
  | (?P<pname>(?:[A-Za-z_][\w\-.]*?)?:(?:[\w\-%](?:[\w\-.%]*[\w\-%])?)?)
  | (?P<kw>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<punct>[;,.\[\]()])
""",
    re.VERBOSE,
)


class TurtleError(ValueError):
    pass


def _tokens(text: str):
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise TurtleError(f"cannot tokenize at: {text[pos:pos+40]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            yield m.lastgroup, m.group()


_ESC = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\"}


def _unquote(tok: str) -> str:
    s = tok[3:-3] if tok.startswith(('"""', "'''")) else tok[1:-1]
    return re.sub(r"\\([ntr\"'\\])", lambda m: _ESC[m.group(1)], s)


def parse_turtle(text: str) -> list[tuple[str, str, str, bool]]:
    """Turtle document -> [(subj, pred, obj, o_is_entity)] with reference
    lexical normalization."""
    prefixes: dict[str, str] = {}
    base = ""
    out: list[tuple[str, str, str, bool]] = []
    toks = list(_tokens(text))
    i = 0

    def expand(kind: str, tok: str) -> str:
        if kind == "iri":
            inner = tok[1:-1]
            if base and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", inner):
                inner = base + inner
            return f"<{inner}>"
        if kind == "pname":
            ns, local = tok.split(":", 1)
            key = ns + ":"
            if key not in prefixes:
                raise TurtleError(f"unknown prefix {key!r}")
            return f"<{prefixes[key]}{local}>"
        raise TurtleError(f"not an IRI token: {tok!r}")

    def term(j: int) -> tuple[str, bool, int]:
        """-> (normalized term, is_entity, next index). Literal suffixes
        (@lang, ^^dt) are consumed here."""
        kind, tok = toks[j]
        if kind in ("iri", "pname"):
            return expand(kind, tok), True, j + 1
        if kind == "blank":
            return tok, True, j + 1
        if kind in ("string", "long_string"):
            lex = _unquote(tok)
            if j + 1 < len(toks) and toks[j + 1][0] == "langtag":
                return f'"{lex}"{toks[j + 1][1]}', False, j + 2
            if j + 1 < len(toks) and toks[j + 1][0] == "dtype":
                dkind, dtok = toks[j + 2]
                return f'"{lex}"^^{expand(dkind, dtok)}', False, j + 3
            return f'"{lex}"', False, j + 1
        if kind == "integer":
            return f'"{tok}"^^<{XSD}integer>', False, j + 1
        if kind == "decimal":
            return f'"{tok}"^^<{XSD}decimal>', False, j + 1
        if kind == "double":
            return f'"{tok}"^^<{XSD}double>', False, j + 1
        if kind == "kw" and tok in ("true", "false"):
            return f'"{tok}"^^<{XSD}boolean>', False, j + 1
        if kind == "kw" and tok == "a":
            return "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", True, j + 1
        if kind == "punct" and tok in "[(":
            raise TurtleError(
                "anonymous blank nodes / collections are outside the supported subset"
            )
        raise TurtleError(f"bad term {tok!r}")

    while i < len(toks):
        kind, tok = toks[i]
        # "@prefix"/"@base" tokenize as langtag (the '@' form) or kw (the
        # SPARQL-style bare form) — accept both spellings here
        if kind in ("kw", "langtag") and tok.lower() in ("@prefix", "prefix"):
            pkind, ptok = toks[i + 1]
            ikind, itok = toks[i + 2]
            if pkind != "pname" or ikind != "iri":
                raise TurtleError("bad @prefix declaration")
            prefixes[ptok] = itok[1:-1]
            i += 3
            if i < len(toks) and toks[i] == ("punct", "."):
                i += 1
            continue
        if kind in ("kw", "langtag") and tok.lower() in ("@base", "base"):
            base = toks[i + 1][1][1:-1]
            i += 2
            if i < len(toks) and toks[i] == ("punct", "."):
                i += 1
            continue
        subj, s_ent, i = term(i)
        if not s_ent:
            raise TurtleError(f"literal subject {subj!r}")
        while True:  # predicate-object list
            pred, p_ent, i = term(i)
            if not p_ent:
                raise TurtleError(f"literal predicate {pred!r}")
            while True:  # object list
                obj, o_ent, i = term(i)
                out.append((subj, pred, obj, o_ent))
                if i < len(toks) and toks[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if i < len(toks) and toks[i] == ("punct", ";"):
                i += 1
                # trailing ';' before '.' is legal Turtle
                if i < len(toks) and toks[i] == ("punct", "."):
                    break
                continue
            break
        if i >= len(toks) or toks[i] != ("punct", "."):
            raise TurtleError(f"expected '.' after statement near {toks[i-1][1]!r}")
        i += 1
    return out


TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("o_is_entity", T.BooleanType()),
    ]
)


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Turtle files -> triples(subj, pred, obj, o_is_entity). One file per
    parse unit (wholetext) so statements never straddle splits; a many-file
    corpus parallelizes by file."""
    files = spark.read.text(path, wholetext=True)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["subj", "pred", "obj", "o_is_entity"]
        for pdf in batches:
            rows = []
            for doc in pdf["value"]:
                rows.extend(parse_turtle(doc))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(gen, schema=TRIPLES_SCHEMA)
