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

Anonymous blank nodes ``[...]`` (nested property lists included) desugar to
fresh ``_:`` labels, and RDF collections ``(...)`` desugar to
rdf:first/rdf:rest chains ending in rdf:nil — the same triples the
reference's TurtleParser emits for these forms. Generated labels use a
prefix chosen to not collide with any label appearing in the document.

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


RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def parse_turtle(text: str) -> list[tuple[str, str, str, bool]]:
    """Turtle document -> [(subj, pred, obj, o_is_entity)] with reference
    lexical normalization."""
    prefixes: dict[str, str] = {}
    base = ""
    out: list[tuple[str, str, str, bool]] = []
    toks = list(_tokens(text))
    i = 0

    # fresh-bnode prefix that cannot collide with document labels
    doc_labels = {tok for k, tok in toks if k == "blank"}
    bn_prefix = "_:b"
    while any(l.startswith(bn_prefix) for l in doc_labels):
        bn_prefix += "b"
    bn_counter = [0]

    def fresh_bnode() -> str:
        bn_counter[0] += 1
        return f"{bn_prefix}{bn_counter[0]}"

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
            return f"<{RDF_NS}type>", True, j + 1
        if kind == "punct" and tok == "[":
            # anonymous blank node, possibly with a nested property list:
            # [ p1 o1 ; p2 o2 ] -> fresh _:b with those statements
            b = fresh_bnode()
            j += 1
            if j < len(toks) and toks[j] == ("punct", "]"):
                return b, True, j + 1
            j = po_list(b, j, stop="]")
            if j >= len(toks) or toks[j] != ("punct", "]"):
                raise TurtleError("unterminated '[' property list")
            return b, True, j + 1
        if kind == "punct" and tok == "(":
            # RDF collection -> rdf:first/rdf:rest chain ending in rdf:nil
            j += 1
            items: list[tuple[str, bool]] = []
            while j < len(toks) and toks[j] != ("punct", ")"):
                it, ent, j = term(j)
                items.append((it, ent))
            if j >= len(toks):
                raise TurtleError("unterminated '(' collection")
            j += 1
            if not items:
                return f"<{RDF_NS}nil>", True, j
            head = fresh_bnode()
            cur = head
            for k, (it, ent) in enumerate(items):
                out.append((cur, f"<{RDF_NS}first>", it, ent))
                nxt = fresh_bnode() if k + 1 < len(items) else f"<{RDF_NS}nil>"
                out.append((cur, f"<{RDF_NS}rest>", nxt, True))
                cur = nxt
            return head, True, j
        raise TurtleError(f"bad term {tok!r}")

    def po_list(subj: str, j: int, stop: str = ".") -> int:
        """predicate-object list for ``subj`` starting at token j; returns
        the index of the terminating token ('.' / ']' left unconsumed)."""
        while True:
            pred, p_ent, j = term(j)
            if not p_ent:
                raise TurtleError(f"literal predicate {pred!r}")
            while True:  # object list
                obj, o_ent, j = term(j)
                out.append((subj, pred, obj, o_ent))
                if j < len(toks) and toks[j] == ("punct", ","):
                    j += 1
                    continue
                break
            if j < len(toks) and toks[j] == ("punct", ";"):
                j += 1
                # trailing ';' before the terminator is legal Turtle
                if j < len(toks) and toks[j] == ("punct", stop):
                    break
                continue
            break
        return j

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
        was_bracket = toks[i] == ("punct", "[")
        subj, s_ent, i = term(i)
        if not s_ent:
            raise TurtleError(f"literal subject {subj!r}")
        # '[ p o ] .' is a complete statement: a bracket subject's
        # predicate-object list is optional (Turtle triples production)
        if not (was_bracket and i < len(toks) and toks[i] == ("punct", ".")):
            i = po_list(subj, i)
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
