"""SPARQL text front-end: tokenizer + recursive-descent parser compiling to
the repo's group-graph-pattern algebra (plans/bgp.py) and RDF-term builtins
(functions/terms.py).

The reference parses SPARQL with an ANTLR3-generated C parser feeding
QueryTree (Parser/SparqlParser.c via Parser/QueryParser.cpp:49
SPARQLStarter; tree shapes QueryTree.h). This module covers the surface the
reference evaluates — plain BGP SELECTs distributed (README.md:30-49), plus
the single-node extras: PREFIX, OPTIONAL / UNION / MINUS groups, FILTER
with the SPARQL 1.0 builtin set (QueryTree.h:118-119: STR, LANG,
LANGMATCHES, DATATYPE, BOUND, sameTerm, isIRI, isURI, isBLANK, isLITERAL,
REGEX; expression lattice GeneralEvaluation.cpp:1535-1851), DISTINCT /
REDUCED, ORDER BY, LIMIT / OFFSET, and ASK.

Beyond the reference's builtin set, ``FILTER EXISTS { ... }`` and
``FILTER NOT EXISTS { ... }`` are parsed and compile to semi/anti joins on
shared vars (GroupPattern.exists/not_exists), and SPARQL UPDATE text covers
INSERT DATA / DELETE DATA / DELETE WHERE / MODIFY
(``DELETE {...} INSERT {...} WHERE {...}``).

Grammar notes (deliberate, documented simplifications):
  - comparison operators in FILTERs need whitespace around ``<``/``>``
    (otherwise they tokenize as IRI brackets);
  - a plain string constant compares against STR()-style values, so
    ``?n = "x"`` matches ``"x"`` and ``"x"@en`` (the reference's multitype
    lattice likewise compares on the value, not the tag).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from gstored_spark.functions import terms as T
from gstored_spark.plans.bgp import GroupPattern, TriplePattern, eval_group, modifiers

XSD = "http://www.w3.org/2001/XMLSchema#"

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9\-]*|\^\^<[^<>\s]*>)?)
  | (?P<iri><[^<>\s]*>)
  | (?P<var>\?\w+)
  | (?P<blank>_:\w+)
  | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<pname>[A-Za-z_][\w\-]*:[\w\-.]*|:[\w\-.]*)
  | (?P<kw>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>&&|\|\||!=|<=|>=|[{}().,;=<>!*/+\-^|?])
""",
    re.VERBOSE,
)

_BUILTINS = {
    "str", "lang", "langmatches", "datatype", "bound", "sameterm",
    "isiri", "isuri", "isblank", "isliteral", "regex",
    # SPARQL 1.1 string/numeric/conditional builtins (beyond the
    # reference's QueryTree.h:118-119 set) — all pure column expressions
    "concat", "strlen", "ucase", "lcase", "contains", "strstarts",
    "strends", "substr", "replace", "strbefore", "strafter",
    "abs", "ceil", "floor", "round", "if", "coalesce",
}

_AGGREGATES = {"count", "sum", "avg", "min", "max", "group_concat", "sample"}


@dataclass
class Tok:
    kind: str
    text: str


def tokenize(text: str) -> list[Tok]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"cannot tokenize at: {text[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            toks.append(Tok(kind, m.group()))
    return toks


# value kinds moving through the expression compiler
TERM, STR, NUM, BOOL = "term", "str", "num", "bool"


@dataclass
class Expr:
    kind: str
    col: Column
    vars: set[str] = field(default_factory=set)


@dataclass
class ParsedQuery:
    form: str  # 'select' | 'ask'
    projection: list[str] | None  # var names without '?', None = *
    group: GroupPattern
    distinct: bool = False
    reduced: bool = False
    order_by: list[tuple[str, bool]] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    # SPARQL 1.1 aggregation surface (beyond the reference's grammar):
    group_by: list[str] = field(default_factory=list)  # var names
    aggregates: list = field(default_factory=list)  # (hidden_name, Column)
    select_exprs: list = field(default_factory=list)  # (alias, Column)
    having: list = field(default_factory=list)  # Column filters post-agg
    templates: list = field(default_factory=list)  # CONSTRUCT triple templates


class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0
        self.prefixes: dict[str, str] = {}
        # aggregate plumbing: aggregate calls are only legal inside SELECT
        # expressions and HAVING; each call becomes a hidden agg column
        # (__agg{i}) the post-agg expressions/filters reference, so
        # (COUNT(?x) * 2 AS ?y) and HAVING (COUNT(?x) > 5) compile uniformly
        self._allow_aggs = False
        self._pending_aggs: list[tuple] = []  # (hidden_name, Column)
        # BIND(expr AS ?v) columns carry the expr's NATIVE Spark type, not
        # an RDF term string — later expressions over ?v must coerce with
        # the bind's kind, not TERM (e.g. FILTER(?v) on a boolean bind)
        self._bind_kinds: dict[str, str] = {}

    # -- token helpers -----------------------------------------------------
    def peek(self, k: int = 0) -> Tok | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        self.i += 1
        return t

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "kw" and t.text.lower() in words

    def eat_kw(self, *words: str) -> str:
        if not self.at_kw(*words):
            raise ValueError(f"expected {words}, got {self.peek()}")
        return self.next().text.lower()

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "op" and t.text in ops

    def eat_op(self, *ops: str) -> str:
        if not self.at_op(*ops):
            raise ValueError(f"expected {ops}, got {self.peek()}")
        return self.next().text

    # -- terms ---------------------------------------------------------------
    def expand_pname(self, text: str) -> str:
        ns, local = text.split(":", 1)
        base = self.prefixes.get(ns + ":")
        if base is None:
            raise ValueError(f"unknown prefix {ns!r}")
        return f"<{base}{local}>"

    @staticmethod
    def num_term(text: str) -> str:
        """Bare numbers in triple patterns take the reference's normalized
        typed-literal form (RDFParser.cpp:36-63), mirroring the Turtle
        source exactly: exponent -> xsd:double, fraction -> xsd:decimal,
        else xsd:integer (sources/turtle.py token classes)."""
        if re.fullmatch(r"[+-]?\d+", text):
            dt = "integer"
        elif "e" in text or "E" in text:
            dt = "double"
        else:
            dt = "decimal"
        return f'"{text}"^^<{XSD}{dt}>'

    def triple_term(self) -> str:
        t = self.next()
        if t.kind in ("var", "iri", "string", "blank"):
            return t.text
        if t.kind == "pname":
            return self.expand_pname(t.text)
        if t.kind == "num":
            return self.num_term(t.text)
        if t.kind == "kw" and t.text.lower() == "a":  # rdf:type shorthand
            return "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
        raise ValueError(f"bad triple term {t}")

    # -- property paths (SPARQL 1.1 — beyond the reference's 1.0 grammar,
    # Parser/SparqlParser.c has no path production; see plans/paths.py) ----
    def _path_primary(self):
        from gstored_spark.plans.paths import Link

        if self.at_op("("):
            self.next()
            p = self._path_alt()
            self.eat_op(")")
            return p
        t = self.peek()
        if t is not None and t.kind == "iri":
            self.next()
            return Link(t.text)
        if t is not None and t.kind == "pname":
            self.next()
            return Link(self.expand_pname(t.text))
        if t is not None and t.kind == "kw" and t.text.lower() == "a":
            self.next()
            return Link("<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>")
        raise ValueError(f"bad path element {t}")

    def _path_neg_member(self) -> tuple[bool, str]:
        """PathOneInPropertySet: iri | 'a' | '^' (iri | 'a')."""
        inverse = False
        if self.at_op("^"):
            self.next()
            inverse = True
        t = self.next()
        if t.kind == "iri":
            return inverse, t.text
        if t.kind == "pname":
            return inverse, self.expand_pname(t.text)
        if t.kind == "kw" and t.text.lower() == "a":
            return inverse, "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
        raise ValueError(f"bad negated-property-set member {t}")

    def _path_postfix(self):
        # PathEltOrInverse: '^' applies to the WHOLE PathElt incl. its
        # modifier (`^<r>+` = `^(<r>+)`, SPARQL 1.1 grammar rule [91])
        from gstored_spark.plans.paths import Inv, Neg, Repeat

        if self.at_op("^"):
            self.next()
            return Inv(self._path_postfix())
        if self.at_op("!"):
            self.next()
            members = []
            if self.at_op("("):
                self.next()
                members.append(self._path_neg_member())
                while self.at_op("|"):
                    self.next()
                    members.append(self._path_neg_member())
                self.eat_op(")")
            else:
                members.append(self._path_neg_member())
            p = Neg(
                tuple(iri for inv, iri in members if not inv),
                tuple(iri for inv, iri in members if inv),
            )
            while self.at_op("+", "*", "?"):
                p = Repeat(p, self.next().text)
            return p
        p = self._path_primary()
        # note: `<p>?x` tokenizes as a var — a bare `?` modifier needs
        # whitespace before the next term (documented grammar note)
        while self.at_op("+", "*", "?"):
            p = Repeat(p, self.next().text)
        return p

    def _path_seq(self):
        from gstored_spark.plans.paths import Seq

        parts = [self._path_postfix()]
        while self.at_op("/"):
            self.next()
            parts.append(self._path_postfix())
        return parts[0] if len(parts) == 1 else Seq(tuple(parts))

    def _path_alt(self):
        from gstored_spark.plans.paths import Alt

        parts = [self._path_seq()]
        while self.at_op("|"):
            self.next()
            parts.append(self._path_seq())
        return parts[0] if len(parts) == 1 else Alt(tuple(parts))

    def parse_predicate(self):
        """Predicate position: a var keeps the 1.0 TriplePattern shape
        (pred-var joins, J7); a bare IRI/pname stays a plain term so plain
        BGPs take the ordinary leaf path; anything with a path operator
        returns a paths-AST node."""
        from gstored_spark.plans.paths import Link

        t = self.peek()
        if t is not None and t.kind == "var":
            self.next()
            return t.text
        p = self._path_alt()
        return p.iri if isinstance(p, Link) else p

    def parse_values(self) -> tuple[list[str], list[tuple]]:
        """VALUES ?x { t... } | VALUES (?x ?y) { (t t) ... }. UNDEF -> NULL.

        Term convention (deliberate, documented): a PLAIN string literal
        denotes the bare value term — matching this repo's graph views,
        whose terms are plain strings (`nat:3`) with no SPARQL-expressible
        lexical form. VALUES rows join on TERM equality, so against
        literal-term data ('"bob"@en') use a tagged/typed literal (kept in
        term form) or a FILTER, which compares on the value space."""
        if self.at_op("("):
            self.next()
            vars_ = []
            while self.peek() is not None and self.peek().kind == "var":
                vars_.append(self.next().text[1:])
            self.eat_op(")")
        else:
            v = self.next()
            if v.kind != "var":
                raise ValueError(f"bad VALUES var {v}")
            vars_ = [v.text[1:]]

        def one_term():
            if self.at_kw("undef"):
                self.next()
                return None
            t = self.triple_term()
            if t.startswith('"') and t.endswith('"'):
                return t[1:-1]  # plain literal -> value space
            return t

        rows: list[tuple] = []
        self.eat_op("{")
        while not self.at_op("}"):
            if len(vars_) == 1 and not self.at_op("("):
                rows.append((one_term(),))
                continue
            self.eat_op("(")
            row = tuple(one_term() for _ in vars_)
            self.eat_op(")")
            rows.append(row)
        self.eat_op("}")
        return vars_, rows

    # -- query ---------------------------------------------------------------
    def parse_query(self) -> ParsedQuery:
        while self.at_kw("prefix"):
            self.next()
            ns = self.next()
            iri = self.next()
            if ns.kind != "pname" or iri.kind != "iri":
                raise ValueError("bad PREFIX declaration")
            self.prefixes[ns.text] = iri.text[1:-1]
        if self.at_kw("ask"):
            self.next()
            if self.at_kw("where"):
                self.next()
            g = self.parse_group()
            return ParsedQuery("ask", None, g)
        if self.at_kw("describe"):
            # DESCRIBE <term>... [WHERE { group }]: the description of a
            # resource set is every stored triple touching it (the common
            # concise-bound-description reading, one hop, both directions)
            self.next()
            terms: list[str] = []
            while True:
                t = self.peek()
                if t is None or (t.kind == "kw" and t.text.lower() == "where"):
                    break
                if t.kind == "op" and t.text == "{":
                    break
                term = self.triple_term()
                if term.startswith('"') and term.endswith('"'):
                    # plain literal -> bare value term (same term convention
                    # as VALUES constants, parse_values docstring)
                    term = term[1:-1]
                terms.append(term)
            g = GroupPattern(patterns=[])
            if self.at_kw("where"):
                self.next()
            if self.at_op("{"):
                g = self.parse_group()
            q = ParsedQuery("describe", None, g)
            q.templates = terms  # reuse the field: described terms/vars
            self.parse_modifiers(q)
            return q
        if self.at_kw("construct"):
            # CONSTRUCT { templates } WHERE { group }: the produced graph is
            # a SET of instantiated triples (incomplete instantiations —
            # a template var unbound in a solution — are dropped, per spec)
            self.next()
            self.eat_op("{")
            templates: list[TriplePattern] = []
            while not self.at_op("}"):
                s = self.triple_term()
                p = self.triple_term()
                o = self.triple_term()
                templates.append(TriplePattern(s, p, o))
                if self.at_op("."):
                    self.next()
            self.eat_op("}")
            if self.at_kw("where"):
                self.next()
            g = self.parse_group()
            q = ParsedQuery("construct", None, g, templates=templates)
            self.parse_modifiers(q)
            return q
        self.eat_kw("select")
        distinct = reduced = False
        if self.at_kw("distinct"):
            self.next()
            distinct = True
        elif self.at_kw("reduced"):
            self.next()
            reduced = True
        proj: list[str] | None
        select_exprs: list = []
        if self.at_op("*"):
            self.next()
            proj = None
        else:
            proj = []
            while True:
                t = self.peek()
                if t is not None and t.kind == "var":
                    proj.append(self.next().text[1:])
                elif t is not None and t.kind == "op" and t.text == "(":
                    # (expr AS ?v) — select expression, possibly aggregate
                    self.next()
                    self._allow_aggs = True
                    e = self.parse_expr()
                    self._allow_aggs = False
                    self.eat_kw("as")
                    v = self.next()
                    if v.kind != "var":
                        raise ValueError(f"AS target must be a var, got {v}")
                    self.eat_op(")")
                    select_exprs.append((v.text[1:], e.col))
                    proj.append(v.text[1:])
                else:
                    break
            if not proj:
                raise ValueError("empty SELECT projection")
        if self.at_kw("where"):
            self.next()
        g = self.parse_group()
        q = ParsedQuery("select", proj, g, distinct=distinct, reduced=reduced)
        q.select_exprs = select_exprs
        self.parse_modifiers(q)
        q.aggregates = list(self._pending_aggs)
        return q

    def parse_modifiers(self, q: ParsedQuery) -> None:
        while True:
            if self.at_kw("order"):
                self.next()
                self.eat_kw("by")
                while True:
                    if self.at_kw("asc", "desc"):
                        d = self.next().text.lower()
                        self.eat_op("(")
                        v = self.next()
                        self.eat_op(")")
                        q.order_by.append((v.text[1:], d == "asc"))
                    elif self.peek() is not None and self.peek().kind == "var":
                        q.order_by.append((self.next().text[1:], True))
                    else:
                        break
            elif self.at_kw("limit"):
                self.next()
                q.limit = int(self.next().text)
            elif self.at_kw("offset"):
                self.next()
                q.offset = int(self.next().text)
            elif self.at_kw("group"):
                self.next()
                self.eat_kw("by")
                while self.peek() is not None and self.peek().kind == "var":
                    q.group_by.append(self.next().text[1:])
                if not q.group_by:
                    raise ValueError("GROUP BY needs at least one var")
            elif self.at_kw("having"):
                self.next()
                self._allow_aggs = True
                e = self.parse_constraint()
                self._allow_aggs = False
                q.having.append(_to_bool(e))
            else:
                break

    # -- group graph pattern ---------------------------------------------------
    def parse_group(self) -> GroupPattern:
        self.eat_op("{")
        g = GroupPattern(patterns=[])
        tail = GroupPattern(patterns=[])  # patterns consuming a prior BIND
        raw_filters: list[Expr] = []
        raw_binds: list[tuple[str, Expr]] = []
        while not self.at_op("}"):
            if self.at_kw("filter"):
                self.next()
                if self.at_kw("exists"):
                    self.next()
                    g.exists.append(self.parse_group())
                elif self.at_kw("not"):
                    self.next()
                    self.eat_kw("exists")
                    g.not_exists.append(self.parse_group())
                else:
                    raw_filters.append(self.parse_constraint())
            elif self.at_kw("optional"):
                self.next()
                g.optionals.append(self.parse_group())
            elif self.at_kw("minus"):
                self.next()
                g.minus.append(self.parse_group())
            elif self.at_kw("bind"):
                self.next()
                self.eat_op("(")
                e = self.parse_expr()
                self.eat_kw("as")
                v = self.next()
                if v.kind != "var":
                    raise ValueError(f"BIND target must be a var, got {v}")
                self.eat_op(")")
                raw_binds.append((v.text[1:], e))
                self._bind_kinds[v.text[1:]] = e.kind
                if self.at_op("."):
                    self.next()
            elif self.at_kw("values"):
                self.next()
                g.values_tables.append(self.parse_values())
                if self.at_op("."):
                    self.next()
            elif self.at_op("{") and (
                (t1 := self.peek(1)) is not None
                and t1.kind == "kw"
                and t1.text.lower() == "select"
            ):
                # sub-SELECT: a full query evaluated as a relation, joined
                # on its PROJECTED vars only (SPARQL 1.1 subquery scoping —
                # inner non-projected vars are invisible outside)
                self.next()
                saved = self._pending_aggs
                self._pending_aggs = []
                subq = self.parse_query()
                subq.aggregates = list(self._pending_aggs)
                self._pending_aggs = saved
                self.eat_op("}")
                g.sub_evals.append(_make_subselect(subq))
                if self.at_op("."):
                    self.next()
            elif self.at_op("{"):
                sub = self.parse_group()
                if self.at_kw("union"):
                    branches = [sub]
                    while self.at_kw("union"):
                        self.next()
                        branches.append(self.parse_group())
                    g.joins.append(GroupPattern(patterns=[], unions=branches))
                else:
                    g.joins.append(sub)
                if self.at_op("."):
                    self.next()
            else:
                # predicate-object lists (';') and object lists (',') —
                # same desugaring loop as the Turtle source (sources/turtle.py)
                bound_binds = {v for v, _ in raw_binds}

                def _uses_bind(*terms):
                    return any(
                        isinstance(t, str)
                        and t.startswith("?")
                        and t[1:] in bound_binds
                        for t in terms
                    )

                s = self.triple_term()
                while True:
                    p = self.parse_predicate()
                    while True:
                        o = self.triple_term()
                        if isinstance(p, str):
                            # sequential BIND scoping: a pattern AFTER a
                            # BIND that mentions its var joins after the
                            # bind applies (GroupPattern.bind_joins)
                            if _uses_bind(s, p, o):
                                tail.patterns.append(TriplePattern(s, p, o))
                            else:
                                g.patterns.append(TriplePattern(s, p, o))
                        elif _uses_bind(s, o):
                            tail.path_patterns.append((s, p, o))
                        else:
                            g.path_patterns.append((s, p, o))
                        if self.at_op(","):
                            self.next()
                            continue
                        break
                    if self.at_op(";"):
                        self.next()
                        if self.at_op(".", "}"):  # trailing ';' is legal
                            break
                        continue
                    break
                if self.at_op("."):
                    self.next()
        self.eat_op("}")
        if tail.patterns or tail.path_patterns:
            g.bind_joins.append(tail)
        base_vars = set()
        for p in g.patterns + tail.patterns:
            base_vars |= {v[1:] for v in p.vars()}
        for s_t, _, o_t in g.path_patterns + tail.path_patterns:
            base_vars |= {
                t[1:] for t in (s_t, o_t) if isinstance(t, str) and t.startswith("?")
            }
        for vars_, _ in g.values_tables:
            base_vars |= set(vars_)
        # BINDs split like filters: an expression over base vars applies in
        # the group's relational part; one referencing OPTIONAL-only (or
        # later-deferred) vars applies AFTER the optionals join (post_binds)
        # vars bound ONLY by a bind_joins (tail) pattern exist after the
        # tail joins — a BIND referencing one must defer like a late var
        early_vars = set()
        for p in g.patterns:
            early_vars |= {v[1:] for v in p.vars()}
        for s_t, _, o_t in g.path_patterns:
            early_vars |= {
                t[1:] for t in (s_t, o_t) if isinstance(t, str) and t.startswith("?")
            }
        for vars_, _ in g.values_tables:
            early_vars |= set(vars_)
        tail_only = base_vars - early_vars
        late_vars: set[str] = set()
        for v, e in raw_binds:
            if e.vars <= base_vars and not (e.vars & (late_vars | tail_only)):
                g.binds.append((v, e.col))
                base_vars.add(v)
            else:
                g.post_binds.append((v, e.col))
                late_vars.add(v)
        for e in raw_filters:
            cond = _to_bool(e)
            early = e.vars <= (base_vars | late_vars) and not (e.vars & late_vars)
            (g.filters if early else g.post_filters).append(cond)
        return g

    # -- expressions -------------------------------------------------------------
    def parse_constraint(self) -> Expr:
        if self.at_op("("):
            self.next()
            e = self.parse_expr()
            self.eat_op(")")
            return e
        return self.parse_primary()  # bare builtin call: FILTER REGEX(...)

    def parse_expr(self) -> Expr:
        return self.parse_or()

    def parse_or(self) -> Expr:
        e = self.parse_and()
        while self.at_op("||"):
            self.next()
            r = self.parse_and()
            e = Expr(BOOL, _to_bool(e) | _to_bool(r), e.vars | r.vars)
        return e

    def parse_and(self) -> Expr:
        e = self.parse_relational()
        while self.at_op("&&"):
            self.next()
            r = self.parse_relational()
            e = Expr(BOOL, _to_bool(e) & _to_bool(r), e.vars | r.vars)
        return e

    def parse_relational(self) -> Expr:
        e = self.parse_additive()
        if self.at_op("=", "!=", "<", ">", "<=", ">="):
            op = self.next().text
            r = self.parse_additive()
            return _compare(e, r, op)
        if self.at_kw("in"):
            self.next()
            return self._in_list(e, negate=False)
        if self.at_kw("not"):
            self.next()
            self.eat_kw("in")
            return self._in_list(e, negate=True)
        return e

    def _in_list(self, lhs: Expr, negate: bool) -> Expr:
        self.eat_op("(")
        items = [self.parse_expr()]
        while self.at_op(","):
            self.next()
            items.append(self.parse_expr())
        self.eat_op(")")
        cond = None
        vars_ = set(lhs.vars)
        for it in items:
            c = _compare(lhs, it, "=").col
            cond = c if cond is None else (cond | c)
            vars_ |= it.vars
        return Expr(BOOL, ~cond if negate else cond, vars_)

    def parse_additive(self) -> Expr:
        e = self.parse_mult()
        while self.at_op("+", "-"):
            op = self.next().text
            r = self.parse_mult()
            a, b = _to_num(e), _to_num(r)
            e = Expr(NUM, a + b if op == "+" else a - b, e.vars | r.vars)
        return e

    def parse_mult(self) -> Expr:
        e = self.parse_unary()
        while self.at_op("*", "/"):
            op = self.next().text
            r = self.parse_unary()
            a, b = _to_num(e), _to_num(r)
            e = Expr(NUM, a * b if op == "*" else a / b, e.vars | r.vars)
        return e

    def parse_unary(self) -> Expr:
        if self.at_op("!"):
            self.next()
            e = self.parse_unary()
            return Expr(BOOL, ~_to_bool(e), e.vars)
        if self.at_op("-"):
            self.next()
            e = self.parse_unary()
            return Expr(NUM, -_to_num(e), e.vars)
        if self.at_op("+"):
            self.next()
            return self.parse_unary()
        return self.parse_primary()

    def parse_primary(self) -> Expr:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of expression")
        if t.kind == "op" and t.text == "(":
            self.next()
            e = self.parse_expr()
            self.eat_op(")")
            return e
        if t.kind == "var":
            self.next()
            name = t.text[1:]
            return Expr(self._bind_kinds.get(name, TERM), F.col(name), {name})
        if t.kind == "num":
            self.next()
            return Expr(NUM, F.lit(float(t.text)), set())
        if t.kind == "string":
            self.next()
            if t.text.endswith('"'):  # plain literal -> value-space string
                return Expr(STR, F.lit(t.text[1:-1]), set())
            return Expr(TERM, F.lit(t.text), set())  # tagged/typed literal
        if t.kind == "iri":
            self.next()
            return Expr(TERM, F.lit(t.text), set())
        if t.kind == "pname":
            self.next()
            return Expr(TERM, F.lit(self.expand_pname(t.text)), set())
        if t.kind == "kw":
            name = t.text.lower()
            if name in ("true", "false"):
                self.next()
                return Expr(BOOL, F.lit(name == "true"), set())
            if name in _AGGREGATES:
                self.next()
                return self.parse_aggregate(name)
            if name in _BUILTINS:
                self.next()
                return self.parse_builtin(name)
        raise ValueError(f"bad expression token {t}")

    def parse_aggregate(self, name: str) -> Expr:
        """COUNT/SUM/AVG/MIN/MAX(...) -> a hidden agg column reference
        (see __init__ note). COUNT supports * and DISTINCT; SUM/AVG run on
        the numeric value space; MIN/MAX keep TERM columns lexical (the
        reference has no aggregate surface at all — SURVEY §2.5)."""
        if not self._allow_aggs:
            raise ValueError(
                f"{name.upper()} is only allowed in SELECT expressions and HAVING"
            )
        self.eat_op("(")
        distinct = False
        if self.at_kw("distinct"):
            self.next()
            distinct = True
        if name == "count" and self.at_op("*"):
            self.next()
            agg = F.count(F.lit(1))
            kind = NUM
        else:
            e = self.parse_expr()
            if name == "count":
                agg = F.countDistinct(e.col) if distinct else F.count(e.col)
                kind = NUM
            elif distinct:
                raise ValueError(f"DISTINCT not supported for {name.upper()}")
            elif name == "sum":
                agg, kind = F.sum(_to_num(e)), NUM
            elif name == "avg":
                agg, kind = F.avg(_to_num(e)), NUM
            elif name == "group_concat":
                # spec leaves concatenation order undefined — sort for a
                # deterministic (hence testable/oracle-able) result
                sep = " "
                if self.at_op(";"):
                    self.next()
                    self.eat_kw("separator")
                    self.eat_op("=")
                    t = self.next()
                    if t.kind != "string":
                        raise ValueError(f"bad SEPARATOR {t}")
                    sep = t.text[1 : t.text.rindex('"')]
                agg = F.array_join(F.sort_array(F.collect_list(_to_str(e))), sep)
                kind = STR
            elif name == "sample":
                # any value is legal — the minimum is the deterministic one
                agg = F.min(e.col)
                kind = e.kind
            elif name == "min":
                agg = F.min(_to_num(e) if e.kind == NUM else e.col)
                kind = e.kind
            else:  # max
                agg = F.max(_to_num(e) if e.kind == NUM else e.col)
                kind = e.kind
        self.eat_op(")")
        hidden = f"__agg{len(self._pending_aggs)}"
        self._pending_aggs.append((hidden, agg))
        return Expr(kind, F.col(hidden), set())

    def parse_builtin(self, name: str) -> Expr:
        self.eat_op("(")
        args = [self.parse_expr()]
        while self.at_op(","):
            self.next()
            args.append(self.parse_expr())
        self.eat_op(")")
        vars_ = set().union(*[a.vars for a in args])
        a0 = args[0]
        if name == "str":
            return Expr(STR, _to_str(a0), vars_)
        if name == "lang":
            return Expr(STR, T.lang_of(a0.col), vars_)
        if name == "datatype":
            return Expr(TERM, T.datatype_of(a0.col), vars_)
        if name == "bound":
            return Expr(BOOL, T.bound(a0.col), vars_)
        if name == "sameterm":
            return Expr(BOOL, T.same_term(a0.col, args[1].col), vars_)
        if name in ("isiri", "isuri"):
            return Expr(BOOL, T.is_iri(a0.col), vars_)
        if name == "isblank":
            return Expr(BOOL, T.is_blank(a0.col), vars_)
        if name == "isliteral":
            return Expr(BOOL, T.is_literal(a0.col), vars_)
        if name == "langmatches":
            return Expr(BOOL, T.lang_matches(_to_str(a0), _to_str(args[1])), vars_)
        if name == "regex":
            pat = _to_str(args[1])
            if len(args) > 2:
                pat = F.concat(
                    F.when(_to_str(args[2]).contains("i"), F.lit("(?i)")).otherwise(F.lit("")),
                    pat,
                )
            return Expr(BOOL, F.regexp_like(_to_str(a0), pat), vars_)
        # SPARQL 1.1 string functions — all operate on the value space
        if name == "concat":
            return Expr(STR, F.concat(*[_to_str(a) for a in args]), vars_)
        if name == "strlen":
            return Expr(NUM, F.length(_to_str(a0)), vars_)
        if name == "ucase":
            return Expr(STR, F.upper(_to_str(a0)), vars_)
        if name == "lcase":
            return Expr(STR, F.lower(_to_str(a0)), vars_)
        if name == "contains":
            return Expr(BOOL, _to_str(a0).contains(_to_str(args[1])), vars_)
        if name == "strstarts":
            return Expr(BOOL, _to_str(a0).startswith(_to_str(args[1])), vars_)
        if name == "strends":
            return Expr(BOOL, _to_str(a0).endswith(_to_str(args[1])), vars_)
        if name == "substr":
            # SPARQL SUBSTR is 1-based like Spark's substr
            length = _to_num(args[2]).cast("int") if len(args) > 2 else F.lit(1 << 30)
            return Expr(
                STR, _to_str(a0).substr(_to_num(args[1]).cast("int"), length), vars_
            )
        if name == "replace":
            return Expr(
                STR,
                F.regexp_replace(_to_str(a0), _to_str(args[1]), _to_str(args[2])),
                vars_,
            )
        if name == "strbefore":
            s, sep = _to_str(a0), _to_str(args[1])
            pos = F.instr(s, sep)
            return Expr(
                STR, F.when(pos > 0, s.substr(F.lit(1), pos - 1)).otherwise(F.lit("")), vars_
            )
        if name == "strafter":
            # after the FIRST occurrence (substring_index(-1) would take the
            # last) — substr from pos + len(sep)
            s, sep = _to_str(a0), _to_str(args[1])
            pos = F.instr(s, sep)
            return Expr(
                STR,
                F.when(
                    pos > 0, s.substr(pos + F.length(sep), F.lit(1 << 30))
                ).otherwise(F.lit("")),
                vars_,
            )
        if name == "abs":
            return Expr(NUM, F.abs(_to_num(a0)), vars_)
        if name == "ceil":
            return Expr(NUM, F.ceil(_to_num(a0)).cast("double"), vars_)
        if name == "floor":
            return Expr(NUM, F.floor(_to_num(a0)).cast("double"), vars_)
        if name == "round":
            return Expr(NUM, F.round(_to_num(a0), 0), vars_)
        if name == "if":
            # IF(cond, then, else): result kind follows the THEN branch
            return Expr(
                args[1].kind,
                F.when(_to_bool(a0), args[1].col).otherwise(args[2].col),
                vars_,
            )
        if name == "coalesce":
            return Expr(a0.kind, F.coalesce(*[a.col for a in args]), vars_)
        raise ValueError(f"unsupported builtin {name}")


# -- kind coercions -------------------------------------------------------------


def _to_num(e: Expr) -> Column:
    if e.kind == NUM:
        return e.col
    if e.kind == TERM:
        return T.num_of(e.col)
    return e.col.cast("double")


def _to_str(e: Expr) -> Column:
    if e.kind == STR:
        return e.col
    if e.kind == TERM:
        return T.str_of(e.col)
    return e.col.cast("string")


def _to_bool(e: Expr) -> Column:
    if e.kind == BOOL:
        return e.col
    if e.kind == TERM:
        return T.ebv(e.col)
    if e.kind == NUM:
        return e.col != 0.0
    return F.length(e.col) > 0


_OPS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
    ">=": lambda a, b: a >= b,
}


def _compare(a: Expr, b: Expr, op: str) -> Expr:
    """Typed comparison mirroring the reference's multitype promotion
    (GeneralEvaluation.h:118-133): numeric wins, then string value space,
    then term-vs-term with a per-row numeric fast path."""
    f = _OPS[op]
    vars_ = a.vars | b.vars
    if NUM in (a.kind, b.kind):
        return Expr(BOOL, f(_to_num(a), _to_num(b)), vars_)
    if STR in (a.kind, b.kind):
        return Expr(BOOL, f(_to_str(a), _to_str(b)), vars_)
    na, nb = T.num_of(a.col), T.num_of(b.col)
    cond = F.when(na.isNotNull() & nb.isNotNull(), f(na, nb)).otherwise(f(a.col, b.col))
    return Expr(BOOL, cond, vars_)


# -- public API -------------------------------------------------------------------


def parse_sparql(text: str) -> ParsedQuery:
    p = _Parser(tokenize(text))
    q = p.parse_query()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens at {p.peek()}")
    return q


def _group_vars(g: GroupPattern) -> list[str]:
    """Vars in first-appearance order (SELECT * expansion,
    GeneralEvaluation.cpp:2870-2874)."""
    seen: list[str] = []

    def walk(gr: GroupPattern):
        for p in gr.patterns:
            for t in (p.s, p.p, p.o):
                if t.startswith("?") and t[1:] not in seen:
                    seen.append(t[1:])
        for s_t, _, o_t in gr.path_patterns:
            for t in (s_t, o_t):
                if isinstance(t, str) and t.startswith("?") and t[1:] not in seen:
                    seen.append(t[1:])
        for v, _ in gr.binds + gr.post_binds:
            if v not in seen:
                seen.append(v)
        for vars_, _ in gr.values_tables:
            for v in vars_:
                if v not in seen:
                    seen.append(v)
        for f in gr.sub_evals:
            for v in getattr(getattr(f, "query", None), "projection", None) or []:
                if v not in seen:
                    seen.append(v)
        for sub in gr.unions + gr.joins + gr.optionals + gr.bind_joins:
            walk(sub)

    walk(g)
    return seen


@dataclass
class ParsedUpdate:
    form: str  # 'insert_data' | 'delete_data' | 'delete_where' | 'modify'
    patterns: list[TriplePattern]  # ground triples for *_data; BGP for delete_where
    delete_templates: list[TriplePattern] = field(default_factory=list)
    insert_templates: list[TriplePattern] = field(default_factory=list)
    where: GroupPattern | None = None


def _template_patterns(g: GroupPattern, clause: str) -> list[TriplePattern]:
    """A MODIFY template group must be a plain triple list."""
    if g.optionals or g.unions or g.minus or g.filters or g.joins \
            or g.post_filters or g.exists or g.not_exists \
            or g.path_patterns or g.binds or g.post_binds \
            or g.values_tables or g.sub_evals:
        raise ValueError(f"{clause} template must contain only triples")
    return g.patterns


def parse_update(text: str) -> ParsedUpdate:
    """SPARQL UPDATE text subset (QueryTree update types, dispatch
    Database.cpp:619-635, evaluation GeneralEvaluation.cpp:3008-3065):
      INSERT DATA { ... }              DELETE DATA { ... }
      DELETE WHERE { ... }
      DELETE { tmpl } INSERT { tmpl } WHERE { ... }   (either clause
      optional — the MODIFY form; templates may reference WHERE vars)."""
    p = _Parser(tokenize(text))
    while p.at_kw("prefix"):
        p.next()
        ns, iri = p.next(), p.next()
        p.prefixes[ns.text] = iri.text[1:-1]
    if p.at_kw("insert"):
        p.next()
        if p.at_kw("data"):
            p.next()
            form = "insert_data"
        else:  # INSERT { tmpl } WHERE { ... }
            ins = _template_patterns(p.parse_group(), "INSERT")
            p.eat_kw("where")
            where = p.parse_group()
            if p.peek() is not None:
                raise ValueError(f"trailing tokens at {p.peek()}")
            return ParsedUpdate("modify", [], [], ins, where)
    elif p.at_kw("delete"):
        p.next()
        if p.at_kw("data"):
            p.next()
            form = "delete_data"
        elif p.at_kw("where"):
            p.next()
            form = "delete_where"
        else:  # DELETE { tmpl } [INSERT { tmpl }] WHERE { ... }
            dels = _template_patterns(p.parse_group(), "DELETE")
            ins: list[TriplePattern] = []
            if p.at_kw("insert"):
                p.next()
                ins = _template_patterns(p.parse_group(), "INSERT")
            p.eat_kw("where")
            where = p.parse_group()
            if p.peek() is not None:
                raise ValueError(f"trailing tokens at {p.peek()}")
            return ParsedUpdate("modify", [], dels, ins, where)
    else:
        raise ValueError(
            "expected INSERT [DATA] / DELETE [DATA|WHERE] / DELETE..INSERT..WHERE"
        )
    g = p.parse_group()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens at {p.peek()}")
    if g.path_patterns or g.binds or g.post_binds or g.values_tables or g.sub_evals:
        # silently dropping a path/BIND/VALUES from an update group would
        # turn the update into a wrong-scope write — reject loudly
        raise ValueError(f"{form} group must contain only triple patterns")
    if form in ("insert_data", "delete_data"):
        for pat in g.patterns:
            if pat.vars():
                raise ValueError(f"{form} requires ground triples, got {pat}")
    return ParsedUpdate(form, g.patterns)


def run_update(triples: DataFrame, text: str) -> DataFrame:
    """Apply a parsed update to a string-triple DataFrame
    (subj, pred, obj[, o_is_entity]) -> the post-update triple set."""
    from gstored_spark.kg.update import delete_where_triples, modify_where_triples

    u = parse_update(text)
    spark = triples.sparkSession
    if u.form == "delete_where":
        return delete_where_triples(triples, u.patterns)
    if u.form == "modify":
        return modify_where_triples(
            triples, u.delete_templates, u.insert_templates, u.where
        )
    ground = spark.createDataFrame(
        [(p.s, p.p, p.o, not p.o.startswith('"')) for p in u.patterns],
        ["subj", "pred", "obj", "o_is_entity"],
    )
    if u.form == "delete_data":
        return triples.join(
            ground.select("subj", "pred", "obj"), ["subj", "pred", "obj"], "left_anti"
        )
    return triples.unionByName(ground, allowMissingColumns=True).distinct()


def _needs_ordering(g: GroupPattern) -> bool:
    """Stats pay only when some group joins >= 2 patterns."""
    if len(g.patterns) > 1:
        return True
    return any(
        _needs_ordering(sub)
        for subs in (g.optionals, g.unions, g.minus, g.joins, g.exists, g.not_exists)
        for sub in subs
    )


def run_sparql(triples: DataFrame, text: str, pred_counts="auto") -> DataFrame:
    """Parse and evaluate a SPARQL query over triples(subj, pred, obj).

    SELECT -> one column per projected var (no '?'); ASK -> zero-or-one row
    with column ``ask`` = true (the LIMIT-1 probe, plans/bgp.ask).

    ``pred_counts``: "auto" (default) gathers the p2num statistics with one
    tiny groupBy when the query has a multi-pattern group, so PARSED queries
    seed the greedy join order by measured cardinality exactly like the
    store-backed matcher (which reads the persisted stats); pass None to
    skip, or a precomputed dict (plans.bgp.predicate_counts / artifact
    pred_stats) to reuse across queries."""
    q = parse_sparql(text)
    if pred_counts == "auto":
        from gstored_spark.plans.bgp import predicate_counts

        pred_counts = (
            predicate_counts(triples) if _needs_ordering(q.group) else None
        )
    if q.form == "describe":
        return _describe_query(triples, q, pred_counts=pred_counts)
    df = eval_group(triples, q.group, pred_counts=pred_counts)
    return _finish_query(q, df)


def _describe_query(
    triples: DataFrame, q: "ParsedQuery", pred_counts=None
) -> DataFrame:
    """DESCRIBE: the one-hop concise description — every stored triple whose
    subject OR object is a described resource (constants listed directly;
    vars resolved by evaluating the WHERE group). Two semi-joins over the
    triple bag, set semantics."""
    spark = triples.sparkSession
    consts = [t for t in q.templates if not t.startswith("?")]
    vars_ = [t[1:] for t in q.templates if t.startswith("?")]
    nodes: DataFrame | None = None
    if consts:
        nodes = spark.createDataFrame([(c,) for c in consts], "n string")
    if vars_:
        b = eval_group(triples, q.group, pred_counts=pred_counts)
        for v in vars_:
            nv = b.select(F.col(v).alias("n"))
            nodes = nv if nodes is None else nodes.unionAll(nv)
    if nodes is None:
        raise ValueError("DESCRIBE needs at least one term or var")
    nodes = nodes.distinct()
    by_subj = triples.join(
        nodes.withColumnRenamed("n", "subj"), "subj", "leftsemi"
    ).select("subj", "pred", "obj")
    by_obj = triples.join(
        nodes.withColumnRenamed("n", "obj"), "obj", "leftsemi"
    ).select("subj", "pred", "obj")
    return modifiers(
        by_subj.unionAll(by_obj).distinct(), limit=q.limit, offset=q.offset
    )


def run_sparql_over_artifact(artifact, text: str, assembled: bool = False) -> DataFrame:
    """Parse and evaluate a SPARQL query AGAINST THE EMITTED STORE — the
    complete gqueryD lifecycle from query text (Main/gqueryD.cpp:108-265
    reads a query file, parses, and answers out of the loaded partitioned
    store): every leaf BGP is matched by the store-backed matcher
    (signature pruning, predicate-first pbucket routing, persisted-p2num
    join ordering — kg.match.match_over_blocks), the group algebra and
    solution modifiers run on top, and ASK ends in the LIMIT-1 probe.

    ``assembled=True`` answers leaves by partial-evaluation-and-assembly
    (kg.match.match_partitioned) instead — the PE lifecycle under the same
    text front-end. Result-equal (asserted in tests)."""
    from gstored_spark.kg.match import match_over_blocks, match_partitioned

    q = parse_sparql(text)
    if assembled:
        ev = lambda pats: match_partitioned(artifact, pats)  # noqa: E731
    else:
        ev = lambda pats: match_over_blocks(artifact, pats)  # noqa: E731
    pe = None
    if _has_paths(q.group):
        from gstored_spark.kg.match import path_pattern_over_blocks

        pe = lambda s, p, o, i: path_pattern_over_blocks(  # noqa: E731
            artifact, s, p, o, i
        )
    if q.form == "describe":
        return _describe_over_artifact(artifact, q, ev, pe)
    df = eval_group(None, q.group, bgp_eval=ev, path_eval=pe)
    return _finish_query(q, df)


def _describe_over_artifact(artifact, q: "ParsedQuery", ev, pe) -> DataFrame:
    """DESCRIBE against the store at the scale placement: the resource set
    encodes to ids through the dictionary (a join, never a collect), the
    two directional semi-joins run over the ID triple bag (long keys), and
    only the MATCHING triples decode — the naive placement decodes every
    stored triple before filtering."""
    from gstored_spark.kg.blocks import triples_from_adjacency
    from gstored_spark.kg.ids import decode_ids

    spark = artifact.adjacency.sparkSession
    consts = [t for t in q.templates if not t.startswith("?")]
    vars_ = [t[1:] for t in q.templates if t.startswith("?")]
    nodes: DataFrame | None = None
    if consts:
        nodes = spark.createDataFrame([(c,) for c in consts], "n string")
    if vars_:
        b = eval_group(None, q.group, bgp_eval=ev, path_eval=pe)
        for v in vars_:
            nv = b.select(F.col(v).alias("n"))
            nodes = nv if nodes is None else nodes.unionAll(nv)
    if nodes is None:
        raise ValueError("DESCRIBE needs at least one term or var")
    term_dict = artifact.entity_dict.unionByName(artifact.literal_dict)
    node_ids = (
        nodes.distinct()
        .join(term_dict.withColumnRenamed("term", "n"), "n")
        .select("id")
    )
    tbp = artifact.triples_by_pred
    ids = (
        tbp.select("s", "p", "o")
        if tbp is not None
        else triples_from_adjacency(artifact.adjacency)
    )
    hits = ids.join(
        node_ids.withColumnRenamed("id", "s"), "s", "leftsemi"
    ).unionAll(
        ids.join(node_ids.withColumnRenamed("id", "o"), "o", "leftsemi")
        .select("s", "p", "o")
    ).distinct()
    t = decode_ids(hits, "s", term_dict, "subj")
    t = decode_ids(t, "p", artifact.pred_dict, "pred")
    t = decode_ids(t, "o", term_dict, "obj")
    return modifiers(
        t.select("subj", "pred", "obj"), limit=q.limit, offset=q.offset
    )


def _make_subselect(q: "ParsedQuery"):
    """Close a nested { SELECT ... } into the evaluator shape GroupPattern
    carries (sub_evals): the full query tail (aggregation, modifiers,
    projection) runs on the inner group, so only projected vars join the
    outer relation."""

    def _eval(triples, pred_counts=None, bgp_eval=None, path_eval=None) -> DataFrame:
        df = eval_group(
            triples, q.group,
            pred_counts=pred_counts, bgp_eval=bgp_eval, path_eval=path_eval,
        )
        return _finish_query(q, df)

    _eval.query = q  # introspection hook (_has_paths walks into subselects)
    return _eval


def _has_paths(g: GroupPattern) -> bool:
    return (
        bool(g.path_patterns)
        or any(
            _has_paths(sub)
            for sub in g.unions
            + g.joins
            + g.optionals
            + g.minus
            + g.exists
            + g.not_exists
        )
        or any(
            _has_paths(f.query.group) for f in g.sub_evals if hasattr(f, "query")
        )
    )


def _finish_query(q: "ParsedQuery", df: DataFrame) -> DataFrame:
    """Solution modifiers shared by the flat-view and store-backed text
    front-ends (GeneralEvaluation.cpp:2939-3010 applies the same modifier
    tail regardless of how the group was evaluated)."""
    if q.form == "ask":
        return df.limit(1).select(F.lit(True).alias("ask"))
    if q.form == "construct":
        # instantiate each template over the solutions; union; SET semantics
        out: DataFrame | None = None
        for t in q.templates:
            def term_col(term, role):
                if term.startswith("?"):
                    v = term[1:]
                    return (
                        F.col(v) if v in df.columns else F.lit(None).cast("string")
                    ).alias(role)
                return F.lit(term).alias(role)

            one = df.select(
                term_col(t.s, "subj"), term_col(t.p, "pred"), term_col(t.o, "obj")
            ).filter(
                F.col("subj").isNotNull()
                & F.col("pred").isNotNull()
                & F.col("obj").isNotNull()
            )
            out = one if out is None else out.unionAll(one)
        assert out is not None, "CONSTRUCT needs at least one template"
        return modifiers(out.distinct(), limit=q.limit, offset=q.offset)
    # SPARQL 1.1 aggregation tail: hidden agg columns first (map-side
    # partial aggregation), then post-agg select expressions and HAVING
    # filters that reference them, then the hidden columns drop away
    if q.group_by and not q.aggregates:
        df = df.select(*q.group_by).distinct()
    elif q.group_by or q.aggregates:
        aggs = [c.alias(n) for n, c in q.aggregates]
        df = df.groupBy(*q.group_by).agg(*aggs) if q.group_by else df.agg(*aggs)
    for alias, col in q.select_exprs:
        df = df.withColumn(alias, col)
    for cond in q.having:
        df = df.filter(cond)
    if q.aggregates:
        df = df.drop(*[n for n, _ in q.aggregates])
    proj = q.projection if q.projection is not None else _group_vars(q.group)
    # a projected var bound nowhere in the group is unbound -> NULL column
    # (SPARQL unbound semantics, not an analysis error)
    for v in proj:
        if v not in df.columns:
            df = df.withColumn(v, F.lit(None).cast("string"))
    order = [(c, asc) for c, asc in q.order_by if c in df.columns] or None
    if q.distinct:
        # DISTINCT applies to the projected multiset; only projected sort
        # keys survive it
        df = df.select(*proj).distinct()
        order = [(c, asc) for c, asc in (order or []) if c in proj] or None
        return modifiers(df, order_by=order, limit=q.limit, offset=q.offset)
    # ORDER BY may reference non-projected vars: sort the full relation,
    # then project (sort order is preserved through the narrow select)
    df = modifiers(df, order_by=order, limit=q.limit, offset=q.offset)
    return df.select(*proj)
