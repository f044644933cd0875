"""SPARQL 1.1 property paths compiled to DataFrame algebra.

The reference's SPARQL surface stops at SPARQL 1.0 triple patterns — its
ANTLR grammar has no path production (Parser/SparqlParser.c; QueryTree.h
stores only fixed s/p/o triples), so `<p>+` reachability queries must be
hand-unrolled by the user up to a guessed depth. This module adds the
SPARQL 1.1 path operators on top of the same triples relation, Spark-first:

  - sequence (`a/b`), alternative (`a|b`) and inverse (`^a`) are pure
    relational algebra: equi-join, bag union, column swap — Catalyst
    optimizes them like any other plan (pushdown, AQE broadcast);
  - arbitrary-length paths (`p+`, `p*`, `p?`) are SEMI-NAIVE delta
    iteration (the Datalog transitive-closure evaluation): each round joins
    only the pairs DISCOVERED LAST ROUND against the base edge set, never
    the accumulated closure, and every round localCheckpoints both the
    delta and the accumulator to truncate lineage — the identical
    discipline to the connected-components rounds in operators/cc.py.
    Rounds = graph diameter; per-round work = |delta ⋈ edges|, all
    hash-partitioned shuffles on the join key.

Scale notes (100 TB framing): a closure with one BOUND endpoint never
materializes the full transitive closure — `eval_path_pattern` seeds the
iteration with the single constant and runs a frontier BFS over node sets
(`reachable_from`), so cost is O(reachable subgraph), the same asymmetry
the reference exploits when a B+-tree probe is seeded by a constant
subject. The full-closure path (both endpoints free) is the worst case of
the operator by definition — it is bounded by |TC(G)| like any Datalog
engine, and each round's dedup (`distinct` + left_anti against the
accumulator) is a partial-aggregation shuffle, never a driver collect.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

MAX_ROUNDS = 200  # diameter guard: beyond this the input is pathological


# ---------------------------------------------------------------------------
# path AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Link:
    """Atomic predicate IRI (PathPrimary)."""

    iri: str


@dataclass(frozen=True)
class Inv:
    """`^path` — inverse path (swap endpoint roles)."""

    path: object


@dataclass(frozen=True)
class Seq:
    """`a/b/...` — sequence path."""

    parts: tuple


@dataclass(frozen=True)
class Alt:
    """`a|b|...` — alternative path (bag union)."""

    parts: tuple


@dataclass(frozen=True)
class Repeat:
    """`path+` / `path*` / `path?` — arbitrary-length / optional path.

    Per the SPARQL 1.1 spec these are SET-semantics operators (distinct
    pairs), unlike seq/alt which are bag operators."""

    path: object
    op: str  # '+', '*', '?'


@dataclass(frozen=True)
class Neg:
    """`!iri` / `!(iri1|^iri2|...)` — negated property set: an edge whose
    predicate is NOT in the forward set, unioned with a REVERSED edge whose
    predicate is not in the inverse set (spec: forward and inverse parts
    evaluate independently)."""

    forward: tuple  # IRIs excluded in the forward direction
    inverse: tuple  # IRIs excluded in the inverse direction


def path_vars(path) -> set[str]:
    return set()  # paths contain no variables; endpoints carry them


# ---------------------------------------------------------------------------
# edge relations
# ---------------------------------------------------------------------------


def graph_nodes(triples: DataFrame) -> DataFrame:
    """All RDF terms occurring as subject or object — the domain of the
    zero-length path (SPARQL 1.1 ZeroLengthPath over ?V ?W binds both to
    each node in G)."""
    return (
        triples.select(F.col("subj").alias("n"))
        .unionAll(triples.select(F.col("obj").alias("n")))
        .distinct()
    )


def closure_pairs(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """One-or-more-step reachability pairs (s, o): semi-naive transitive
    closure. The frontier (pairs first discovered last round) joins the
    BASE edges — never the accumulated closure — so round r discovers
    exactly the pairs whose shortest path is r+1 edges; cycles terminate
    because the left_anti dedup empties the frontier once no NEW pair
    exists."""
    base = edges.distinct().localCheckpoint(eager=True)
    total, frontier = base, base
    for _ in range(max_rounds):
        step = base.select(F.col("s").alias("__m"), F.col("o").alias("__n"))
        nxt = (
            frontier.select("s", F.col("o").alias("__m"))
            .join(step, "__m")
            .select("s", F.col("__n").alias("o"))
            .distinct()
        )
        delta = nxt.join(total, ["s", "o"], "left_anti").localCheckpoint(eager=True)
        if delta.isEmpty():
            return total
        total = total.unionAll(delta).localCheckpoint(eager=True)
        frontier = delta
    raise RuntimeError(f"transitive closure did not converge in {max_rounds} rounds")


def closure_pairs_squaring(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Path-doubling transitive closure: round k holds every pair reachable
    in <= 2^k edges, so convergence takes O(log diameter) rounds instead of
    the semi-naive O(diameter). Each round joins the ACCUMULATED closure
    with itself — more work per round (|TC| ⋈ |TC| vs |delta| ⋈ |E|) but
    exponentially fewer rounds. The right trade for DEEP graphs (long
    chains, organizational hierarchies) where per-round driver coordination
    and shuffle latency dominate; semi-naive (closure_pairs) wins on
    small-diameter graphs where the closure is large relative to the delta.
    Result-equal to closure_pairs (asserted in tests)."""
    total = edges.distinct().localCheckpoint(eager=True)
    n = total.count()
    for _ in range(max_rounds):
        step = total.select(F.col("s").alias("__m"), F.col("o").alias("__n"))
        doubled = (
            total.select("s", F.col("o").alias("__m"))
            .join(step, "__m")
            .select("s", F.col("__n").alias("o"))
        )
        nxt = total.unionAll(doubled).distinct().localCheckpoint(eager=True)
        n2 = nxt.count()
        if n2 == n:
            return total
        total, n = nxt, n2
    raise RuntimeError(f"squaring closure did not converge in {max_rounds} rounds")


def reachable_from(
    edges: DataFrame, sources: DataFrame, max_rounds: int = MAX_ROUNDS
) -> DataFrame:
    """Nodes reachable in >= 1 step from ``sources(n)`` — the bound-endpoint
    fast path: frontier BFS over NODE SETS (not pairs), cost proportional
    to the reachable subgraph instead of the whole closure."""
    step = edges.select(F.col("s").alias("n"), F.col("o").alias("__n"))
    frontier = sources.select("n").distinct().localCheckpoint(eager=True)
    total = None
    for _ in range(max_rounds):
        nxt = frontier.join(step, "n").select(F.col("__n").alias("n")).distinct()
        if total is None:
            delta = nxt.localCheckpoint(eager=True)
        else:
            delta = nxt.join(total, ["n"], "left_anti").localCheckpoint(eager=True)
        if delta.isEmpty():
            return total if total is not None else delta
        total = delta if total is None else total.unionAll(delta).localCheckpoint(
            eager=True
        )
        frontier = delta
    raise RuntimeError(f"reachability did not converge in {max_rounds} rounds")


def path_edges(triples: DataFrame, path, link_edges=None) -> DataFrame:
    """Compile a path expression to its (s, o) endpoint-pair relation.

    seq/alt preserve bag multiplicity (SPARQL path algebra); Repeat is
    set-semantics by spec. Zero-length contributions of `*`/`?` bind every
    graph node to itself.

    ``link_edges``: optional physical-access override for atomic Links —
    the store-backed evaluator routes each predicate to its pbucket=
    directory (predicate-first order) instead of filtering the full view;
    Neg keeps the full view (negation is inherently multi-predicate)."""
    if isinstance(path, Link):
        if link_edges is not None:
            return link_edges(path.iri)
        return triples.filter(F.col("pred") == path.iri).select(
            F.col("subj").alias("s"), F.col("obj").alias("o")
        )
    if isinstance(path, Inv):
        e = path_edges(triples, path.path, link_edges)
        return e.select(F.col("o").alias("s"), F.col("s").alias("o"))
    if isinstance(path, Seq):
        acc = path_edges(triples, path.parts[0], link_edges)
        for part in path.parts[1:]:
            nxt = path_edges(triples, part, link_edges).select(
                F.col("s").alias("__m"), F.col("o").alias("__n")
            )
            acc = (
                acc.withColumnRenamed("o", "__m")
                .join(nxt, "__m")
                .select("s", F.col("__n").alias("o"))
            )
        return acc
    if isinstance(path, Alt):
        acc = path_edges(triples, path.parts[0], link_edges)
        for part in path.parts[1:]:
            acc = acc.unionAll(path_edges(triples, part, link_edges))
        return acc
    if isinstance(path, Neg):
        parts = []
        if path.forward or not path.inverse:
            fwd = triples
            if path.forward:
                fwd = fwd.filter(~F.col("pred").isin(list(path.forward)))
            parts.append(
                fwd.select(F.col("subj").alias("s"), F.col("obj").alias("o"))
            )
        if path.inverse:
            inv = triples.filter(~F.col("pred").isin(list(path.inverse)))
            parts.append(
                inv.select(F.col("obj").alias("s"), F.col("subj").alias("o"))
            )
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.unionAll(p)
        return acc
    if isinstance(path, Repeat):
        inner = path_edges(triples, path.path, link_edges)
        if path.op == "+":
            return closure_pairs(inner)
        ident = graph_nodes(triples).select(
            F.col("n").alias("s"), F.col("n").alias("o")
        )
        if path.op == "*":
            return closure_pairs(inner).unionAll(ident).distinct()
        if path.op == "?":
            return inner.unionAll(ident).distinct()
    raise ValueError(f"unknown path node: {path!r}")


# ---------------------------------------------------------------------------
# pattern evaluation: (s_term, path, o_term) -> bindings DataFrame
# ---------------------------------------------------------------------------


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def eval_path_pattern(
    triples: DataFrame, s_term, path, o_term, idx: int = 0, link_edges=None
) -> DataFrame:
    """Bindings of one path triple pattern.

    Bound-endpoint Repeat paths take the seeded-BFS fast path; everything
    else filters/renames the pair relation exactly like a BGP leaf
    (plans/bgp._pattern_df), including the repeated-var equality
    (?x path ?x)."""
    spark = triples.sparkSession
    fast = isinstance(path, Repeat) and not (_is_var(s_term) and _is_var(o_term))
    if fast:
        inner = path_edges(triples, path.path, link_edges)
        if not _is_var(s_term):
            const, var, edges = s_term, o_term, inner
        else:
            # bound object: reverse the edges and BFS from the object side
            const, var = o_term, s_term
            edges = inner.select(F.col("o").alias("s"), F.col("s").alias("o"))
        seed_type = "long" if isinstance(const, int) else "string"
        seed = spark.createDataFrame([(const,)], f"n {seed_type}")
        if path.op == "?":
            reach = (
                edges.filter(F.col("s") == const)
                .select(F.col("o").alias("n"))
                .distinct()
            )
        else:
            reach = reachable_from(edges, seed)
        if path.op in ("*", "?"):
            # zero-length: a constant endpoint matches itself regardless of
            # graph membership (spec: eval(Path(X, ZeroLengthPath, ?V)) binds
            # ?V to X)
            reach = reach.unionAll(seed).distinct()
        if _is_var(var):
            return reach.select(F.col("n").alias(var[1:]))
        # both endpoints constant: boolean row, mirrors _pattern_df
        return reach.filter(F.col("n") == var).select(
            F.lit(1).alias(f"_const_{idx}")
        )

    pairs = path_edges(triples, path, link_edges)
    if _is_var(s_term) and _is_var(o_term):
        if s_term == o_term:
            return pairs.filter(F.col("s") == F.col("o")).select(
                F.col("s").alias(s_term[1:])
            )
        return pairs.select(
            F.col("s").alias(s_term[1:]), F.col("o").alias(o_term[1:])
        )
    if _is_var(s_term):
        return pairs.filter(F.col("o") == o_term).select(
            F.col("s").alias(s_term[1:])
        )
    if _is_var(o_term):
        return pairs.filter(F.col("s") == s_term).select(
            F.col("o").alias(o_term[1:])
        )
    return pairs.filter(
        (F.col("s") == s_term) & (F.col("o") == o_term)
    ).select(F.lit(1).alias(f"_const_{idx}"))
