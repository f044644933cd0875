"""BGP (basic graph pattern) matching compiled to DataFrame joins.

The reference encodes a BGP as a query graph and expands a binding table one
vertex at a time with a greedy order (Join::multi_join,
Database/Join.cpp:1418-1633; scoring Join.cpp:71-77 `score_node(degree,
|cand|)`, frontier choice `choose_next_node` 961-998). Here each triple
pattern becomes a filtered self-view of the triples DataFrame and the
binding table grows by equi-joins; the greedy constant-first order seeds
Catalyst with a selective join tree and AQE re-orders/broadcasts at runtime
(SURVEY §4: AQE replaces the hand-rolled ordering).

Matching semantics are subgraph *homomorphism* (two vars may bind the same
vertex), exactly the reference's (Util/Util.h:9-11 note).

Also here: a minimal parser for the reference's query files
(example/query.txt, example/query_2.txt — `select ?vars where { s p o. }`)
and the SPARQL solution modifiers the single-node reference path supports
(DISTINCT / ORDER / LIMIT / OFFSET, Query/GeneralEvaluation.cpp:2859-2996)
as trivial DataFrame calls.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


def is_var(term) -> bool:
    """A pattern term is a variable iff it is a '?'-prefixed string;
    constants may be strings (lexical terms) or ints (dictionary ids —
    the id-level matching mode)."""
    return isinstance(term, str) and term.startswith("?")


@dataclass(frozen=True)
class TriplePattern:
    s: object  # "?var" or constant term (str lexical form | int id)
    p: object
    o: object

    def vars(self) -> set[str]:
        return {t for t in (self.s, self.p, self.o) if is_var(t)}

    def n_constants(self) -> int:
        return 3 - len(self.vars())


def parse_query(text: str) -> tuple[list[str], list[TriplePattern]]:
    """Parse the reference's query format: ``select ?a ?b where { ... }``
    with whitespace-separated ``s p o.`` patterns (QueryParser surface for
    plain BGP SELECTs, README.md:41)."""
    m = re.search(r"select\s+(.*?)\s+where\s*\{(.*)\}", text, re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError("only 'select ... where { ... }' BGP queries supported")
    proj = m.group(1).split()
    body = m.group(2)
    patterns = []
    for stmt in body.split("."):
        toks = stmt.split()
        if not toks:
            continue
        if len(toks) != 3:
            raise ValueError(f"bad triple pattern: {stmt!r}")
        patterns.append(TriplePattern(*toks))
    return proj, patterns


def _pattern_df(triples: DataFrame, pat: TriplePattern, idx: int) -> tuple[DataFrame, set[str]]:
    """One filtered/renamed view of the triples table per pattern. Constant
    filters are pushed into the scan by Catalyst (PushedFilters)."""
    df = triples
    cols = []
    for role, term in (("subj", pat.s), ("pred", pat.p), ("obj", pat.o)):
        if is_var(term):
            cols.append(F.col(role).alias(term[1:]))
        else:
            df = df.filter(F.col(role) == term)
    out = df.select(*cols) if cols else df.select(F.lit(1).alias(f"_const_{idx}"))
    # a pattern with a repeated var (?x p ?x) needs the equality applied
    names = [t[1:] for t in (pat.s, pat.p, pat.o) if is_var(t)]
    if len(names) != len(set(names)):
        # rebuild with positional aliases then filter equal pairs
        df2 = triples
        sel, seen, conds = [], {}, []
        for role, term in (("subj", pat.s), ("pred", pat.p), ("obj", pat.o)):
            if is_var(term):
                v = term[1:]
                if v in seen:
                    conds.append((seen[v], role))
                else:
                    seen[v] = role
                    sel.append(F.col(role).alias(v))
            else:
                df2 = df2.filter(F.col(role) == term)
        for a, b in conds:
            df2 = df2.filter(F.col(a) == F.col(b))
        out = df2.select(*sel)
    return out, pat.vars()


def predicate_counts(triples: DataFrame) -> dict[str, tuple]:
    """Per-predicate (n, n_distinct_subj, n_distinct_obj) — the p2num +
    subIDpreID2num/objIDpreID2num statistics the reference builds for
    ordering (KVstore/KVstore.h:296-301). Predicates are few; the collect
    is tiny. Values feed _cardinality: a bound endpoint divides by the
    measured distinct count (average fanout) instead of a flat constant."""
    return {
        r["pred"]: (r["n"], r["n_s"], r["n_o"])
        for r in triples.groupBy("pred").agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("subj").alias("n_s"),
            F.approx_count_distinct("obj").alias("n_o"),
        ).collect()
    }


def _cardinality(pat: TriplePattern, bound: set[str], pred_counts, total: int) -> float:
    """Estimated result size of expanding by ``pat`` given already-bound
    vars — the |cand| in the reference's greedy score
    (Join.cpp:71-77, score = 100000/|cand| weighted by degree).

    ``pred_counts`` values are either a plain triple count n, or a
    (n, n_s, n_o) tuple carrying per-predicate distinct-endpoint counts
    (the subIDpreID2num/objIDpreID2num analog, KVstore.h:296-301): a bound
    subject then divides by n_s (measured average out-fanout = n/n_s per
    probe) instead of a flat constant — the flat 100 misestimates skewed
    predicates by orders of magnitude."""
    stat = pred_counts.get(pat.p, total) if not is_var(pat.p) else total
    n, n_s, n_o = (
        tuple(stat)[:3] if isinstance(stat, (tuple, list)) else (stat, None, None)
    )
    est = float(n)
    for term, nd in ((pat.s, n_s), (pat.o, n_o)):
        if not is_var(term) or term in bound:
            est /= max(float(nd), 1.0) if nd else 100.0
    return est


def greedy_order(
    patterns: list[TriplePattern],
    pred_counts: dict[str, int] | None = None,
) -> list[int]:
    """Constant-first, connected-next ordering (Join.cpp:71-77,961-998
    heuristic: seed with the most-selective pattern, grow along shared
    vars, prefer selective + well-connected). With ``pred_counts`` (the
    p2num stats, predicate_counts()), selectivity is cardinality-based —
    the reference's 100000/|cand| score; without, constants count stands in
    for cardinality. AQE re-orders at runtime either way."""
    remaining = set(range(len(patterns)))
    order: list[int] = []
    bound: set[str] = set()
    total = 1
    if pred_counts:
        total = max(
            sum(v[0] if isinstance(v, (tuple, list)) else v for v in pred_counts.values()),
            1,
        )

    while remaining:
        if pred_counts:
            def key(i: int):
                shared = len({v for v in patterns[i].vars()} & bound)
                connected = 1 if (order and shared > 0) else 0
                est = _cardinality(patterns[i], bound, pred_counts, total)
                return (connected, -est, shared, -i)
        else:
            def key(i: int):
                shared = len(patterns[i].vars() & bound)
                return (1 if (order and shared > 0) else 0, patterns[i].n_constants(), shared, -i)

        nxt = max(remaining, key=key)
        order.append(nxt)
        bound |= patterns[nxt].vars()
        remaining.remove(nxt)
    return order


# estimated first-leaf size above which one repartition is cheap next to
# the serial scan it prevents (an exchange of ~8 MB of skinny rows costs
# well under a second; a two-row-group scan feeding an explosive join
# chain costs minutes — guide §2 scale-adaptive partitioning)
SPREAD_LEAF_MIN_BYTES = 8 * 1024 * 1024


def _spread_large_leaf(df: DataFrame, pat: "TriplePattern") -> DataFrame:
    """The FIRST leaf in join order is the streamed side of the whole
    broadcast-join chain: its scan partitioning becomes the task count of
    every downstream join and of the final aggregation. A large leaf read
    from a one-row-group parquet file would serialize the explosive part
    of the query into one or two tasks. Spread only when (a) the pattern
    has no subject/object constant (a constant endpoint means the leaf is
    selective even when the pre-filter size estimate is not), (b) the
    optimizer's size estimate says the leaf is big enough that one
    exchange is cheap by comparison, and (c) the current plan is actually
    parallelism-deficient (spread_scan's no-op check) — at production
    split counts this never fires."""
    if not (is_var(pat.s) and is_var(pat.o)):
        return df
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return df
    if size < SPREAD_LEAF_MIN_BYTES:
        return df
    from gstored_spark.partitioning import spread_scan

    return spread_scan(df)


def match_bgp(
    triples: DataFrame,
    patterns: list[TriplePattern],
    projection: list[str] | None = None,
    candidates: dict[str, DataFrame] | None = None,
    pred_counts: dict[str, int] | None = None,
    triples_for=None,
) -> DataFrame:
    """triples(subj, pred, obj) x BGP -> bindings DataFrame (one column per
    var, no '?' prefix). Disconnected components become cross joins (the
    reference splits them into separate BasicQueries then products,
    GeneralEvaluation.cpp:494-550).

    ``candidates``: optional var -> single-column DataFrame of allowed
    bindings, semi-joined into each *leaf* pattern view before any join —
    the signature-prefilter hook (F1): leaves shrink, so every downstream
    shuffle shrinks.

    ``triples_for``: optional ``pattern -> DataFrame`` physical-access-path
    router (the Strategy.cpp:272-362 method-dispatch analog): each leaf
    view scans the most selective physical order available for its shape
    (e.g. the predicate-bucketed table for a constant predicate) instead of
    one canonical bag. Every source must present (subj, pred, obj)."""
    order = greedy_order(patterns, pred_counts)
    acc: DataFrame | None = None
    acc_vars: set[str] = set()
    for idx in order:
        src = triples_for(patterns[idx]) if triples_for else triples
        pdf, pvars = _pattern_df(src, patterns[idx], idx)
        if candidates:
            for v in pvars:
                name = v[1:]
                if name in candidates:
                    cand = candidates[name].toDF(name)
                    pdf = pdf.join(cand, name, "leftsemi")
        if acc is None:
            acc, acc_vars = _spread_large_leaf(pdf, patterns[idx]), pvars
            continue
        shared = [v[1:] for v in (acc_vars & pvars)]
        if shared:
            acc = acc.join(pdf, shared, "inner")
        else:
            acc = acc.crossJoin(pdf)
        acc_vars |= pvars
    assert acc is not None, "empty BGP"
    drop = [c for c in acc.columns if c.startswith("_const_")]
    if drop:
        acc = acc.drop(*drop)
    if projection:
        acc = acc.select(*[v.lstrip("?") for v in projection])
    return acc


def run_query_text(
    triples: DataFrame,
    query_text: str,
    distinct: bool = False,
    pred_counts="auto",
) -> DataFrame:
    """Parse + evaluate the reference's query-file format. ``pred_counts``:
    "auto" gathers the p2num stats (one tiny groupBy per query) so parsed
    queries order by cardinality BY DEFAULT, like the store-backed path;
    pass None to skip or a precomputed dict to reuse."""
    proj, patterns = parse_query(query_text)
    if pred_counts == "auto":
        pred_counts = predicate_counts(triples) if len(patterns) > 1 else None
    out = match_bgp(triples, patterns, proj, pred_counts=pred_counts)
    return out.distinct() if distinct else out


def is_star(patterns: list[TriplePattern]) -> bool:
    """Star check (QueryTree::checkStar, Query/QueryTree.cpp:559-582): all
    patterns share one subject var and every object is distinct var/const.
    Star queries need no assembly under crossing-edge replication
    (Database.cpp:661-671) — exposed for plan annotations/tests."""
    if not patterns:
        return False
    centers = {p.s for p in patterns}
    if len(centers) != 1:
        return False
    center = next(iter(centers))
    if not is_var(center):
        return False
    # the center var must not reappear as a predicate or object: (?x p ?x)
    # is a self-loop equality, not a star — it falls through to the general
    # path (which applies the repeated-var filter, _pattern_df)
    return all(p.p != center and p.o != center for p in patterns)


# ---------------------------------------------------------------------------
# group-graph-pattern algebra (SURVEY §2.7): the reference composes leaf BGP
# results with join/union/optional/minus/filter units via a postfix stack
# machine (GeneralEvaluation.cpp:2067-2288); here each unit is one DataFrame
# combinator and Catalyst is the stack machine.
# ---------------------------------------------------------------------------


@dataclass
class GroupPattern:
    """A SPARQL group graph pattern subset: base BGP + OPTIONAL groups
    (J4), UNION branches (U1), MINUS groups (J5), FILTER predicates,
    plus ``joins`` — sub-groups joined to the base on shared vars (the
    group-join the reference's stack machine performs for nested groups,
    GeneralEvaluation.cpp:2067-2288).

    ``filters`` entries may be Spark SQL strings or Column expressions;
    ``post_filters`` run after OPTIONAL/MINUS (for filters that reference
    optional-only vars, mirroring the reference's apply-when-covered rule,
    GeneralEvaluation.cpp:2780-2793)."""

    patterns: list[TriplePattern]
    optionals: list["GroupPattern"] = None  # type: ignore[assignment]
    unions: list["GroupPattern"] = None  # type: ignore[assignment]
    minus: list["GroupPattern"] = None  # type: ignore[assignment]
    filters: list = None  # str | Column boolean exprs over var columns
    joins: list["GroupPattern"] = None  # type: ignore[assignment]
    post_filters: list = None  # str | Column, applied after optionals/minus
    exists: list["GroupPattern"] = None  # FILTER EXISTS -> leftsemi
    not_exists: list["GroupPattern"] = None  # FILTER NOT EXISTS -> left_anti
    path_patterns: list = None  # (s_term, paths-AST, o_term) — SPARQL 1.1
    binds: list = None  # (var_name, Column) — BIND(expr AS ?v)
    post_binds: list = None  # binds over OPTIONAL-only vars: apply after
    values_tables: list = None  # (var_names, rows) — inline VALUES data
    # sub-groups that CONSUME a BIND-declared var (a triple pattern after
    # the BIND mentioning ?v): joined after `binds` apply, implementing the
    # spec's sequential BIND scoping — the computed column is a join key,
    # never overwritten
    bind_joins: list = None  # type: ignore[assignment]
    # nested { SELECT ... } units: callables (triples, pred_counts,
    # bgp_eval) -> DataFrame, built by the parser (plans/sparql.py) so the
    # algebra stays ignorant of query-form plumbing; joined like `joins`
    sub_evals: list = None

    def __post_init__(self):
        self.optionals = self.optionals or []
        self.unions = self.unions or []
        self.minus = self.minus or []
        self.filters = self.filters or []
        self.joins = self.joins or []
        self.post_filters = self.post_filters or []
        self.exists = self.exists or []
        self.not_exists = self.not_exists or []
        self.path_patterns = self.path_patterns or []
        self.binds = self.binds or []
        self.post_binds = self.post_binds or []
        self.values_tables = self.values_tables or []
        self.sub_evals = self.sub_evals or []
        self.bind_joins = self.bind_joins or []


def eval_group(
    triples: DataFrame,
    g: GroupPattern,
    pred_counts: dict[str, int] | None = None,
    bgp_eval=None,
    path_eval=None,
) -> DataFrame:
    """Evaluate a GroupPattern to a bindings DataFrame.

    OPTIONAL -> left_outer on shared vars (TempResult::doOptional,
    GeneralEvaluation.cpp:1217-1269); MINUS -> left_anti
    (doMinus, 1270-1307); UNION -> per-branch base joins then unionByName
    (doUnion, 1202-1216 keeps per-VARSET groups; see below); FILTER applied
    as soon as its vars are covered (2780-2793). ``pred_counts`` (the p2num
    stats, predicate_counts()) flows into every match_bgp call so parsed
    queries get cardinality-based join ordering too.

    ``bgp_eval``: optional leaf evaluator ``patterns -> bindings DF``
    replacing the flat-view match_bgp — the group combinators are agnostic
    to how leaf BGPs are answered, exactly like the reference's stack
    machine over TempResults; kg.match.eval_group_partitioned plugs the
    PE-and-assembly matcher in here."""
    def _pred(f):
        return F.expr(f) if isinstance(f, str) else f

    def _leaf(pats):
        if bgp_eval is not None:
            return bgp_eval(pats)
        return match_bgp(triples, pats, pred_counts=pred_counts)

    def _sub(grp):
        return eval_group(triples, grp, pred_counts, bgp_eval, path_eval)

    acc = _leaf(g.patterns) if g.patterns else None
    for i, (s_t, pth, o_t) in enumerate(g.path_patterns):
        # SPARQL 1.1 path patterns (plans/paths.py): `path_eval` overrides
        # the leaf evaluator (the store-backed id-level one,
        # kg.match.path_pattern_over_blocks); default evaluates over the
        # flat triples relation. Either way the result joins like a leaf.
        from gstored_spark.plans.paths import eval_path_pattern

        if path_eval is not None:
            pdf = path_eval(s_t, pth, o_t, i)
        elif triples is None:
            raise ValueError(
                "property paths need a triples relation: pass one to "
                "eval_group (artifact callers: run_sparql_over_artifact "
                "routes paths to the store-backed evaluator)"
            )
        else:
            pdf = eval_path_pattern(triples, s_t, pth, o_t, idx=i)
        if acc is None:
            acc = pdf
        else:
            shared = [c for c in acc.columns if c in pdf.columns]
            acc = acc.join(pdf, shared, "inner") if shared else acc.crossJoin(pdf)
    if g.unions:
        # {P . {A} UNION {B}} = P ⋈ (A ∪ B) — but branches may bind
        # DIFFERENT var subsets, and a var one branch leaves unbound is
        # join-compatible with anything in SPARQL. Padding branches with
        # NULLs and joining the union once would drop every row whose NULL
        # lands in a join key; so the base joins EACH branch on that
        # branch's actually-bound shared vars, and the per-branch results
        # union (the reference's TempResult keeps per-varset groups and
        # joins each on its own bound vars for exactly this reason).
        branches = [_sub(br) for br in g.unions]
        if acc is None:
            u: DataFrame | None = None
            for b in branches:
                u = b if u is None else u.unionByName(b, allowMissingColumns=True)
            acc = u
        else:
            joined: DataFrame | None = None
            for b in branches:
                shared = [c for c in acc.columns if c in b.columns]
                jb = acc.join(b, shared, "inner") if shared else acc.crossJoin(b)
                joined = jb if joined is None else joined.unionByName(
                    jb, allowMissingColumns=True
                )
            acc = joined
    for j in g.joins:
        jdf = _sub(j)
        if acc is None:
            acc = jdf
        else:
            shared = [c for c in acc.columns if c in jdf.columns]
            acc = acc.join(jdf, shared, "inner") if shared else acc.crossJoin(jdf)
    for f in g.sub_evals:
        jdf = f(triples, pred_counts, bgp_eval, path_eval)
        if acc is None:
            acc = jdf
        else:
            shared = [c for c in acc.columns if c in jdf.columns]
            acc = acc.join(jdf, shared, "inner") if shared else acc.crossJoin(jdf)
    for vars_, rows in g.values_tables:
        # inline VALUES data. UNDEF (parsed to NULL) is join-compatible
        # with ANY binding, so rows group by their bound-var subset and
        # each subset joins the base on ITS bound shared vars only — the
        # same per-varset strategy as UNION branches. One inner join keyed
        # on a NULL cell would silently drop those solutions.
        from pyspark.sql import SparkSession

        spark = (
            acc.sparkSession
            if acc is not None
            else triples.sparkSession
            if triples is not None
            else SparkSession.getActiveSession()
        )
        by_subset: dict[tuple, list] = {}
        for row in rows:
            bound = tuple(v for v, val in zip(vars_, row) if val is not None)
            by_subset.setdefault(bound, []).append(row)
        out: DataFrame | None = None
        for bound, rws in by_subset.items():
            vdf = spark.createDataFrame(
                rws, ", ".join(f"{v} string" for v in vars_)
            )
            if acc is None:
                piece = vdf
            elif bound:
                # UNDEF columns drop from the relation: they neither
                # constrain nor overwrite the base's bindings
                rel = vdf.select(*[v for v in vars_ if v in bound])
                shared = [c for c in acc.columns if c in rel.columns]
                piece = (
                    acc.join(rel, shared, "inner")
                    if shared
                    else acc.crossJoin(rel)
                )
            else:
                # all-UNDEF row(s): no constraint — each row repeats the
                # base once (bag semantics)
                piece = acc
                for _ in rws[1:]:
                    piece = piece.unionByName(acc)
            out = (
                piece
                if out is None
                else out.unionByName(piece, allowMissingColumns=True)
            )
        acc = out
        if acc is not None:
            # a var UNDEF in every row and absent from the base must still
            # project (as unbound)
            for v in vars_:
                if v not in acc.columns:
                    acc = acc.withColumn(v, F.lit(None).cast("string"))
    assert acc is not None, "empty group pattern"
    for v, col in g.binds:
        # BIND(expr AS ?v): applies after the relational part of the
        # elements that PRECEDE it; patterns that consume ?v were split
        # into bind_joins by the parser (sequential BIND scoping)
        acc = acc.withColumn(v, col)
    for bj in g.bind_joins:
        # patterns textually after a BIND that mention its var: the
        # computed column is now a real binding, so it joins as a key
        jdf = _sub(bj)
        shared = [c for c in acc.columns if c in jdf.columns]
        acc = acc.join(jdf, shared, "inner") if shared else acc.crossJoin(jdf)
    for f in g.filters:
        acc = acc.filter(_pred(f))
    for opt in g.optionals:
        o = _sub(opt)
        shared = [c for c in acc.columns if c in o.columns]
        acc = acc.join(o, shared, "left_outer") if shared else acc.crossJoin(o)
    for v, col in g.post_binds:
        # BINDs whose expression references OPTIONAL-bound vars defer to
        # here (the parser splits them like filters/post_filters); an
        # OPTIONAL miss flows through as NULL, per SPARQL unbound semantics
        acc = acc.withColumn(v, col)
    for m in g.minus:
        mdf = _sub(m)
        shared = [c for c in acc.columns if c in mdf.columns]
        if shared:
            acc = acc.join(mdf.select(*shared).distinct(), shared, "left_anti")
    # FILTER (NOT) EXISTS: correlated existence on shared vars -> semi/anti
    # join (F7's leftsemi shape; the reference evaluates these as nested
    # pattern groups inside the filter tree, GeneralEvaluation.cpp:2257-2286)
    for e in g.exists:
        edf = _sub(e)
        shared = [c for c in acc.columns if c in edf.columns]
        acc = acc.join(edf.select(*shared).distinct(), shared, "leftsemi") if shared \
            else acc.join(edf.limit(1), F.lit(True), "leftsemi")
    for e in g.not_exists:
        edf = _sub(e)
        shared = [c for c in acc.columns if c in edf.columns]
        acc = acc.join(edf.select(*shared).distinct(), shared, "left_anti") if shared \
            else acc.join(edf.limit(1), F.lit(True), "left_anti")
    for f in g.post_filters:
        acc = acc.filter(_pred(f))
    return acc


def ask(triples: DataFrame, patterns: list[TriplePattern]) -> DataFrame:
    """ASK: existence of any match (the reference's distributed ASK path
    assembles LEC features, Main/gqueryD.cpp:108-265; in Spark existence is
    a LIMIT-1 probe — one row (ask=true) or zero rows)."""
    return (
        match_bgp(triples, patterns)
        .limit(1)
        .select(F.lit(True).alias("ask"))
    )


def modifiers(
    df: DataFrame,
    distinct: bool = False,
    order_by: list[tuple[str, bool]] | None = None,
    limit: int | None = None,
    offset: int | None = None,
) -> DataFrame:
    """DISTINCT / ORDER BY / OFFSET / LIMIT (GeneralEvaluation.cpp:2859-2996;
    external sort + stream drain become Spark's sort + limit)."""
    if distinct:
        df = df.distinct()
    if order_by:
        df = df.orderBy(*[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_by])
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df
