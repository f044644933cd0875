"""Verification BGP matcher over the pipeline's emitted artifacts, with the
reference's two pruning mechanisms re-expressed on DataFrames:

1. **Query-variable signatures** (BasicQuery::encodeBasicQuery,
   Query/BasicQuery.cpp:362-540, updateSubSig/updateObjSig 309-359): each
   query var accumulates bits from its *constant* neighbors and incident
   predicates using the same formulas as the data side — then candidate
   entities are those whose stored signature is a bit-superset
   (VSTree::retrieveEntity, VSTree/VSTree.cpp:1482-1589; driven from
   Strategy::handler0_0, Database/Strategy.cpp:566-586). Here: a
   `covers(sig, qsig)` column filter over the signatures table, semi-joined
   into the BGP join chain.

2. **Partition pruning** (VS*-tree upper levels — parent = OR of children,
   VSTree.cpp:146-219): partitions whose OR-aggregate signature does not
   cover a var's query signature cannot contain a candidate; whole
   adjacency partitions are skipped before any scan.

Like the reference, only vars of degree >= 2 are worth prefiltering
(Strategy.cpp:566-586 retrieves for >=2-degree vars; satellites are cheaper
to resolve during the join).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, functions as F

from gstored_spark.functions.signature import (
    covers,
    edge_bits,
    pack_bits,
    str_bits,
)
from gstored_spark.plans.bgp import TriplePattern, is_var, match_bgp


def query_var_signatures(
    patterns: list[TriplePattern], pred_ids: dict[str, int]
) -> dict[str, list[int]]:
    """var name (no '?') -> packed query signature words.

    Bits: for each pattern where the var is subject — out-edge predicate bit
    + neighbor-string bits of a constant object; where the var is object —
    in-edge predicate bit + neighbor bits of a constant subject. Unknown
    predicates (not in the data dictionary) contribute nothing — exactly the
    encode-time behavior of a var with an unmatchable edge."""
    sigs: dict[str, list[int]] = defaultdict(list)
    for p in patterns:
        pid = pred_ids.get(p.p)
        if p.s.startswith("?"):
            v = p.s[1:]
            if pid is not None:
                sigs[v] += edge_bits(pid, is_out=True)
            if not p.o.startswith("?"):
                sigs[v] += str_bits(p.o)
        if p.o.startswith("?"):
            v = p.o[1:]
            if pid is not None:
                sigs[v] += edge_bits(pid, is_out=False)
            if not p.s.startswith("?"):
                sigs[v] += str_bits(p.s)
    return {v: pack_bits(bits) for v, bits in sigs.items()}


def var_degrees(patterns: list[TriplePattern]) -> dict[str, int]:
    deg: dict[str, int] = defaultdict(int)
    for p in patterns:
        for term in (p.s, p.o):
            if term.startswith("?"):
                deg[term[1:]] += 1
    return deg


def subject_vars(patterns: list[TriplePattern]) -> set[str]:
    """Vars appearing in at least one subject position. Only these can be
    signature-prefiltered: a subject is always an entity, while an
    object-only var may bind *literals*, which have no entry in the entity
    signature table — the reference adds literal candidates outside VS*-tree
    retrieval for exactly this reason (Join::add_literal_candidate,
    Database/Join.cpp:2242-2395)."""
    return {p.s[1:] for p in patterns if p.s.startswith("?")}


def candidate_terms(
    signatures: DataFrame, entity_dict: DataFrame, qsig: list[int]
) -> DataFrame:
    """signatures(v, sig) + entity_dict(term, id) -> candidate IRIs whose
    stored signature covers the query signature (F1)."""
    lit = F.array(*[F.lit(w).cast("long") for w in qsig])
    cand = signatures.filter(covers(F.col("sig"), lit)).select("v")
    return cand.join(
        entity_dict.select(F.col("id").alias("v"), F.col("term")), "v"
    ).select("term")


def pruned_partitions(part_sig: DataFrame, qsig: list[int]) -> DataFrame:
    """part_sig(part, sig) -> parts that MAY contain candidates (VS*-tree
    node-level pruning analog). Partitions not returned are skipped."""
    lit = F.array(*[F.lit(w).cast("long") for w in qsig])
    return part_sig.filter(covers(F.col("sig"), lit)).select("part")


def pruned_buckets(bucket_sig: DataFrame, qsig: list[int]) -> DataFrame:
    """bucket_sig(part, bucket, sig) -> (part, bucket) pairs that MAY
    contain candidates — the VS*-tree inner-level skip (parent=OR of
    children, VSTree/VSTree.cpp:146-219), one level under the root."""
    lit = F.array(*[F.lit(w).cast("long") for w in qsig])
    return bucket_sig.filter(covers(F.col("sig"), lit)).select("part", "bucket")


def prune_groups(
    artifact, qsigs: dict[str, list[int]]
) -> tuple[str, dict[str, dict[int, list[int]]]]:
    """Hierarchical signature-tree pruning for ALL query vars in ONE job
    (round-3 ran one driver round-trip per var — at high parallelism the
    per-job coordination dominated the actual filter work).

    Returns ("bucket", var -> {part: [buckets]}) when the inner level
    exists, else ("part", var -> {part: None}). The query signatures ride
    along as a broadcast literal relation; the (tiny) surviving group list
    is all that returns to the driver."""
    spark = artifact.part_sig.sparkSession
    qdf = spark.createDataFrame(
        [(v, [int(w) for w in s]) for v, s in qsigs.items()],
        "var string, qsig array<long>",
    )
    use_bucket = artifact.bucket_sig is not None and "bucket" in artifact.signatures.columns
    tree = artifact.bucket_sig if use_bucket else artifact.part_sig
    hits = (
        tree.crossJoin(F.broadcast(qdf))
        .filter(covers(F.col("sig"), F.col("qsig")))
        .select("var", "part", *(["bucket"] if use_bucket else []))
        .collect()
    )
    groups: dict[str, dict[int, list[int]]] = {v: {} for v in qsigs}
    for r in hits:
        if use_bucket:
            groups[r["var"]].setdefault(r["part"], []).append(r["bucket"])
        else:
            groups[r["var"]][r["part"]] = None
    return ("bucket" if use_bucket else "part"), groups


def _pruned_scan(artifact, level: str, by_part: dict[int, list[int]]) -> DataFrame:
    """The signature scan restricted to surviving (part[, bucket]) groups —
    both partition columns of the signatures table, so the disjunctive
    filter prunes whole `part=.../bucket=...` directories before any IO
    (the VS*-tree BFS skip, VSTree/VSTree.cpp:1482-1589, re-expressed as
    datasource partition pruning)."""
    if level == "bucket":
        cond = F.lit(False)
        for pt in sorted(by_part):
            cond = cond | ((F.col("part") == pt) & F.col("bucket").isin(by_part[pt]))
        return artifact.signatures.filter(cond)
    return artifact.signatures.filter(F.col("part").isin(sorted(by_part)))


def candidate_terms_pruned(
    artifact, qsig: list[int]
) -> tuple[DataFrame, DataFrame]:
    """Single-var convenience over prune_groups/_pruned_scan (kept for
    tests and callers that prefilter one var). Returns (candidate term DF,
    the pruned signature scan DF — exposed so tests can assert the
    file-level subset)."""
    level, groups = prune_groups(artifact, {"_v": qsig})
    scan = _pruned_scan(artifact, level, groups["_v"])
    lit = F.array(*[F.lit(w).cast("long") for w in qsig])
    cand = scan.filter(covers(F.col("sig"), lit)).select("v").distinct()
    terms = cand.join(
        artifact.entity_dict.select(F.col("id").alias("v"), "term"), "v"
    ).select("term")
    return terms, scan


def _cached_pred_ids(artifact) -> dict[str, int]:
    """term -> predicate id, collected once per artifact handle (predicates
    are few by design — the reference's Signature.h:33-35 assumption)."""
    if getattr(artifact, "_pred_ids_cache", None) is None:
        artifact._pred_ids_cache = {
            r["term"]: r["id"] for r in artifact.pred_dict.collect()
        }
    return artifact._pred_ids_cache


def _cached_pred_stats(artifact) -> dict[int, tuple] | None:
    """pid -> (n, n_s, n_o, n_lit), collected once per artifact handle;
    n_s/n_o/n_lit None for artifacts written before the stat existed
    (None n_lit = "may have literal objects" — the conservative read)."""
    if artifact.pred_stats is None:
        return None
    if getattr(artifact, "_pred_stats_cache", None) is None:
        cols = set(artifact.pred_stats.columns)
        has_fanout = "n_s" in cols
        has_lit = "n_lit" in cols
        artifact._pred_stats_cache = {
            r["pid"]: (r["n"], r["n_s"] if has_fanout else None,
                       r["n_o"] if has_fanout else None,
                       r["n_lit"] if has_lit else None)
            for r in artifact.pred_stats.collect()
        }
    return artifact._pred_stats_cache


def match_over_blocks(
    artifact,
    patterns: list[TriplePattern],
    projection: list[str] | None = None,
    min_degree: int = 2,
    decode: str = "auto",
    sig_skip_small: int = 5_000,
    sig_skip_frac: float = 0.3,
) -> DataFrame:
    """BGP matching that reads the EMITTED artifact, not a flat triple view
    — the analog of the reference answering queries out of its own store
    (KVstore.h:92-237 index probes driven from Join.cpp:1144-1388):

      1. pattern views scan the artifact's physical triple orders — the
         predicate-first table when present (point 6), else the exact bag
         reconstituted from ``explode(out)`` of internal adjacency;
      2. per-var signature candidates are scanned from the artifact's
         signature table with hierarchical (part, bucket) pruning via the
         OR-aggregate signatures (candidate_terms_pruned);
      3. degree-1 subject vars (below the signature threshold) are
         pre-filtered by required out-predicates from the per-vertex
         predicate sets — the satellite filter (F4,
         Join::filterBySatellites, Join.cpp:2419-2700);
      4. candidates semi-join into the leaf pattern views of the join tree
         (match_bgp), shrinking every downstream shuffle;
      5. join order follows the persisted p2num stats when present
         (Join.cpp:71-77 cardinality score) — no caller opt-in needed;
      6. constant-predicate patterns scan the PREDICATE-FIRST physical
         order (triples_by_pred/, the p2s/p2o analog of
         KVstore.h:265-293 dispatched by Strategy.cpp:272-362):
         `pbucket=` directory pruning + the pushed `p = const` parquet
         filter replace exploding the whole adjacency store — the single
         biggest 100x-scale lever for the common ``?s <p> ?o`` shape;
      7. the signature prefilter for a var is SKIPPED when pred_stats says
         it cannot pay: the var's smallest incident leaf is already under
         ``sig_skip_small`` rows, or its estimated candidate count (from
         the per-predicate distinct-endpoint fanout stats) exceeds
         ``sig_skip_frac`` of all vertices (an unselective signature scans
         the whole table to prune nothing).

    Decode placements (same dictionary joins, different position):
      - ``decode="triples"``: ids decoded before matching — bulk analytics;
      - ``decode="ids"``: constants encoded to ids, matching runs entirely
        on long columns, and only the RESULT columns are decoded — the
        reference's placement (StringIndex at result time, P3,
        GeneralEvaluation.cpp:2939-2970);
      - ``decode="auto"`` (default): id mode unless some var spans the
        predicate and subject/object positions — predicate ids live in
        their own dense-from-0 namespace overlapping entity ids, so a
        mixed-position var cannot be decoded from one dictionary (such
        shapes use the string-level path).
    All placements return identical string bindings (asserted in tests).
    """
    from gstored_spark.kg.blocks import triples_from_adjacency, vertex_predicate_sets
    from gstored_spark.kg.ids import decode_ids
    from gstored_spark.kg.link import maybe_broadcast

    pred_ids = _cached_pred_ids(artifact)
    qsigs = query_var_signatures(patterns, pred_ids)
    degrees = var_degrees(patterns)
    entity_only = subject_vars(patterns)
    stats = _cached_pred_stats(artifact)

    var_positions: dict[str, set] = {}
    for p in patterns:
        for role, t in (("s", p.s), ("p", p.p), ("o", p.o)):
            if is_var(t):
                var_positions.setdefault(t[1:], set()).add(role)
    mixed = any("p" in r and r != {"p"} for r in var_positions.values())
    if decode == "auto":
        decode = "triples" if mixed else "ids"
    elif decode == "ids" and mixed:
        decode = "triples"  # id-decode would be wrong for mixed-position vars
    id_mode = decode == "ids"

    def _sig_worth_it(v: str) -> bool:
        """Prefilter pays only between three regimes (pred_stats-informed):
        leaves already tiny -> the semi-join costs more than it saves;
        candidate estimate ~ all vertices -> the scan prunes nothing;
        otherwise weigh ESTIMATED ROWS PRUNED from the incident leaves
        against the cost of the signature scan (~one row per vertex). A
        constant neighbor contributes string bits the stats cannot model —
        genuinely selective, always worth it (past the tiny-leaf floor)."""
        if stats is None:
            return True
        leaves, cand_ests, has_const = [], [], False
        for p in patterns:
            if p.s != "?" + v and p.o != "?" + v:
                continue
            if is_var(p.p):
                return True  # no stats for a var predicate: keep prefilter
            n, n_s, n_o = stats.get(pred_ids.get(p.p), (0, None, None))[:3]
            if p.s == "?" + v:
                d = n_s
                has_const = has_const or not is_var(p.o)
            else:
                d = n_o
                has_const = has_const or not is_var(p.s)
            leaves.append((n, d))
            cand_ests.append(d)
        if leaves and min(n for n, _ in leaves) <= sig_skip_small:
            return False
        if has_const:
            return True
        nv = artifact.meta.get("n_vertices")
        ests = [e for e in cand_ests if e is not None]
        if not nv or not ests:
            return True
        est = min(ests)  # candidate upper bound: smallest incident fanout
        if est >= sig_skip_frac * nv:
            return False
        # benefit = rows the candidate semi-join removes from each leaf,
        # assuming endpoint values are uniformly hit (Join.cpp:71-77 uses
        # the same per-predicate counts for its score)
        benefit = sum(n * max(0.0, 1.0 - est / d) for n, d in leaves if d)
        return benefit >= nv

    sig_vars = {
        v: qsig
        for v, qsig in qsigs.items()
        if degrees.get(v, 0) >= min_degree and v in entity_only and _sig_worth_it(v)
    }
    candidates = {}
    if sig_vars:
        # ONE pruning job for every prefiltered var (round-3 paid one
        # driver round-trip per var)
        level, groups = prune_groups(artifact, sig_vars)
        for v, qsig in sig_vars.items():
            scan = _pruned_scan(artifact, level, groups[v])
            lit = F.array(*[F.lit(w).cast("long") for w in qsig])
            cand = scan.filter(covers(F.col("sig"), lit)).select("v").distinct()
            candidates[v] = cand.toDF("id") if id_mode else cand.join(
                artifact.entity_dict.select(F.col("id").alias("v"), "term"), "v"
            ).select("term")

    # F4 satellite pre-filter: subject vars the signature path skipped but
    # that must carry specific out-predicates — reads the PERSISTED s2p/o2p
    # table (KVstore.h:265-293) when the artifact has one; deriving it from
    # the full adjacency store per query (the round-3 shape) made the
    # prefilter itself a full scan
    sat_out: dict[str, set[int]] = {}
    sat_in: dict[str, set[int]] = {}
    svars = {p.s[1:] for p in patterns if is_var(p.s)}

    def _entity_guaranteed(v: str) -> bool:
        """o2p is only sound when v's bindings are certainly ENTITIES —
        literals have no vertex_preds row, so in_preds pruning would drop
        literal solutions (the F5 rationale, Join.cpp:2242-2395). True
        when v also binds in subject position, or when SOME incident
        constant predicate measurably never takes literal objects
        (pred_stats n_lit = 0): one literal-free leaf forces every
        solution's v to an entity."""
        if v in svars:
            return True
        if stats is None:
            return False
        for p in patterns:
            if p.o == "?" + v and not is_var(p.p):
                st = stats.get(pred_ids.get(p.p))
                if st is not None and len(st) > 3 and st[3] == 0:
                    return True
        return False

    for p in patterns:
        if not is_var(p.p):
            pid = pred_ids.get(p.p)
            if pid is None:
                continue
            if is_var(p.s) and p.s[1:] not in candidates:
                sat_out.setdefault(p.s[1:], set()).add(pid)
            # o2p half (Join::filterBySatellites checks BOTH directions,
            # Join.cpp:2419-2700): an object-position var must carry the
            # constant predicate among its in-preds
            if (
                is_var(p.o)
                and p.o[1:] not in candidates
                and _entity_guaranteed(p.o[1:])
            ):
                sat_in.setdefault(p.o[1:], set()).add(pid)

    def _sat_worth_it(v: str, out_pids: set[int], in_pids: set[int]) -> bool:
        """The satellite candidate set is `vertices carrying ALL of
        out_pids among out-preds AND ALL of in_pids among in-preds`. A
        leaf `?v <q> ?o` (resp. `?s <q> ?v`) that itself contributed q is
        already exactly that restriction for q — a requirement set that
        only ever meets its own contributing leaves is a TAUTOLOGY (pure
        cost). It is informative when the combined requirement count >= 2
        (each leaf pruned by the others' predicates) or when v is bound by
        some non-contributing leaf (var predicate). Past that, skip when
        the stats say the candidate set is ~all vertices anyway (the
        round-3 profile: requiring a predicate 87% of vertices carry
        filtered nothing and cost a full vertex_preds scan). Out-direction
        selectivity estimates from n_s (distinct subjects of p), in-
        direction from n_o (distinct objects) — the subIDpreID2num /
        objIDpreID2num split."""
        contrib = sum(
            1 for p in patterns if not is_var(p.p) and (
                (p.s == "?" + v and pred_ids.get(p.p) in out_pids)
                or (p.o == "?" + v and pred_ids.get(p.p) in in_pids)
            )
        )
        binding = sum(1 for p in patterns if "?" + v in (p.s, p.o))
        if len(out_pids) + len(in_pids) < 2 and binding <= contrib:
            return False
        if stats is not None:
            nv = artifact.meta.get("n_vertices")
            ests = [stats.get(pid, (0, None, None))[1] for pid in out_pids]
            ests += [stats.get(pid, (0, None, None))[2] for pid in in_pids]
            ests = [e for e in ests if e is not None]
            if nv and ests and min(ests) >= sig_skip_frac * nv:
                return False
        return True

    sat_vars = {
        v for v in set(sat_out) | set(sat_in)
        if _sat_worth_it(v, sat_out.get(v, set()), sat_in.get(v, set()))
    }
    if sat_vars:
        psets = artifact.vertex_preds
        if psets is None:
            psets = vertex_predicate_sets(artifact.adjacency.filter("is_internal"))
        for v in sat_vars:
            cond = F.lit(True)
            for pid in sorted(sat_out.get(v, set())):
                cond = cond & F.array_contains(
                    "out_preds", F.lit(int(pid)).cast("long")
                )
            for pid in sorted(sat_in.get(v, set())):
                cond = cond & F.array_contains(
                    "in_preds", F.lit(int(pid)).cast("long")
                )
            cand_v = psets.filter(cond).select("v").distinct()
            candidates[v] = cand_v if id_mode else cand_v.join(
                artifact.entity_dict.withColumnRenamed("id", "v"), "v"
            ).select("term")

    # default cardinality-based ordering from the persisted p2num stats
    pred_counts = None
    if stats is not None:
        pred_counts = stats if id_mode else {
            t: stats.get(i, (0, None, None)) for t, i in pred_ids.items()
        }

    # physical access paths: the predicate-first table when the artifact
    # has one (full bag = every pbucket; constant-predicate patterns are
    # routed to their bucket below), else adjacency-explode reconstitution
    tbp = artifact.triples_by_pred
    if tbp is not None:
        ids = tbp.select("s", "p", "o")
    else:
        ids = triples_from_adjacency(artifact.adjacency)
    # dictionaries are broadcast when actually small (adaptive — at web
    # scale the term dictionary outgrows the hint and shuffle-joins instead)
    term_dict = maybe_broadcast(artifact.entity_dict.unionByName(artifact.literal_dict))
    pred_dict = F.broadcast(artifact.pred_dict)  # predicates are few by design

    def _routed_id_source(pat: TriplePattern) -> DataFrame:
        """Leaf access-path dispatch (Strategy.cpp:272-362): a constant
        predicate scans only its pbucket= directory with the p filter
        pushed to parquet row-group stats."""
        if tbp is not None and not is_var(pat.p):
            pid = int(pat.p) if id_mode else pred_ids.get(pat.p, -1)
            k = artifact.pred_buckets
            return tbp.filter(
                (F.col("pbucket") == pid % k) & (F.col("p") == pid)
            ).select("s", "p", "o")
        return ids

    if id_mode:
        # encode pattern constants driver-side (tiny isin collects); an
        # unknown constant matches nothing, exactly like a dictionary miss
        consts = {t for p in patterns for t in (p.s, p.o) if not is_var(t)}
        cmap = {
            r["term"]: r["id"]
            for r in term_dict.filter(F.col("term").isin(list(consts))).collect()
        } if consts else {}
        pconsts = {t for p in patterns if not is_var(p.p) for t in [p.p]}
        missing = (consts - set(cmap)) | {p for p in pconsts if p not in pred_ids}

        def enc(term, table):
            return term if is_var(term) else table.get(term, -1)

        id_pats = [
            TriplePattern(enc(p.s, cmap), enc(p.p, pred_ids), enc(p.o, cmap))
            for p in patterns
        ]
        bindings = match_bgp(
            ids.toDF("subj", "pred", "obj"), id_pats,
            candidates=candidates, pred_counts=pred_counts,
            triples_for=(lambda pat: _routed_id_source(pat).toDF("subj", "pred", "obj"))
            if tbp is not None else None,
        )
        if missing:
            bindings = bindings.limit(0)
        # decode only the projected result columns (StringIndex placement)
        out_vars = [v.lstrip("?") for v in projection] if projection else bindings.columns
        decoded = bindings
        for v in out_vars:
            dic = pred_dict if var_positions.get(v) == {"p"} else term_dict
            decoded = decoded.withColumnRenamed(v, f"_{v}_id")
            decoded = decoded.join(
                dic.select(F.col("id").alias(f"_{v}_id"), F.col("term").alias(v)),
                f"_{v}_id",
            ).drop(f"_{v}_id")
        return decoded.select(*out_vars)

    def _decoded(src: DataFrame) -> DataFrame:
        t = decode_ids(src, "s", term_dict, "subj")
        t = decode_ids(t, "p", pred_dict, "pred")
        t = decode_ids(t, "o", term_dict, "obj")
        return t.select("subj", "pred", "obj")

    return match_bgp(
        _decoded(ids), patterns, projection=projection,
        candidates=candidates, pred_counts=pred_counts,
        triples_for=(lambda pat: _decoded(_routed_id_source(pat)))
        if tbp is not None else None,
    )


def ask_over_blocks(artifact, patterns: list[TriplePattern]) -> DataFrame:
    """ASK answered FROM THE EMITTED ARTIFACT — the reference's flagship
    distributed query path ends in ASK (Main/gqueryD.cpp:108-265): the full
    store-backed machinery (signature pruning, predicate-first routing,
    p2num ordering) runs under a LIMIT-1 existence probe, which Spark
    terminates early once any partition produces a row. Returns one row
    (ask=true) or zero rows, the same shape as plans.bgp.ask."""
    probe = match_over_blocks(artifact, patterns)
    return probe.limit(1).select(F.lit(True).alias("ask"))


def _local_bag(artifact) -> DataFrame:
    """Every partition's LOCAL triple bag — all out-edges of its vertices
    including crossing replicas, exactly what gloadD routing placed there
    (gloadD.cpp:118-153) — decoded to strings, keyed by (part,
    center_internal, subj, pred, obj)."""
    from gstored_spark.kg.ids import decode_ids
    from gstored_spark.kg.link import maybe_broadcast

    term_dict = maybe_broadcast(
        artifact.entity_dict.unionByName(artifact.literal_dict)
    )
    local = artifact.adjacency.select(
        "part",
        F.col("is_internal").alias("center_internal"),
        F.col("v").alias("s"),
        F.explode("out").alias("e"),
    ).select(
        "part", "center_internal", "s",
        F.col("e.p").alias("p"), F.col("e.o").alias("o"),
    )
    t = decode_ids(local, "s", term_dict, "subj")
    t = decode_ids(t, "p", F.broadcast(artifact.pred_dict), "pred")
    t = decode_ids(t, "o", term_dict, "obj")
    return t


def match_partitioned(
    artifact,
    patterns: list[TriplePattern],
    projection: list[str] | None = None,
) -> DataFrame:
    """Partial-evaluation-and-assembly parity with the flagship gqueryD
    lifecycle (SURVEY §3.1, Main/gqueryD.cpp:405-440): every partition
    answers each triple pattern over its OWN local blocks — all vertices of
    the partition including crossing replicas, the local bag gloadD routing
    produced (gloadD.cpp:118-153) — then the per-pattern local match sets
    are unioned across partitions, deduped (the master's URIIDMap remap
    step, gqueryD.cpp:268-359), and reassembled by iterative hash joins in
    greedy order (Util::HashJoin_old, Util/Util.cpp:1777-1858).

    Star BGPs short-circuit (Database.cpp:661-671, QueryTree.cpp:559-582):
    under crossing-edge replication a star match is complete inside the
    center's owner partition, so per-partition matches over INTERNAL
    centers union disjointly — no cross-partition dedupe, no assembly.

    Result-equal to match_over_blocks (asserted in tests and by the
    bgp_assembly driver oracle).
    """
    from gstored_spark.plans.bgp import _pattern_df, greedy_order, is_star, is_var

    t = _local_bag(artifact)

    # The star short-circuit is only sound for HASH-ROUTED artifacts: there
    # every vertex has exactly one internal owner and crossing-edge
    # replication makes its local star complete (Database.cpp:661-671).
    # Built with a PARTIAL partition map, an unmapped vertex is internal
    # nowhere and its out-edges scatter (mapped-object edges live only in
    # the object's partition, gloadD.cpp:148-152) — NO partition holds its
    # complete star, so such artifacts take the general assembly path,
    # which evaluates patterns over the union of local bags and dedupes.
    if is_star(patterns) and getattr(artifact, "hash_routed", True):
        # star short-circuit: join per partition, internal centers only
        src = t.filter("center_internal").select("part", "subj", "pred", "obj")
        acc, acc_vars = None, set()
        for idx in greedy_order(patterns):
            pat = patterns[idx]
            df = src
            cols = [F.col("part")]
            for role, term in (("subj", pat.s), ("pred", pat.p), ("obj", pat.o)):
                if is_var(term):
                    cols.append(F.col(role).alias(term[1:]))
                else:
                    df = df.filter(F.col(role) == term)
            pdf = df.select(*cols)
            pvars = {v[1:] for v in pat.vars()}
            if acc is None:
                acc, acc_vars = pdf, pvars
            else:
                acc = acc.join(pdf, ["part"] + sorted(acc_vars & pvars), "inner")
                acc_vars |= pvars
        out = acc.drop("part")
    else:
        bag = t.select("subj", "pred", "obj")
        acc, acc_vars = None, set()
        for idx in greedy_order(patterns):
            # LOCAL partial match for this pattern (evaluated inside every
            # partition's bag), then cross-partition dedupe: a crossing
            # triple lives in exactly two partitions and must contribute
            # one solution (set-semantics store)
            pdf, pvars = _pattern_df(bag, patterns[idx], idx)
            pdf = pdf.distinct()
            if acc is None:
                acc, acc_vars = pdf, pvars
                continue
            shared = [v[1:] for v in (acc_vars & pvars)]
            acc = acc.join(pdf, shared, "inner") if shared else acc.crossJoin(pdf)
            acc_vars |= pvars
        out = acc
        drop = [c for c in out.columns if c.startswith("_const_")]
        if drop:
            out = out.drop(*drop)
    if projection:
        out = out.select(*[v.lstrip("?") for v in projection])
    return out


def ask_partitioned(artifact, patterns: list[TriplePattern]) -> DataFrame:
    """ASK via the LEC-feature assembly — the reference's ASK-specific
    distributed join (Util::HashLECFJoin, Util/Util.cpp:1560-1690, driven
    from the gqueryD lifecycle, Main/gqueryD.cpp:108-265).

    For a boolean answer the master never needs full local matches: each
    fragment ships only each local match's FEATURE — its projection onto
    the assembly interface. In the reference that interface is the
    crossing-edge mapping vector (``mapping_str`` per crossing edge) plus
    the merged ``matchVec`` where locally-unbound vars hold ``"-1"`` and
    merge by agreement (isFinalResult/merge loop, Util.cpp:1465-1558); the
    DataFrame analog of that interface is the set of vars a pattern SHARES
    with the rest of the query — the only columns any assembly join ever
    keys on. Features are deduplicated before shipping (the reference's
    ``edge_LECF_map`` bucketing dedupes per crossing-edge value) and joined
    exactly like matches; projecting a relation onto a superset of its
    future join keys preserves existence, so the assembled feature relation
    is non-empty iff the full assembled match relation is. The probe
    terminates at the first assembled row (LIMIT 1 — Spark stops the scan
    early), where the reference stops at the first ``isFinalResult`` hit.

    Shape at scale: every shipped relation is ``distinct(interface vars)``
    — bounded by distinct interface-value combinations, not by match
    multiplicity; patterns private vars never enter a shuffle. Returns one
    row (ask=true) or zero rows, the same shape as plans.bgp.ask.
    """
    from gstored_spark.plans.bgp import _pattern_df, greedy_order

    bag = _local_bag(artifact).select("subj", "pred", "obj")
    var_count: dict[str, int] = defaultdict(int)
    for p in patterns:
        for v in p.vars():
            var_count[v] += 1

    acc, acc_vars = None, set()
    nonempty_probes = []
    for idx in greedy_order(patterns):
        pdf, pvars = _pattern_df(bag, patterns[idx], idx)
        interface = {v for v in pvars if var_count[v] > 1}
        if interface:
            # the pattern's LEC feature: interface projection, deduped
            feat = pdf.select(*[v[1:] for v in sorted(interface)]).distinct()
        else:
            # no shared vars: the pattern only contributes an existence bit
            nonempty_probes.append(pdf.limit(1).select(F.lit(1).alias(f"_nz_{idx}")))
            continue
        if acc is None:
            acc, acc_vars = feat, interface
            continue
        shared = [v[1:] for v in (acc_vars & interface)]
        acc = acc.join(feat, shared, "inner") if shared else acc.crossJoin(feat)
        acc_vars |= interface
    for probe in nonempty_probes:
        acc = probe if acc is None else acc.crossJoin(probe)
    return acc.limit(1).select(F.lit(True).alias("ask"))


def eval_group_partitioned(artifact, g) -> DataFrame:
    """Group-graph-pattern algebra where every LEAF BGP is answered by the
    PE-and-assembly matcher (match_partitioned) instead of a flat triple
    view — OPTIONAL/UNION/MINUS/FILTER compose over assembled local-match
    sets with the same TempResult combinators the reference's stack machine
    applies (GeneralEvaluation.cpp:2067-2288: doOptional 1217-1269, doUnion
    1202-1216, doMinus 1270-1307). The distributed lifecycle
    (gqueryD.cpp:405-440) evaluates leaf BGPs per fragment and assembles;
    group operators then act on assembled relations at the master — which
    is exactly a left_outer/union/left_anti between two assembled
    DataFrames here. Result-equal to eval_group over the flat view
    (asserted in tests and the bgp_optional_assembly driver oracle)."""
    from gstored_spark.plans.bgp import eval_group

    return eval_group(
        None, g, bgp_eval=lambda pats: match_partitioned(artifact, pats)
    )


def match_with_signatures(
    triples: DataFrame,
    signatures: DataFrame,
    entity_dict: DataFrame,
    pred_dict: DataFrame,
    patterns: list[TriplePattern],
    projection: list[str] | None = None,
    min_degree: int = 2,
) -> DataFrame:
    """BGP match with signature-prefiltered candidate semi-joins.

    Semantically identical to plans.bgp.match_bgp; the prefilter only
    shrinks the join inputs (signature containment is a necessary
    condition for a var binding — Signature/SigEntry.h:31-32)."""
    pred_ids = {r["term"]: r["id"] for r in pred_dict.collect()}
    qsigs = query_var_signatures(patterns, pred_ids)
    degrees = var_degrees(patterns)
    entity_only = subject_vars(patterns)
    candidates = {
        v: candidate_terms(signatures, entity_dict, qsig)
        for v, qsig in qsigs.items()
        if degrees.get(v, 0) >= min_degree and v in entity_only
    }
    return match_bgp(triples, patterns, projection=projection, candidates=candidates)


def path_pattern_over_blocks(artifact, s_term, path, o_term, idx: int = 0):
    """SPARQL 1.1 path pattern answered FROM THE STORE at ID LEVEL — the
    scale placement: Link edges scan only their pbucket= directory (the
    predicate-first p2s/p2o order), closures iterate over LONG id pairs
    (whole-stage-codegen joins, no string hashing), and only the RESULT
    endpoint columns decode through the dictionary (StringIndex placement,
    GeneralEvaluation.cpp:2939-2970). Decoding the whole triple bag first
    — the naive placement — pays three dictionary joins over every stored
    triple before the path even starts.

    Path AST predicate IRIs translate to ids driver-side (the predicate
    dictionary is tiny and cached); endpoint constants encode via a
    bounded dictionary probe; an unknown IRI/term maps to -1 and matches
    nothing, exactly like a dictionary miss in the BGP path (this includes
    the zero-length `<off-graph> <p>* ?o` self-match the flat-view
    evaluator preserves — a term absent from the store's dictionary has no
    id to bind)."""
    from gstored_spark.plans import paths as PP
    from gstored_spark.plans.bgp import is_var

    pred_ids = _cached_pred_ids(artifact)

    def translate(p):
        if isinstance(p, PP.Link):
            return PP.Link(pred_ids.get(p.iri, -1))
        if isinstance(p, PP.Inv):
            return PP.Inv(translate(p.path))
        if isinstance(p, PP.Seq):
            return PP.Seq(tuple(translate(x) for x in p.parts))
        if isinstance(p, PP.Alt):
            return PP.Alt(tuple(translate(x) for x in p.parts))
        if isinstance(p, PP.Repeat):
            return PP.Repeat(translate(p.path), p.op)
        if isinstance(p, PP.Neg):
            return PP.Neg(
                tuple(pred_ids.get(i, -1) for i in p.forward),
                tuple(pred_ids.get(i, -1) for i in p.inverse),
            )
        raise ValueError(f"unknown path node {p!r}")

    from gstored_spark.kg.blocks import triples_from_adjacency

    tbp = artifact.triples_by_pred
    ids = (
        tbp.select("s", "p", "o")
        if tbp is not None
        else triples_from_adjacency(artifact.adjacency)
    )
    id_view = ids.toDF("subj", "pred", "obj")

    link_edges = None
    if tbp is not None:
        k = artifact.pred_buckets

        def link_edges(pid):
            # atomic Link access path: pbucket= directory pruning + pushed
            # p filter (the p2s/p2o probe), not a full-view scan
            return tbp.filter(
                (F.col("pbucket") == pid % k) & (F.col("p") == pid)
            ).select("s", "o")

    term_dict = artifact.entity_dict.unionByName(artifact.literal_dict)
    consts = [t for t in (s_term, o_term) if not is_var(t)]
    cmap = (
        {
            r["term"]: r["id"]
            for r in term_dict.filter(F.col("term").isin(consts)).collect()
        }
        if consts
        else {}
    )

    # Distinct off-dictionary constants must encode to DISTINCT sentinels:
    # with a shared -1, `<unknownA> <p>* <unknownB>` (both absent, different
    # terms) would take the seeded zero-length fast path and self-match —
    # the flat-view evaluator (and the spec) return no match. Equal strings
    # share one sentinel so the genuine zero-length self-match survives.
    _missing: dict = {}

    def enc(term):
        if is_var(term):
            return term
        if term in cmap:
            return cmap[term]
        if term not in _missing:
            _missing[term] = -1 - len(_missing)
        return _missing[term]

    bindings = PP.eval_path_pattern(
        id_view, enc(s_term), translate(path), enc(o_term), idx=idx,
        link_edges=link_edges,
    )
    from gstored_spark.kg.ids import decode_ids

    out_vars = [c for c in bindings.columns if not c.startswith("_const_")]
    decoded = bindings
    for v in out_vars:
        decoded = decode_ids(
            decoded.withColumnRenamed(v, f"_{v}_id"), f"_{v}_id", term_dict, v
        ).drop(f"_{v}_id")
    return decoded.select(*bindings.columns)
