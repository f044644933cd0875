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


def candidate_terms_pruned(
    artifact, qsig: list[int]
) -> tuple[DataFrame, DataFrame]:
    """Candidate IRIs from the on-disk artifact with PARTITION PRUNING:
    partitions whose OR-signature does not cover the query signature are
    never scanned — `part` is a parquet partition column, so the
    `part IN (...)` filter prunes whole `part=` directories before any IO
    (the VS*-tree upper-level skip, VSTree/VSTree.cpp:1482-1589, re-expressed
    as datasource partition pruning).

    Returns (candidate term DF, the pruned signature scan DF — exposed so
    tests can assert the file-level subset)."""
    keep = [r["part"] for r in pruned_partitions(artifact.part_sig, qsig).collect()]
    lit = F.array(*[F.lit(w).cast("long") for w in qsig])
    scan = artifact.signatures.filter(F.col("part").isin(keep))
    cand = scan.filter(covers(F.col("sig"), lit)).select("v").distinct()
    terms = cand.join(
        artifact.entity_dict.select(F.col("id").alias("v"), "term"), "v"
    ).select("term")
    return terms, scan


def match_over_blocks(
    artifact,
    patterns: list[TriplePattern],
    projection: list[str] | None = None,
    min_degree: int = 2,
    decode: str = "triples",
) -> DataFrame:
    """BGP matching that reads the EMITTED artifact, not a flat triple view
    — the analog of the reference answering queries out of its own store
    (KVstore.h:92-237 index probes driven from Join.cpp:1144-1388):

      1. pattern views are reconstituted from ``explode(out)`` of the
         adjacency blocks (internal vertices only — exact triple bag);
      2. per-var signature candidates are scanned from the artifact's
         signature table with whole-partition pruning via the OR-aggregate
         partition signatures (candidate_terms_pruned);
      3. candidates semi-join into the leaf pattern views of the join tree
         (match_bgp), shrinking every downstream shuffle.

    Two decode placements (same dictionary joins, different position):
      - ``decode="triples"``: ids decoded before matching — best when
        results are large relative to the store (bulk analytics);
      - ``decode="ids"``: constants encoded to ids, matching runs entirely
        on long columns, and only the RESULT columns are decoded — the
        reference's placement (StringIndex at result time, P3,
        GeneralEvaluation.cpp:2939-2970), best for selective queries.
    Both return identical string bindings (asserted in tests).
    """
    from gstored_spark.kg.blocks import triples_from_adjacency
    from gstored_spark.kg.ids import decode_ids

    pred_ids = {r["term"]: r["id"] for r in artifact.pred_dict.collect()}
    qsigs = query_var_signatures(patterns, pred_ids)
    degrees = var_degrees(patterns)
    entity_only = subject_vars(patterns)
    id_mode = decode == "ids"
    candidates = {}
    for v, qsig in qsigs.items():
        if degrees.get(v, 0) >= min_degree and v in entity_only:
            terms, _ = candidate_terms_pruned(artifact, qsig)
            candidates[v] = terms.join(
                artifact.entity_dict, "term"
            ).select("id") if id_mode else terms

    ids = triples_from_adjacency(artifact.adjacency)
    term_dict = artifact.entity_dict.unionByName(artifact.literal_dict)

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
        bindings = match_bgp(ids.toDF("subj", "pred", "obj"), id_pats,
                             candidates=candidates)
        if missing:
            bindings = bindings.limit(0)
        # decode only the projected result columns (StringIndex placement)
        out_vars = [v.lstrip("?") for v in projection] if projection else bindings.columns
        decoded = bindings
        var_positions = {}
        for p in patterns:
            for role, t in (("s", p.s), ("p", p.p), ("o", p.o)):
                if is_var(t):
                    var_positions.setdefault(t[1:], set()).add(role)
        for v in out_vars:
            dic = artifact.pred_dict if var_positions.get(v) == {"p"} else term_dict
            decoded = decoded.withColumnRenamed(v, f"_{v}_id")
            decoded = decoded.join(
                dic.select(F.col("id").alias(f"_{v}_id"), F.col("term").alias(v)),
                f"_{v}_id",
            ).drop(f"_{v}_id")
        return decoded.select(*out_vars)

    t = decode_ids(ids, "s", term_dict, "subj")
    t = decode_ids(t, "p", artifact.pred_dict, "pred")
    t = decode_ids(t, "o", term_dict, "obj")
    triples = t.select("subj", "pred", "obj")
    return match_bgp(triples, patterns, projection=projection, candidates=candidates)


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
