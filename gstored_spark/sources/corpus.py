"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §A).

Emits the exact ``input_hint`` table shape:
    documents(url string, warc_ts timestamp, html binary, text string,
              lang string)
plus the ground-truth ``gold_triples(subj, pred, obj, o_is_entity, url)``
used for P/R >= 0.95 scoring, and the planted ``alias_map`` that makes the
LSH + connected-components canonicalization stage exactly checkable.

Generation is a pure function of the row index (seeded ``random.Random`` on a
string key, which hashes via sha512 and is therefore stable across processes
and PYTHONHASHSEED), so the corpus is identical at any parallelism level and
can be generated *distributedly* with ``mapInPandas`` over ``spark.range`` —
no driver-side materialization, which is what makes the same generator usable
at bench scale.

Relation vocabulary mirrors the reference's worked example
(/root/reference/example/dbpedia_example_distgStore.n3: director, starring,
spouse, name, birthPlace).
"""

from __future__ import annotations

import datetime as _dt
import random
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED = 42
EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

GOLD_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("o_is_entity", T.BooleanType()),
        T.StructField("url", T.StringType()),
    ]
)

# -- entity name machinery ---------------------------------------------------

_SYL1 = ["bor", "quin", "mar", "tel", "vash", "ren", "dol", "fir", "gal", "hes",
         "jor", "kel", "lum", "ned", "pol", "rag", "sev", "tum", "ulf", "wex"]
_SYL2 = ["ath", "el", "ion", "ara", "une", "ost", "ilda", "emor", "uvia", "ack"]
_CITY = ["Velcaster", "Mornholt", "Quillbay", "Sarden Falls", "Tellmouth",
         "Ravensport", "Ilderton", "Noxbridge", "Ferngate", "Ostwick"]


def person_name(k: int) -> str:
    r = random.Random(f"person:{SEED}:{k}")
    first = (r.choice(_SYL1) + r.choice(_SYL2)).capitalize()
    last = (r.choice(_SYL1) + r.choice(_SYL2)).capitalize()
    return f"{first} {last} {k:04d}"


def film_name(k: int) -> str:
    r = random.Random(f"film:{SEED}:{k}")
    a = (r.choice(_SYL1) + r.choice(_SYL2)).capitalize()
    b = (r.choice(_SYL1) + r.choice(_SYL2)).capitalize()
    return f"The {a} {b} {k:04d}"


def city_name(k: int) -> str:
    return _CITY[k % len(_CITY)]


def normalize_mention(m: str) -> str:
    """Full normalization used for canonical-slug selection: lowercase, strip
    punctuation, drop single-letter middle tokens (initials), collapse
    whitespace."""
    s = m.lower()
    s = re.sub(r"[.\-'’,]", " ", s)
    toks = [t for t in s.split() if len(t) > 1 or t.isdigit()]
    return " ".join(toks)


def normalize_mention_col(c) -> "F.Column":
    """Column twin of normalize_mention — pure built-ins (lower, regexp,
    higher-order filter), bit-identical output (asserted in tests). Keeps
    the canonicalization stage free of Python workers."""
    s = F.regexp_replace(F.lower(c), r"[.\-'’,]", " ")
    toks = F.split(F.trim(F.regexp_replace(s, r"\s+", " ")), " ")
    kept = F.filter(toks, lambda t: (F.length(t) > 1) | t.rlike("^[0-9]+$"))
    return F.array_join(kept, " ")


def entity_iri(canonical_name: str) -> str:
    return "<ent:" + normalize_mention(canonical_name).replace(" ", "_") + ">"


def alias_variants(name: str) -> list[str]:
    """1-4 planted lexical variants per entity (FIXTURES.md §A2): casefold,
    middle-initial insertion, hyphenation. All normalize back to the
    canonical form; the pipeline must rediscover that via LSH + CC."""
    toks = name.split()
    out = [name, name.lower()]
    if len(toks) >= 2:
        r = random.Random(f"alias:{SEED}:{name}")
        initial = chr(ord("A") + r.randrange(26))
        out.append(" ".join([toks[0], f"{initial}."] + toks[1:]))
        out.append("-".join(toks))
    return out


# -- per-document generation --------------------------------------------------

PRED_DIRECTOR = "<rel:director>"
PRED_STARRING = "<rel:starring>"
PRED_SPOUSE = "<rel:spouse>"
PRED_NAME = "<rel:name>"
PRED_BIRTHPLACE = "<rel:birthPlace>"

_NOISE_DE = ("und der die das ein eine mit von zu auf unter "
             "immer wieder gestern morgen heute").split()
_NOISE_FR = ("le la les un une des avec pour dans sur sous "
             "toujours hier demain aujourd'hui").split()


def _pick_variant(r: random.Random, name: str) -> str:
    return r.choice(alias_variants(name))


def doc_record(i: int, n_entities: int) -> tuple[dict, list[dict]]:
    """Generate one document + its gold triples. Pure function of (i,
    n_entities)."""
    r = random.Random(f"doc:{SEED}:{i}")
    url = f"https://host{i % 97}.example.com/page/{i}"
    ts = EPOCH + _dt.timedelta(seconds=137 * i)
    lang = "en" if i % 10 != 9 else ("de" if i % 20 == 9 else "fr")

    sentences: list[str] = []
    gold: list[dict] = []

    def emit(subj_name, pred, obj_name, obj_is_entity, sentence):
        sentences.append(sentence)
        if lang == "en":
            obj = entity_iri(obj_name) if obj_is_entity else f'"{obj_name}"@en'
            gold.append(
                dict(subj=entity_iri(subj_name), pred=pred, obj=obj,
                     o_is_entity=obj_is_entity, url=url)
            )

    if lang == "en":
        if i % 13 == 0:
            # planted worked-example motif (triangle + snowflake guaranteed):
            # film f stars a, f directed by d, d spouse of a, names for all
            # (mirrors example/query.txt / query_2.txt shapes)
            k = (i // 13) % max(n_entities - 1, 1)
            f, d, a = film_name(k), person_name(k), person_name(k + 1)
            emit(f, PRED_STARRING, a, True,
                 f"{_pick_variant(r, f)} starred {_pick_variant(r, a)}.")
            emit(f, PRED_DIRECTOR, d, True,
                 f"{_pick_variant(r, f)} was directed by {_pick_variant(r, d)}.")
            emit(a, PRED_SPOUSE, d, True,
                 f"{_pick_variant(r, a)} is the spouse of {_pick_variant(r, d)}.")
            emit(f, PRED_NAME, f, False, f'{_pick_variant(r, f)} is also known as "{f}".')
            emit(a, PRED_NAME, a, False, f'{_pick_variant(r, a)} is also known as "{a}".')
        # realistic page volume: fact sentences interleaved with non-fact
        # filler prose (exercises the extractor's negative path and makes
        # per-doc compute dominate fixed stage overhead at bench scale)
        n_facts = 8 + r.randrange(8)
        for _ in range(n_facts):
            kind = r.randrange(5)
            if kind == 0:
                f, p = film_name(r.randrange(n_entities)), person_name(r.randrange(n_entities))
                emit(f, PRED_DIRECTOR, p, True,
                     f"{_pick_variant(r, f)} was directed by {_pick_variant(r, p)}.")
            elif kind == 1:
                f, a = film_name(r.randrange(n_entities)), person_name(r.randrange(n_entities))
                emit(f, PRED_STARRING, a, True,
                     f"{_pick_variant(r, f)} starred {_pick_variant(r, a)}.")
            elif kind == 2:
                p, q = person_name(r.randrange(n_entities)), person_name(r.randrange(n_entities))
                if p != q:
                    emit(p, PRED_SPOUSE, q, True,
                         f"{_pick_variant(r, p)} is the spouse of {_pick_variant(r, q)}.")
            elif kind == 3:
                p, c = person_name(r.randrange(n_entities)), city_name(r.randrange(n_entities))
                emit(p, PRED_BIRTHPLACE, c, True,
                     f"{_pick_variant(r, p)} was born in {_pick_variant(r, c)}.")
            else:
                mk = person_name if r.randrange(2) == 0 else film_name
                e = mk(r.randrange(n_entities))
                emit(e, PRED_NAME, e, False,
                     f'{_pick_variant(r, e)} is also known as "{e}".')
        # filler prose: plausible english sentences with no extractable facts
        filler_subj = ["The committee", "A recent report", "The festival",
                       "Local press", "The archive", "This retrospective"]
        filler_verb = ["reviewed", "discussed", "catalogued", "celebrated",
                       "examined", "documented"]
        filler_obj = ["the early releases", "several restored prints",
                      "the award season", "a touring program",
                      "the studio era", "many private letters"]
        for _ in range(20 + r.randrange(16)):
            sentences.append(
                f"{r.choice(filler_subj)} {r.choice(filler_verb)} "
                f"{r.choice(filler_obj)} during {1950 + r.randrange(70)}."
            )
        r.shuffle(sentences)
    else:
        noise = _NOISE_DE if lang == "de" else _NOISE_FR
        for _ in range(2 + r.randrange(3)):
            sentences.append(" ".join(r.choice(noise) for _ in range(8)) + ".")

    title = f"Page {i}"
    paras = "".join(f"<p>{s}</p>" for s in sentences)
    html = (
        f"<html><head><title>{title}</title>"
        f"<style>body{{margin:0}}</style></head><body>"
        f"<nav><a href='/'>home</a> | <a href='/about'>about</a></nav>"
        f"<header>site {i % 97}</header>"
        f"{paras}"
        f"<script>var t={i};trk(t);</script>"
        f"<footer>(c) example.com</footer></body></html>"
    ).encode("utf-8")

    # local import to avoid a cycle at module import time
    from gstored_spark.kg.extract import extract_text

    text = extract_text(html) if i % 2 == 0 else None
    doc = dict(url=url, warc_ts=ts, html=html, text=text, lang=lang)
    return doc, gold


def default_entities(n_docs: int) -> int:
    return max(40, n_docs // 10)


def corpus_batches(lo: int, hi: int, n_entities: int) -> tuple[pd.DataFrame, pd.DataFrame]:
    docs, gold = [], []
    for i in range(lo, hi):
        d, g = doc_record(i, n_entities)
        docs.append(d)
        gold.extend(g)
    dcols = ["url", "warc_ts", "html", "text", "lang"]
    gcols = ["subj", "pred", "obj", "o_is_entity", "url"]
    return (
        pd.DataFrame(docs, columns=dcols),
        pd.DataFrame(gold, columns=gcols),
    )


def _map_factory(n_entities: int, which: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            if not ids:
                continue
            docs, gold = corpus_batches(0, 0, n_entities)
            rows_d, rows_g = [], []
            for i in ids:
                d, g = doc_record(int(i), n_entities)
                rows_d.append(d)
                rows_g.extend(g)
            if which == "docs":
                yield pd.DataFrame(rows_d, columns=docs.columns)
            else:
                yield pd.DataFrame(rows_g, columns=gold.columns)

    return gen


def generate_documents(
    spark: SparkSession, n_docs: int, n_entities: int | None = None, parallelism: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus: spark.range -> mapInPandas."""
    n_entities = n_entities or default_entities(n_docs)
    parts = parallelism or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n_docs, 1, parts)
    return rng.mapInPandas(_map_factory(n_entities, "docs"), schema=DOCUMENTS_SCHEMA)


def generate_gold(
    spark: SparkSession, n_docs: int, n_entities: int | None = None, parallelism: int | None = None
) -> DataFrame:
    n_entities = n_entities or default_entities(n_docs)
    parts = parallelism or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n_docs, 1, parts)
    return rng.mapInPandas(_map_factory(n_entities, "gold"), schema=GOLD_SCHEMA)
