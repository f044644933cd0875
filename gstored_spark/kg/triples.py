"""Stage 2: OpenIE-style pattern triple extraction (mention level).

The reference ingests ready-made triples (Parser/RDFParser.cpp:36-63 assigns
object types and normalizes lexical forms); here triples are *extracted* from
sentences by SVO patterns, then lexical forms are normalized the same way the
reference normalizes parsed terms: entity mentions eventually become
``<iri>``-wrapped terms, literals become ``"..."@en`` (Triple/Triple.h:42-62
object-type split).

Output: mention_triples(subj_mention, pred, obj_mention, o_is_entity, url)
— subject/object are raw surface mentions; linking + canonicalization map
them to canonical IRIs downstream.

Scale: one ``mapInPandas`` over the extracted documents; regex work is
C-level (``re`` over batched rows), no JVM<->Python chatter beyond Arrow
batches. Each output row is tiny; the stage is embarrassingly parallel with
zero shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gstored_spark.sources.corpus import (
    PRED_BIRTHPLACE,
    PRED_DIRECTOR,
    PRED_NAME,
    PRED_SPOUSE,
    PRED_STARRING,
)

MENTION_TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subj_mention", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj_mention", T.StringType()),
        T.StructField("o_is_entity", T.BooleanType()),
        T.StructField("url", T.StringType()),
    ]
)

_M = r"[A-Za-z][A-Za-z0-9 .\-'’]*?"
# SVO patterns over the controlled sentence grammar; ordered, first match per
# sentence wins for its relation. Each yields (subj, pred, obj, o_is_entity).
_PATTERNS: list[tuple[re.Pattern, str, bool]] = [
    (re.compile(rf"^(?P<s>{_M}) was directed by (?P<o>{_M})\.$"), PRED_DIRECTOR, True),
    (re.compile(rf"^(?P<s>{_M}) starred (?P<o>{_M})\.$"), PRED_STARRING, True),
    (re.compile(rf"^(?P<s>{_M}) is the spouse of (?P<o>{_M})\.$"), PRED_SPOUSE, True),
    (re.compile(rf"^(?P<s>{_M}) was born in (?P<o>{_M})\.$"), PRED_BIRTHPLACE, True),
    (re.compile(rf'^(?P<s>{_M}) is also known as "(?P<o>[^"]+)"\.$'), PRED_NAME, False),
]

# sentence split on terminator + space, but NOT after a single-capital
# initial ("Quinuvia X. Lumath" must stay one mention)
_SENT_SPLIT = re.compile(r"(?<=[.!?])(?<![A-Z]\.)\s+")


def extract_sentence(sentence: str) -> tuple[str, str, str, bool] | None:
    """Pure per-sentence extractor shared by the UDF and the pytest oracle."""
    s = sentence.strip()
    if not s:
        return None
    for pat, pred, o_is_entity in _PATTERNS:
        m = pat.match(s)
        if m:
            return (m.group("s").strip(), pred, m.group("o").strip(), o_is_entity)
    return None


def extract_document(text: str) -> list[tuple[str, str, str, bool]]:
    out = []
    for para in text.split("\n"):
        for sent in _SENT_SPLIT.split(para):
            t = extract_sentence(sent)
            if t is not None:
                out.append(t)
    return out


def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["subj_mention", "pred", "obj_mention", "o_is_entity", "url"]
    for pdf in batches:
        rows = []
        for url, text in zip(pdf["url"], pdf["text"]):
            if text is None:
                continue
            for s, p, o, e in extract_document(text):
                rows.append((s, p, o, e, url))
        yield pd.DataFrame(rows, columns=cols)


def mention_triples(docs_with_text: DataFrame) -> DataFrame:
    """documents (text non-null) -> mention-level triples."""
    return docs_with_text.select("url", "text").mapInPandas(
        _gen, schema=MENTION_TRIPLES_SCHEMA
    )


def _gen_raw(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from gstored_spark.kg.extract import extract_text

    cols = ["subj_mention", "pred", "obj_mention", "o_is_entity", "url"]
    for pdf in batches:
        rows = []
        for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
            if text is None:
                text = extract_text(html)
            if not text:
                continue
            for s, p, o, e in extract_document(text):
                rows.append((s, p, o, e, url))
        yield pd.DataFrame(rows, columns=cols)


def mention_triples_raw(documents: DataFrame, only_lang: str | None = "en") -> DataFrame:
    """Fused extract+SVO: raw documents -> mention triples in ONE Python
    pass (guide §4.1: every boundary crossing pays an Arrow transpose —
    the staged ``mention_triples(extracted(docs))`` shape ships the corpus
    JVM->Python for HTML extraction, back to the JVM, then JVM->Python
    again for SVO matching; this ships it exactly once and never
    materializes ``text`` on the JVM side).

    Row-for-row identical output to the staged path: both call the same
    pure ``extract_text`` / ``extract_document`` (equivalence pytest-
    asserted); the language filter stays a JVM predicate pushed to the
    source scan."""
    docs = documents
    if only_lang:
        docs = docs.filter(docs["lang"] == only_lang)
    return docs.select("url", "html", "text").mapInPandas(
        _gen_raw, schema=MENTION_TRIPLES_SCHEMA
    )
