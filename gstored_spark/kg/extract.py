"""Stage 1: HTML -> text extraction.

Contract (BASELINE.json input_hint): *byte-identical extracted text per url*
between the distributed Arrow pandas UDF and the pure-Python reference
function. Both paths call the single pure function ``extract_text``; the test
suite asserts byte identity row-by-row.

The reference system has no HTML stage (its ingest is Turtle parsing,
Parser/RDFParser.cpp:36-63); this stage is the web-corpus analog the north
rule prescribes. Like the reference's literal normalization, the extractor's
output is a *normal form*: tag-free paragraph text with entity references
decoded and whitespace collapsed.

Scale notes: pandas_udf => Arrow batches, no per-row Python dispatch; the
regexes are precompiled once per executor; ``html`` stays ``binary`` end to
end and is decoded explicitly (UTF-8, replacement) to avoid Arrow
string-validity surprises on malformed web bytes.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DROP_BLOCK = re.compile(
    rb"<(script|style|nav|header|footer)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_PARA = re.compile(rb"<p\b[^>]*>(.*?)</p\s*>", re.IGNORECASE | re.DOTALL)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}


def extract_text(html: bytes | None) -> str | None:
    """Pure reference extractor. Deterministic bytes -> str.

    Drops script/style/nav/header/footer blocks, keeps <p> paragraph
    contents, strips residual tags, decodes the common five XML entities,
    collapses intra-paragraph whitespace, joins paragraphs with newline.
    """
    if html is None:
        return None
    body = _DROP_BLOCK.sub(b"", bytes(html))
    paras = []
    for m in _PARA.finditer(body):
        s = m.group(1).decode("utf-8", errors="replace")
        s = _TAG.sub(" ", s)
        if "&" in s:  # entity replaces are no-ops without an ampersand
            for k, v in _ENTITIES.items():
                s = s.replace(k, v)
        s = _WS.sub(" ", s).strip()
        if s:
            paras.append(s)
    return "\n".join(paras)


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def with_text(docs) -> "pyspark.sql.DataFrame":  # noqa: F821
    """documents(url, warc_ts, html, text, lang) -> same, with ``text``
    filled from ``html`` where NULL (the driver table pre-fills half the
    rows, FIXTURES.md §A1)."""
    return docs.withColumn(
        "text",
        F.when(F.col("text").isNotNull(), F.col("text")).otherwise(
            extract_text_udf(F.col("html"))
        ),
    )


def extracted(docs, only_lang: str | None = "en"):
    """Filtered, text-complete view used by downstream stages. The language
    filter is pushed down by Catalyst to the source scan."""
    out = with_text(docs)
    if only_lang:
        out = out.filter(F.col("lang") == only_lang)
    return out.filter(F.col("text").isNotNull() & (F.length("text") > 0))
