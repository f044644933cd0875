"""S1: N-Triples / N3 line-format source and sink.

The reference ingests Turtle/N3 via a streaming C parser
(Parser/RDFParser.cpp:36-63, Parser/TurtleParser.cpp) that normalizes
lexical forms: IRIs wrapped in <>, plain literals quoted, language tags and
typed suffixes preserved, object type assigned from the first character
(Triple/Triple.h:42-62 ENTITY/LITERA split). Here the scan is
``spark.read.text`` + JVM regex extraction — distributed, pushdown-friendly
(a .gz/.zst corpus splits by file), and zero Python.

Line grammar handled (the reference's worked-example dialect,
example/dbpedia_example_distgStore.n3): ``<s>\\s<p>\\sobj .`` where obj is
``<iri>`` or ``"literal"(@lang|^^<type>)?``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_LINE = r'^\s*(<[^>]+>)\s+(<[^>]+>)\s+(.+?)\s*\.\s*$'


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """-> triples(subj, pred, obj, o_is_entity). Malformed lines dropped
    (the reference parser skips them with a warning)."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _LINE, 1).alias("subj"),
        F.regexp_extract("value", _LINE, 2).alias("pred"),
        F.regexp_extract("value", _LINE, 3).alias("obj"),
    ).filter((F.col("subj") != "") & (F.col("pred") != "") & (F.col("obj") != ""))
    return parsed.withColumn(
        "o_is_entity", F.col("obj").startswith("<")
    )


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """triples -> N-Triples text files (tab-separated like the reference's
    example corpus)."""
    triples.select(
        F.concat_ws("\t", F.col("subj"), F.col("pred"), F.concat(F.col("obj"), F.lit("."))).alias("value")
    ).write.mode(mode).text(path)
