"""gstored_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
gStoreD reference (partial-evaluation distributed RDF store; see
/root/reference and SURVEY.md).

This is NOT a port: the reference is a C++/MPI triple store; this package
re-expresses its data model (dictionary-encoded triples, vertex-partitioned
adjacency with crossing-edge replication, 450-bit vertex signatures) and its
query semantics (BGP subgraph homomorphism, OPTIONAL/UNION/MINUS/FILTER/
DISTINCT/ORDER/LIMIT) as declarative DataFrame plans optimized by Catalyst,
plus the surrounding KG-construction pipeline (extract -> triples -> link ->
canonicalize -> encode -> partition -> blocks) the north rule requires.

Layout:
  sources/    synthetic corpus generator, N-Triples reader, testdata loaders
  kg/         the construction pipeline stages
  operators/  training-data ops: dedup, similarity, text stats, multimodal
  functions/  signature bit math, portable hashing helpers
  plans/      BGP query-graph -> DataFrame join-plan compiler
  streaming/  incremental triple ingestion (Structured Streaming)
"""

__version__ = "0.1.0"
