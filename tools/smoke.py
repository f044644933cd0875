"""Quick end-to-end smoke of the KG pipeline on a tiny corpus."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gstored_spark.session import get_spark
from gstored_spark.sources import corpus as SC
from gstored_spark.kg.pipeline import run_pipeline
from gstored_spark.plans.bgp import run_query_text

t0 = time.time()
spark = get_spark("smoke", cores=4, shuffle_partitions=8)
spark.sparkContext.setLogLevel("WARN")

docs = SC.generate_documents(spark, 200)
gold = SC.generate_gold(spark, 200)
print("docs:", docs.count(), "gold:", gold.count())

res = run_pipeline(spark, docs, n_parts=4)
trip = res.triples
trip.persist()
print("triples:", trip.count())
trip.show(5, truncate=80)

# P/R vs gold
g = gold.select("subj", "pred", "obj").distinct()
p = trip.select("subj", "pred", "obj").distinct()
inter = p.intersect(g).count()
np_, ng = p.count(), g.count()
print(f"P={inter/np_:.3f} R={inter/ng:.3f} (|pred|={np_} |gold|={ng} |inter|={inter})")

print("id_triples:", res.id_triples.count())
print("routed:", res.routed.groupBy("part", "is_crossing").count().collect())
print("adjacency:", res.adjacency.count())
res.adjacency.show(3, truncate=60)
print("signatures:", res.signatures.count())
print("part_sig:", res.part_sig.collect()[:1])

q = """select ?a ?d ?f where {
?a <rel:spouse> ?d.
?f <rel:director> ?d.
?f <rel:starring> ?a.
}"""
m = run_query_text(trip, q, distinct=True)
print("triangle matches:", m.count())
print("elapsed", round(time.time() - t0, 1), "s")
spark.stop()
