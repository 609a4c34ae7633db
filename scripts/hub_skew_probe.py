"""Hub-skew probe for the edge-iterator triangle join (q147's pattern):
one template hub of degree D (star, hub id mid-range so paths land on
ONE join key) over a uniform background; paths through the hub grow
~D^2/4 while |E| grows only linearly. If the implementation is
output-bound (healthy), wall-clock tracks the path count ~4x per D
doubling; a straggler cliff would grow worse and serialize."""
import sys, time
sys.path.insert(0, '/root/repo')
from job_etl_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("hub-skew")
spark.sparkContext.setLogLevel("ERROR")

def star_graph(d, n_bg=200_000):
    hub = n_bg  # mid-range-ish: spokes split below/above by parity
    spokes = spark.range(d).select(
        F.when(F.col("id") % 2 == 0, F.col("id")).otherwise(2 * hub + F.col("id")).alias("s")
    )
    e_hub = spokes.select(
        F.least(F.col("s"), F.lit(hub)).alias("doc_a"),
        F.greatest(F.col("s"), F.lit(hub)).alias("doc_b"),
    )
    bg = spark.range(n_bg).select(
        (F.col("id") * 7 % (3 * n_bg)).alias("doc_a"),
        (F.col("id") * 7 % (3 * n_bg) + 1 + F.col("id") % 97).alias("doc_b"),
    )
    return e_hub.unionByName(bg).distinct().localCheckpoint()

def triangle_paths_count(e):
    paths = e.alias("e1").join(e.alias("e2"), F.col("e1.doc_b") == F.col("e2.doc_a")).select(
        F.col("e1.doc_a").alias("a"), F.col("e1.doc_b").alias("b"), F.col("e2.doc_b").alias("c"))
    tri = paths.join(e.alias("e3"),
        (F.col("a") == F.col("e3.doc_a")) & (F.col("c") == F.col("e3.doc_b")))
    return tri.count(), paths.count()

for d in (2_000, 4_000, 8_000, 16_000):
    e = star_graph(d)
    ne = e.count()
    t0 = time.perf_counter()
    ntri, npaths = triangle_paths_count(e)
    dt = time.perf_counter() - t0
    print(f"hub_deg={d:>6,} |E|={ne:>9,} paths={npaths:>13,} tri={ntri} t={dt:6.2f}s", flush=True)
