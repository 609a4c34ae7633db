"""CC hybrid crossover: driver union-find vs distributed label propagation
at increasing edge counts, on synthetic near-dup-shaped graphs (many small
cliques + a few chains — the real active-set shape)."""
import sys, time
sys.path.insert(0, '/root/repo')
from job_etl_spark.session import get_spark
from pyspark.sql import functions as F
from job_etl_spark.ml.cluster import connected_components, _driver_union_find, _propagate

spark = get_spark("cc-crossover")
spark.sparkContext.setLogLevel("ERROR")

def graph(n_edges):
    # clique blocks of 5 nodes (10 edges each) => n_edges/10 blocks,
    # ids spread over a wide range; built distributed, materialized once
    blocks = n_edges // 10
    df = spark.range(blocks).select(F.col("id").alias("b"))
    from pyspark.sql.functions import explode, sequence, lit, struct
    pairs = []
    for i in range(5):
        for j in range(i+1, 5):
            pairs.append((i, j))
    pair_df = spark.createDataFrame(pairs, "i int, j int")
    e = df.crossJoin(pair_df).select(
        (F.col("b")*5 + F.col("i")).alias("doc_a"),
        (F.col("b")*5 + F.col("j")).alias("doc_b"),
    )
    return e.localCheckpoint()  # materialize so build cost is excluded

for n in (100_000, 500_000, 1_000_000, 2_000_000, 4_000_000, 8_000_000):
    e = graph(n)
    ne = e.count()
    # driver path
    t0 = time.perf_counter()
    connected_components(e, collect_max_edges=10**9).write.format("noop").mode("overwrite").save()
    td = time.perf_counter() - t0
    # distributed path
    t0 = time.perf_counter()
    connected_components(e, collect_max_edges=0).write.format("noop").mode("overwrite").save()
    tp = time.perf_counter() - t0
    print(f"edges={ne:>9,}  driver={td:6.2f}s  distributed={tp:6.2f}s", flush=True)
    e.unpersist()
