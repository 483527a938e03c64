"""A/B the two connected-components closures: pointer-jump doubling
(with the hot-label broadcast split) vs alternating large-star /
small-star (Kiveris et al., SoCC 2014).

Two workloads, both with the pair list PRECOMPUTED AND PERSISTED so
the closure cost is isolated from pair generation:

1. the duplicate-heavy rotation corpus at 1/2/4/8x sf0.1 (ppjoin
   pairs — the production topology: many small near-dup components
   whose size grows with replicas);
2. a synthetic VIRAL component (one hub cluster holding half the
   nodes as a random internal tangle) + background chains — the
   mega-cluster worst case the hot-label split and the star rewrite
   both exist for.

Usage: python tools/cc_ab.py [max_replicas] [viral_n]
Paste the summary into SURVEY §3.
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.operators import dedup
from forest_open_data_pipelines_spark.session import get_spark
from tools.scale_probe import build_scaled


def time_closures(spark, nodes, pairs, tag: str) -> None:
    nodes = nodes.persist()
    pairs = pairs.persist()
    n_nodes, n_pairs = nodes.count(), pairs.count()
    rows = {}
    for name, fn in (
        ("doubling", dedup.connected_components),
        ("star", dedup.connected_components_star),
    ):
        fn(nodes, pairs).count()  # warm plan/codegen
        t0 = time.perf_counter()
        labels = fn(nodes, pairs)
        chk = labels.agg(
            F.count("*").alias("n"),
            F.sum(F.hash("doc_id", "label")).alias("h"),
        ).collect()[0]
        dt = time.perf_counter() - t0
        rows[name] = (dt, chk["n"], chk["h"])
        print(
            f"{tag} nodes={n_nodes} pairs={n_pairs} {name}: {dt:.2f}s "
            f"checksum=({chk['n']},{chk['h']})",
            flush=True,
        )
    assert rows["doubling"][1:] == rows["star"][1:], rows  # identical labels
    nodes.unpersist()
    pairs.unpersist()


def main() -> None:
    max_replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    viral_n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark("cc-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # workload 1: production topology at 1-8x
    for s in [1, 2, 4, 8]:
        if s > max_replicas:
            break
        docs = spark.read.parquet(build_scaled(spark, s))
        pairs = dedup.dedup_ngram_ppjoin(docs).select("doc_a", "doc_b")
        time_closures(spark, docs.select("doc_id"), pairs, f"rotation_x{s}")
        dedup.release_persisted()

    # workload 2: viral mega-cluster. Half the nodes form ONE
    # component (random tangle, ~2 edges/node), the rest 100-node
    # chains. Seeded: both closures see the identical graph.
    rng = random.Random(1234)
    half = viral_n // 2
    viral_edges = [
        (rng.randrange(half), rng.randrange(half)) for _ in range(2 * half)
    ]
    viral_edges = [(a, b) for a, b in viral_edges if a != b]
    # ensure connectivity of the hub: a spanning chain through all ids
    viral_edges += [(i, i + 1) for i in range(half - 1)]
    chain_edges = [
        (i, i + 1)
        for i in range(half, viral_n - 1)
        if (i + 1 - half) % 100 != 0
    ]
    nodes = spark.range(viral_n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        viral_edges + chain_edges, ["doc_a", "doc_b"]
    ).repartition(32)
    time_closures(spark, nodes, pairs, f"viral_n{viral_n}")


if __name__ == "__main__":
    main()
