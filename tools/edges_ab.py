"""Same-session alternating A/B for the co_order_edges build shape.

A = shipped (distinct + order-key self-join). B = basket form (one
collect_set exchange + bounded per-basket pair explode). Checks value
identity on the edge frame, then times part_triangles end-to-end with
each builder. Throwaway round tool.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.operators.dedup import (
    _persist,
    release_persisted,
)
from forest_open_data_pipelines_spark.operators import relational
from forest_open_data_pipelines_spark.operators.relational import (
    co_order_edges,
    part_triangles,
    q1_pricing_summary,
)
from forest_open_data_pipelines_spark.plans.catalog import load_table
from forest_open_data_pipelines_spark.session import get_spark


def co_order_edges_baskets(lineitem, min_support):
    baskets = lineitem.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    combos = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + F.lit(2), F.size(F.col("parts"))),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(combos).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_support)
    )
    return _persist(
        pairs.select(
            F.col("part_a").alias("src"), F.col("part_b").alias("dst")
        ).unionByName(
            pairs.select(
                F.col("part_b").alias("src"), F.col("part_a").alias("dst")
            )
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf_dir, "lineitem")
    floor = []
    for _ in range(3):
        t0 = time.perf_counter()
        q1_pricing_summary(li).count()
        floor.append(round(time.perf_counter() - t0, 3))
    print(f"q1_floor: {min(floor)}s {floor}", flush=True)

    a = sorted(co_order_edges(li, 2).collect())
    release_persisted()
    b = sorted(co_order_edges_baskets(li, 2).collect())
    release_persisted()
    assert a == b, f"edge sets disagree: {len(a)} vs {len(b)}"
    print(f"value-identical edges: {len(a)} rows", flush=True)

    orig = relational.co_order_edges
    ta, tb = [], []
    for _ in range(reps):
        relational.co_order_edges = orig
        t0 = time.perf_counter()
        part_triangles(li).count()
        ta.append(round(time.perf_counter() - t0, 3))
        release_persisted()
        relational.co_order_edges = co_order_edges_baskets
        t0 = time.perf_counter()
        part_triangles(li).count()
        tb.append(round(time.perf_counter() - t0, 3))
        release_persisted()
    relational.co_order_edges = orig
    print(f"A self-join triangles: min={min(ta)} samples={ta}", flush=True)
    print(f"B baskets   triangles: min={min(tb)} samples={tb}", flush=True)


if __name__ == "__main__":
    main()
