"""A/B: does load_table's analyzed-frame memo change victim plans/timing?

Alternates reps of the named queries with the memo active (shipped) vs
bypassed (fresh spark.read per call), same session, same floor — the
bisect harness for the r12->r13 dedup_incremental / part_affinity_pairs
regression hunt. Also dumps both physical plans for diffing.

Usage: python tools/memo_ab.py <query> [query ...] [--reps 4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forest_open_data_pipelines_spark.operators.dedup import release_persisted
from forest_open_data_pipelines_spark.plans.catalog import QUERIES
from forest_open_data_pipelines_spark.session import get_spark
from forest_open_data_pipelines_spark.sources import tables as T


def main() -> None:
    names = []
    reps = 4
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("memo-ab")
    spark.sparkContext.setLogLevel("ERROR")

    real_load = T.load_table

    def fresh_load(s, d, name):
        cache = s.__dict__.setdefault("_fodp_table_cache", {})
        cache.clear()
        out = real_load(s, d, name)
        cache.clear()
        return out

    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    floors = []
    for _ in range(3):
        f0 = time.perf_counter()
        QUERIES["q1_pricing_summary"](spark, sf_dir).count()
        floors.append(time.perf_counter() - f0)
        release_persisted()
    print(f"q1_floor: {min(floors):.3f}s {[round(s, 3) for s in floors]}")

    for name in names:
        for label, loader in (("memo", real_load), ("fresh", fresh_load)):
            T.load_table = loader
            try:
                plan = QUERIES[name](spark, sf_dir)._sc is None  # noqa: F841
            except Exception:
                pass
            T.load_table = real_load
        samples = {"memo": [], "fresh": []}
        for r in range(reps):
            for label, loader in (("memo", real_load), ("fresh", fresh_load)):
                T.load_table = loader
                import forest_open_data_pipelines_spark.plans.catalog as cat

                cat.load_table = loader
                try:
                    start = time.perf_counter()
                    QUERIES[name](spark, sf_dir).count()
                    samples[label].append(time.perf_counter() - start)
                finally:
                    T.load_table = real_load
                    cat.load_table = real_load
                    release_persisted()
        for label in ("memo", "fresh"):
            s = samples[label]
            print(
                f"{name} [{label}]: min={min(s):.3f}s "
                f"samples={[round(x, 3) for x in s]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
