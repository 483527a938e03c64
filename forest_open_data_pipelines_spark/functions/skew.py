"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (enabled in the session) is the first line of
defense — it splits oversized shuffle partitions at runtime. These
helpers are the explicit fallback for the cases AQE can't fix:
a broadcast-ineligible dimension joined on a power-law key, and
high-cardinality aggregations where one key dominates a partition.

Both are deterministic (salt = pmod(hash(disambiguating column), S)) —
no RNG, so retried tasks and oracle comparisons see identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated.

    The fact rows for one hot key spread across ``n_salts`` shuffle
    partitions instead of one; the dim side (too big to broadcast, small
    enough to replicate ×n_salts) is exploded with every salt value so
    each fact row still finds its match exactly once. Result is
    row-for-row identical to ``fact.join(dim, key, how)``.

    ``salt_from`` must be a fact column that varies within a key group
    (a row id / event id) so the salt actually spreads the hot key.
    """
    salt = F.pmod(F.hash(F.col(salt_from)), F.lit(n_salts)).cast("int")
    salted_fact = fact.withColumn("__salt", salt)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_fact.join(salted_dim, [key, "__salt"], how)
    return joined.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    salt_from: str,
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Aggregation in two shuffles: (key, salt) partial → key final.

    Only sum/count/min/max-decomposable aggregates belong here (pass the
    partial expression; the final phase re-applies sum for sums/counts,
    min/max for min/max). For ordinary groupBy Spark's map-side partial
    aggregation already does this implicitly — use two_phase_agg when a
    single reducer key still overflows (billions of rows on one key).

    ``aggs`` maps output name → (partial expression, final function),
    where final is one of ``"sum" | "min" | "max"``, e.g.::

        {"n": (F.count("*"), "sum"),
         "total": (F.sum("value"), "sum"),
         "mx": (F.max("v"), "max")}
    """
    finals = {"sum": F.sum, "min": F.min, "max": F.max}
    salt = F.pmod(F.hash(F.col(salt_from)), F.lit(n_salts)).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(key).agg(
        *[finals[fin](name).alias(name) for name, (_, fin) in aggs.items()]
    )
