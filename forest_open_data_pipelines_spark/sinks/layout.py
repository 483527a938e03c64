"""Data-layout sinks: multi-dimensional clustering (z-order) and
small-file compaction.

At 100 TB the scan cost of a query is decided less by the plan than by
the LAYOUT of the files it reads: parquet keeps min/max statistics per
file and row group, and the reader skips any unit whose range cannot
match the pushed filter. A table written in arrival order has every
file spanning the whole domain of every column — nothing skips. Two
maintenance writers fix that:

- ``write_sorted_layout`` — range-repartition + sort the rows before
  writing. Linear sort makes the leading column's per-file ranges
  DISJOINT (perfect skipping on that column, useless on the others);
  ``zorder=True`` interleaves the bits of several columns' rank
  buckets into one clustering key, so every file covers a small
  hyper-rectangle and filters on ANY of the clustered columns skip
  most files (the Delta/Iceberg OPTIMIZE ZORDER technique, public
  algorithm — Morton 1966).
- ``compact_parquet`` — bin-pack a directory of small files into
  ~``target_mb`` outputs. Streaming ingests and per-partition writes
  leave thousands of KB-sized files whose open/footer overhead
  dominates the scan; compaction is the standing maintenance job of
  every lake. File sizes come from the Hadoop FileSystem API, so the
  same code runs against HDFS/S3A, not just local paths.

Both are write-side jobs: one shuffle each, run once, every subsequent
query benefits. Tests assert the skipping property directly from the
parquet footers (pyarrow), not from wall-clock.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _zorder_key(df: DataFrame, cols: list[str]) -> Column:
    """Interleaved-bit (Morton) clustering key over ``cols``.

    Each column is scaled to a ``b``-bit rank bucket with EXACT integer
    arithmetic against its collected min/max (a bounded 2-values-per-
    column aggregate — the IVF-centroid metadata pattern), in two
    regimes chosen driver-side so the arithmetic never leaves exact
    longs (a double-based scale factor mis-buckets past 2^53): spans
    below 2^47 use the range-FILLING ``((col - mn) * 2^b) div span``
    (multiply-first cannot overflow there, and small domains must be
    stretched across all b bit-planes or the interleave degenerates to
    whichever column has more raw bits); spans at or above 2^47 use
    the cell width ``q = ceil(span / 2^b)`` (Python arbitrary
    precision) and ``(col - mn) div q``, which also fills the b-bit
    range at those magnitudes. Bit j
    of column c lands at position ``j * k + (k - 1 - c)`` of the key;
    ``b = min(16, 63 // k)`` keeps the key inside a signed long. The
    bucket/interleave expressions are pure codegen (div/shift/and/or),
    so the key costs one projection on the write path and nothing at
    read time.

    Columns must be integral (map dates to day numbers, strings to
    dictionary codes first) — a silent long cast of a non-numeric
    column would null-key every row. NULL values in a clustered column
    are pinned to the column's min bucket (coalesce-to-min before
    bucketing), so they land deterministically at the low edge instead
    of nulling the whole key.
    """
    k = len(cols)
    if k < 2:
        raise ValueError("zorder needs >= 2 columns; use linear sort for 1")
    dtypes = dict(df.dtypes)
    for c in cols:
        if dtypes.get(c) not in _INTEGRAL_TYPES:
            raise ValueError(
                f"zorder column {c!r} has type {dtypes.get(c)!r}; integral "
                "columns required — map dates/strings to ints (day number, "
                "dictionary code) before clustering"
            )
    b = min(16, 63 // k)
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"mx_{c}") for c in cols],
    ).first()
    if stats[f"mn_{cols[0]}"] is None:
        raise ValueError("zorder layout: input DataFrame has no rows")
    key = F.lit(0).cast("long")
    for c_idx, c in enumerate(cols):
        mn = int(stats[f"mn_{c}"])
        span = int(stats[f"mx_{c}"]) - mn + 1
        # NULL cells coalesce to the column MIN (min/max aggregates
        # ignore NULLs, so mn is the non-null floor): without this, a
        # single NULL nulls the bucket and — via bitwiseOR(NULL) — the
        # whole Morton key, silently collapsing those rows into one
        # arbitrary range partition. Pinning NULLs to the low edge is
        # deterministic and matches NULLS FIRST sort semantics.
        col_sql = f"coalesce(cast(`{c}` as bigint), {mn})"
        if span < (1 << 47):  # multiply-first exact and overflow-free
            bucket = F.expr(f"(({col_sql}) - {mn}) * {1 << b} div {span}")
        else:
            cell = -(-span // (1 << b))  # ceil, driver-side exact
            bucket = F.expr(f"(({col_sql}) - {mn}) div {cell}")
        for j in range(b):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, j * k + (k - 1 - c_idx)).cast("long")
            )
    return key


def write_sorted_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    zorder: bool = False,
    mode: str = "overwrite",
) -> None:
    """Cluster ``df`` on ``cols`` and write ``~n_files`` parquet files
    whose per-file min/max ranges are tight, so pushed filters on the
    clustered columns skip whole files/row groups at read time.

    ``zorder=False``: lexicographic range sort — per-file ranges on
    ``cols[0]`` are disjoint (best single-column layout). ``True``:
    Morton-interleaved key — every file covers a small rectangle in
    ALL of ``cols``' dimensions (the multi-filter layout). Range
    repartition (sampled quantile boundaries, one shuffle) balances
    file sizes even on skewed keys; sortWithinPartitions adds the
    row-group-level ordering inside each file.
    """
    if zorder:
        keyed = df.withColumn("__zkey", _zorder_key(df, cols))
        (
            keyed.repartitionByRange(n_files, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
            .write.mode(mode)
            .parquet(path)
        )
    else:
        (
            df.repartitionByRange(n_files, *cols)
            .sortWithinPartitions(*cols)
            .write.mode(mode)
            .parquet(path)
        )


def parquet_data_file_sizes(spark: SparkSession, path: str) -> dict[str, int]:
    """{file path: bytes} for every parquet data file under ``path``,
    via the Hadoop FileSystem API (works on hdfs:// and s3a:// URIs the
    same as local paths; metadata-only, no data read)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out: dict[str, int] = {}
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out[st.getPath().toString()] = int(st.getLen())
    return out


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_mb: float = 128.0,
    mode: str = "overwrite",
) -> int:
    """Bin-pack the parquet files under ``src_path`` into
    ``ceil(total_bytes / target_mb)`` files at ``dst_path``; returns
    the output file count. One full-shuffle repartition buys evenly
    sized outputs (coalesce would be shuffle-free but inherits the
    input skew — wrong trade for a run-rarely maintenance job whose
    whole point is the post-compaction layout). Compacting into a NEW
    path keeps the job idempotent and crash-safe: readers switch after
    the write commits, the classic lake compaction protocol.
    """
    total = sum(parquet_data_file_sizes(spark, src_path).values())
    if total == 0:
        raise ValueError(
            f"compact_parquet: no parquet data files under {src_path!r} — "
            "nothing to compact (failed upstream write or wrong path?)"
        )
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    spark.read.parquet(src_path).repartition(n).write.mode(mode).parquet(dst_path)
    return n
