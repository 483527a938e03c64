"""Dual-run parity: every SQL-expressible query must match its DuckDB
oracle (row count + column names + order-insensitive values) at
sf0.001 — the same gate the driver applies at sf0.01.

Modeled on the reference's golden-file test strategy (SURVEY.md §5):
the oracle SQL is the golden artifact.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pytest

import __spark_entry__ as entry_mod
from forest_open_data_pipelines_spark.sources.tables import TABLES
from tests.conftest import SF_DIR

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def _signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, oracle_con):
    sdf = QUERIES[name](spark, SF_DIR)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = oracle_con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    s_sig = _signature(scols, srows)
    o_sig = _signature(ocols, orows)
    assert s_sig[0] == o_sig[0], f"columns differ: {s_sig[0]} vs {o_sig[0]}"
    assert len(s_sig[1]) == len(o_sig[1]), "row counts differ"
    assert s_sig[1] == o_sig[1], "values differ"


def test_every_query_has_oracle_or_is_whitelisted():
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == {
        "multimodal_features",
        "multimodal_frames",
        "resize_media",
        "profile_files",
        # sketch internals (HLL++, KLL) are engine-specific; accuracy is
        # bounded against the exact profile in test_operators.py instead.
        "profile_columns_approx",
        # iterative BPE: per-round argmax is data-dependent (no SQL
        # oracle); corpus-exact vs the in-test stdlib twin instead.
        "bpe_train",
        "bpe_encode",
    }, rows_only
