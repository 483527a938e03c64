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


# Canonicalization is single-sourced with tools/check_correctness.py —
# both harnesses must compare EXACTLY like the driver (dtype-sensitive
# pandas frames; see tools/frame_compare.py).
from tools.frame_compare import pandas_signature as _pandas_signature  # noqa: E402


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, oracle_con):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = oracle_con.execute(ORACLES[name]).df()
    scols, srows = _pandas_signature(sdf)
    ocols, orows = _pandas_signature(odf)
    assert scols == ocols, f"columns differ: {scols} vs {ocols}"
    assert len(srows) == len(orows), "row counts differ"
    assert srows == orows, "values differ"


def test_every_query_has_oracle_or_is_whitelisted():
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == {
        # multimodal_features / multimodal_frames / resize_media were
        # rows-only until round 8: the fake-decoder byte math is now
        # value-verified via a hex-pair byte-explode oracle (kernels
        # switched to half-up 6-dp rounding to be mirrorable).
        "profile_files",
        # sketch internals (HLL++, KLL) are engine-specific; accuracy is
        # bounded against the exact profile in test_operators.py instead.
        "profile_columns_approx",
        # (bpe_train / bpe_encode left this set in r12: the training
        # loop is now a DuckDB unrolled-CTE oracle and the greedy fold
        # a delimiter-wrapped string replace — see _bpe_sqls.)
        # unigram-LM EM round + its encoder: data-dependent training
        # loop with a per-word Viterbi DP (no SQL twin); row-for-row
        # vs the in-test stdlib twin instead (bpe_train precedent).
        "unigram_lm_step",
        "unigram_encode",
        # sequential sketch (SpaceSaving): output depends on stream
        # order (no SQL twin); exact vs the stdlib twin + ICDT error
        # bounds in test_operators.py instead.
        "spacesaving_hitters",
        # Datasketches HLL internals (no SQL twin); the union-merge
        # equality and the error envelope vs the exact column are
        # pinned in test_operators.py instead.
        "distinct_rollup_sketch",
        # deterministic KLL/MRL quantile rollup (no SQL twin for the
        # compaction state); exact stdlib pipeline replay + the hard
        # rank-error envelope are pinned in test_operators.py.
        "quantile_rollup_sketch",
    }, rows_only
