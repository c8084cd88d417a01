"""The t2 gate, run locally: every oracle-backed query must match DuckDB
bit-exactly at sf0.001 (fast loop; the driver re-checks at sf0.01).

Rows-only queries (no oracle) are smoke-checked for determinism: two runs
produce identical sorted results."""

from __future__ import annotations

import pytest

from kasper_spark.registry import QUERIES, ORACLES, load_all_operators
from tests.conftest import SF_SMOKE
from tests.oracle_utils import register_duck_views, run_both

load_all_operators()

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def duck_views(duck):
    register_duck_views(duck, SF_SMOKE)
    return duck


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck_views, name):
    problems = run_both(
        spark, duck_views, QUERIES[name], ORACLES[name], SF_SMOKE, name
    )
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_deterministic(spark, name):
    df1 = QUERIES[name](spark, SF_SMOKE)
    rows1 = sorted(map(str, df1.collect()))
    rows2 = sorted(map(str, QUERIES[name](spark, SF_SMOKE).collect()))
    assert rows1 == rows2, f"{name}: nondeterministic output"
    assert df1.columns, name
