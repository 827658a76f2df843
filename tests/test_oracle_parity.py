"""Every registered query must hash-match its DuckDB oracle (the driver's
t2 gate, reproduced locally). Runs at sf0.001 for speed; the driver runs
the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from hridaya_steam_market_tracker_spark.queries import load_all
from tests.oracle import compare, duck_connection

SF = "/root/testdata/sf0.001"

REGISTRY = load_all()
ORACLE_NAMES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, SF).toPandas()
    oracle_pdf = duck.execute(q.oracle).df()
    compare(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    q = REGISTRY[name]
    assert q.fn(spark, SF).count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
