"""Local mini-driver: compare a registered Spark query against its DuckDB
oracle the way the external driver does — row count, column names, and an
order-insensitive canonical value comparison (columns sorted by name).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pandas as pd

from hridaya_steam_market_tracker_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, (np.floating, float)):
        if math.isnan(float(v)):
            return "<null>"
        return f"{float(v):.12g}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if v is pd.NaT:
        return "<null>"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canonicalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1)
    rows = sorted(tuple(canon_cell(v) for v in row) for row in df.itertuples(index=False))
    return cols, rows


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    s_cols, s_rows = canonicalize(spark_df)
    o_cols, o_rows = canonicalize(oracle_df)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} oracle={len(o_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        assert a == b, (
            f"{name}: first differing row (after sort) at {i}:\n  spark : {a}\n  oracle: {b}"
        )
