"""Shared fixtures: one SparkSession per test run + the DuckDB oracle
comparator that mirrors the driver's correctness gate (column-name
sort, order-insensitive row compare, exact values)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_streams_spark import get_session  # noqa: E402
from datafusion_streams_spark.catalog import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="dfs-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v)
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    except TypeError:
        df = df.sort_values(
            sort_cols, kind="mergesort", key=lambda s: s.astype(str)
        ).reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    """Order-insensitive comparison with exact values (floats compared
    bitwise-equal first, then to 1e-9 relative as a diagnostic split)."""
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = av.astype(float)
            bvf = bv.astype(float)
            both_nan = avf.isna() & bvf.isna()
            exact = (avf == bvf) | both_nan
            if not exact.all():
                close = both_nan | (
                    (avf - bvf).abs() <= 1e-9 * (avf.abs() + bvf.abs() + 1.0)
                )
                bad = (~exact).sum()
                first = (~exact).idxmax()
                detail = f"first diff row {first}: {avf[first]!r} vs {bvf[first]!r}"
                if close.all():
                    raise AssertionError(
                        f"{name}.{col}: {bad} values differ in low-order float bits "
                        f"(would fail a strict hash) — {detail}"
                    )
                raise AssertionError(f"{name}.{col}: {bad} values differ materially — {detail}")
        else:
            if not av.equals(bv):
                neq = av.astype(str) != bv.astype(str)
                if neq.any():
                    first = neq.idxmax()
                    raise AssertionError(
                        f"{name}.{col}: {int(neq.sum())} values differ — "
                        f"first diff row {first}: {av[first]!r} vs {bv[first]!r}"
                    )
