"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row-count + column names + order-insensitive value comparison.

Used by tests/test_oracle_parity.py and ad-hoc while developing queries,
so mismatches are caught before the driver's CORRECTNESS gate runs.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from ..sources.tables import TABLE_NAMES

FLOAT_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns list of mismatch descriptions; empty == match."""
    issues: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        issues.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        issues.append(f"columns: spark={sc} oracle={oc}")
        return issues
    if issues:
        return issues
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            bad = ~((av - bv).abs() <= FLOAT_TOL * (1 + bv.abs())) & ~(av.isna() & bv.isna())
            if bad.any():
                i = bad.idxmax()
                issues.append(f"col {c}: {int(bad.sum())} diffs, e.g. row {i}: {av[i]} vs {bv[i]}")
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = av.astype(str) != bv.astype(str)
                i = neq.idxmax()
                issues.append(
                    f"col {c}: {int(neq.sum())} diffs, e.g. row {i}: {av[i]!r} vs {bv[i]!r}"
                )
    return issues


def check_query(spark, con, name: str, sf_dir: str, queries, oracles) -> list[str]:
    sdf = queries[name](spark, sf_dir).toPandas()
    osql = oracles.get(name)
    if osql is None:
        return [] if len(sdf) >= 0 else ["rows-only check failed"]
    odf = con.execute(osql).df()
    return compare_frames(sdf, odf)
