"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value representation. Strict string-normalized
comparison: if this passes, the driver's hash check should too.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from data_integration_system_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _normalize(rows, colnames) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, sf_dir: str, name: str, fn, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty == parity."""
    errors: list[str] = []
    sdf = fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns

    con = duck_connect(sf_dir)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    if sorted(s_cols) != sorted(d_cols):
        errors.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errors
    if len(s_rows) != len(d_rows):
        errors.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    if sn != dn:
        only_s = [r for r in sn if r not in set(dn)][:3]
        only_d = [r for r in dn if r not in set(sn)][:3]
        errors.append(f"{name}: values differ; spark-only={only_s} duck-only={only_d}")
    return errors
