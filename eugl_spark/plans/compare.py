"""Local mirror of the driver's DuckDB correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive cell-by-cell value match (NaN==NaN, the C14 pattern
from /root/reference/testing/cmp-fmask-outputs.py:28-34).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):  # before int(v): int(inf) raises — the gate
            return "Inf" if v > 0 else "-Inf"  # must DIFF, not crash
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "T" if v else "F"
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and pd.isna(v)) else v)
        df[c] = df[c].map(_canon)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare_frames(got: pd.DataFrame, want: pd.DataFrame) -> dict:
    res = {
        "rows": len(got),
        "oracle_rows": len(want),
        "rows_match": len(got) == len(want),
        "cols_match": sorted(got.columns) == sorted(want.columns),
        "values_match": False,
        "diff": None,
    }
    if not (res["rows_match"] and res["cols_match"]):
        parts = [
            f"rows got={len(got)} want={len(want)}",
            f"cols got={sorted(got.columns)} want={sorted(want.columns)}",
        ]
        # on a pure count mismatch with equal columns, show a sample of
        # the rows one side has and the other lacks — pointing the
        # developer at matching column lists explains nothing
        if res["cols_match"] and not res["rows_match"]:
            g, w = normalize(got), normalize(want)
            gk = {tuple(r) for r in g.itertuples(index=False)}
            wk = {tuple(r) for r in w.itertuples(index=False)}
            extra, missing = list(gk - wk)[:3], list(wk - gk)[:3]
            parts.append(f"sample extra-in-got={extra}")
            parts.append(f"sample missing-from-got={missing}")
        res["diff"] = "; ".join(parts)
        return res
    g, w = normalize(got), normalize(want)
    eq = g.eq(w)
    if bool(eq.all().all()):
        res["values_match"] = True
    else:
        bad = (~eq.all(axis=1)).to_numpy().nonzero()[0][:3]
        res["diff"] = "\n".join(
            f"got={g.iloc[i].to_dict()} want={w.iloc[i].to_dict()}" for i in bad
        )
    return res


def run_one(spark, con, name: str, sf_dir: str) -> dict:
    from eugl_spark.plans.queries import REGISTRY

    qry = REGISTRY[name]
    got = qry.spark(spark, sf_dir).toPandas()
    if qry.sql is None:
        return {
            "rows": len(got),
            "oracle_rows": None,
            # a rows-only query that produced ZERO rows is a failed
            # check, not a vacuous pass — len >= 0 could never fail
            "rows_match": len(got) > 0,
            "cols_match": len(got.columns) > 0,
            "values_match": None,
            "diff": "rows-only (no SQL oracle)",
        }
    want = con.sql(qry.sql).df()
    return compare_frames(got, want)
