"""Local mimic of the driver's DuckDB-oracle comparison: run each
queries()[name] on Spark and oracle_sql()[name] on DuckDB over the same
parquet tables, compare row count, column names, and values (order-
insensitive, tolerant float compare slightly stricter than a value-hash)."""

from __future__ import annotations

import math

import duckdb


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    if sorted(map(str.lower, sp.columns)) != sorted(map(str.lower, du.columns)):
        return False, f"columns differ: {list(sp.columns)} vs {list(du.columns)}"
    if len(sp) != len(du):
        return False, f"row count differs: spark={len(sp)} duckdb={len(du)}"
    cols = sorted(sp.columns, key=str.lower)
    du = du.rename(columns={c: c for c in du.columns})
    du_cols = {c.lower(): c for c in du.columns}
    s_rows = sorted(
        tuple(_canon(v) for v in row)
        for row in sp[cols].itertuples(index=False, name=None)
    )
    d_rows = sorted(
        tuple(_canon(v) for v in row)
        for row in du[[du_cols[c.lower()] for c in cols]].itertuples(
            index=False, name=None
        )
    )
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:3]
        return False, f"values differ, first diffs: {diffs}"
    return True, "ok"
