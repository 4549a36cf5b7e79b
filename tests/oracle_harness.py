"""Local mimic of the driver's queries()-vs-oracle_sql() comparison:
row count + schema-agnostic, order-insensitive value hash with columns
sorted by name."""

from __future__ import annotations

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df_pandas):
    import pandas as pd

    df = df_pandas.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        df[c] = df[c].map(
            lambda v: "" if v is None or (isinstance(v, float) and pd.isna(v))
            else (repr(float(v)) if isinstance(v, float) else str(v))
        )
    rows = sorted(map(tuple, df.values.tolist()))
    return rows


def compare(spark_df, con, sql: str) -> dict:
    ours = normalize(spark_df.toPandas())
    ref = normalize(con.execute(sql).fetchdf())
    return {
        "rows_ours": len(ours),
        "rows_ref": len(ref),
        "match": ours == ref,
        "first_diff": next(
            ((a, b) for a, b in zip(ours, ref) if a != b), None
        ) if ours != ref and len(ours) == len(ref) else None,
    }
