#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify's parquet
dumps against the oracle SQL in DuckDB over the same testdata parquet, and
compare (row count, sorted-by-name columns, multiset of row values).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_key(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None))
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            duck_df = con.execute(sql).fetchdf()
            sc, sr = rows_key(spark_df)
            dc, dr = rows_key(duck_df)
            if sc != dc:
                print(f"FAIL {name}: columns {sc} vs {dc}")
                fail += 1
            elif len(sr) != len(dr):
                print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}")
                fail += 1
            elif sr != dr:
                diff = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
                print(f"FAIL {name}: values differ at sorted row {diff}:")
                print(f"  spark: {sr[diff]}")
                print(f"  duck : {dr[diff]}")
                fail += 1
            else:
                print(f"OK   {name}: {len(sr)} rows")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
