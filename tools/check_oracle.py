#!/usr/bin/env python3
"""Local simulation of the driver's t2 gate: run each oracle SQL in DuckDB
against the same sf dir and compare with the Spark parquet dumps
(column-name-sorted, row-order-sensitive, exact value match)."""
import sys, json, duckdb, glob, os

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"MISSING SPARK OUTPUT {name}"); fail += 1; continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ORACLE SQL ERROR {name}: {e}"); fail += 1; continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
    odf = odf[sorted(odf.columns)]
    sdf = sdf[sorted(sdf.columns)]
    if list(odf.columns) != list(sdf.columns):
        print(f"SCHEMA MISMATCH {name}: oracle={list(odf.columns)} spark={list(sdf.columns)}")
        fail += 1; continue
    if len(odf) != len(sdf):
        print(f"ROWCOUNT MISMATCH {name}: oracle={len(odf)} spark={len(sdf)}")
        fail += 1; continue
    def norm(v):  # NaN != NaN would false-flag null-bearing columns
        return "NaN" if isinstance(v, float) and v != v else v
    o_rows = [tuple(norm(v) for v in r) for r in odf.itertuples(index=False)]
    s_rows = [tuple(norm(v) for v in r) for r in sdf.itertuples(index=False)]
    if o_rows != s_rows:
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(o_rows, s_rows)) if a != b]
        print(f"VALUE MISMATCH {name}: {len(bad)} rows differ; first: {bad[:2]}")
        fail += 1; continue
    print(f"OK {name} ({len(odf)} rows)")
print(f"\n{'FAIL' if fail else 'PASS'}: {len(oracle)-fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
