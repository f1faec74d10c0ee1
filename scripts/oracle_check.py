#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(dumps each SparkEntry query to <outdir>/<name>/ parquet plus oracle_sql.json),
then this script executes each oracle SQL in DuckDB over the same sf tables and
compares rows / schema (column names sorted) / values.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import duckdb, json, sys, os

def canon_rows(df):
    rows = []
    for r in df.itertuples(index=False):
        vals = []
        for v in r:
            if v is None or (isinstance(v, float) and v != v):
                vals.append(None)
            elif hasattr(v, "item"):
                vals.append(v.item() if not str(type(v)).count("Timestamp") else str(v))
            else:
                vals.append(str(v) if not isinstance(v, (int, float, bool, str)) else v)
        rows.append(tuple(vals))
    return sorted(rows, key=repr)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            orc_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ERROR {str(e)[:160]}")
            n_bad += 1
            continue
        sp = spark_df[sorted(spark_df.columns)]
        od = orc_df[sorted(orc_df.columns)]
        schema = list(map(str.lower, sp.columns)) == list(map(str.lower, od.columns))
        rows = len(sp) == len(od)
        values = schema and canon_rows(sp) == canon_rows(od)
        ok = schema and rows and values
        if not ok:
            n_bad += 1
            print(f"{name}: rows={len(sp)}/{len(od)} schema={schema} values={values}"
                  f"  cols spark={list(sp.columns)} oracle={list(od.columns)}")
            if schema and not values:
                a, b = canon_rows(sp), canon_rows(od)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    print(f"  spark={x}\n  orcl ={y}")
        else:
            print(f"{name}: OK ({len(sp)} rows)")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
