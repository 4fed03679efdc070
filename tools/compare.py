#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: compare.py <sfDir> <verifyOutDir> [query ...]

For each query in <verifyOutDir>/oracle_sql.json (or the listed subset):
run the oracle SQL in DuckDB over the sf parquet tables, load the Spark
parquet result, normalize both sides (lowercase column names, columns
sorted by name, rows as repr() tuples, sorted), and compare md5 of the
joined repr lines. Prints PASS/FAIL per query and a summary.
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["customer", "documents", "embeddings", "events", "lineitem",
          "nation", "orders", "part", "region", "supplier"]


def canon(df: pd.DataFrame):
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for t in df.itertuples(index=False, name=None):
        vals = []
        for v in t:
            if hasattr(v, "item"):
                v = v.item()
            vals.append(v)
        rows.append(repr(tuple(vals)))
    rows.sort()
    return cols, rows


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    npass = nfail = nerr = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"{name:28s} NO_SPARK_OUTPUT")
            nerr += 1
            continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        except Exception as e:
            print(f"{name:28s} SPARK_READ_ERR {e}")
            nerr += 1
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name:28s} ORACLE_ERR {str(e).splitlines()[0][:120]}")
            nerr += 1
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        smd5 = hashlib.md5("\n".join(srows).encode()).hexdigest()
        omd5 = hashlib.md5("\n".join(orows).encode()).hexdigest()
        schema_ok = scols == ocols
        rows_ok = len(srows) == len(orows)
        if schema_ok and smd5 == omd5:
            print(f"{name:28s} PASS ({len(srows)} rows)")
            npass += 1
        else:
            print(f"{name:28s} FAIL schema={schema_ok} rows={len(srows)}/{len(orows)} hash={smd5==omd5}")
            if not schema_ok:
                print(f"   spark cols:  {scols}")
                print(f"   oracle cols: {ocols}")
            else:
                sset, oset = set(srows), set(orows)
                for r in list(sorted(sset - oset))[:3]:
                    print(f"   spark-only:  {r[:160]}")
                for r in list(sorted(oset - sset))[:3]:
                    print(f"   oracle-only: {r[:160]}")
            nfail += 1
    print(f"== {npass} pass, {nfail} fail, {nerr} err ==")
    sys.exit(1 if (nfail or nerr) else 0)


if __name__ == "__main__":
    main()
