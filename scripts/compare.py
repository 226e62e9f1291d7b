#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sfDir
parquet tables, sorts columns by name, and compares row-by-row.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; ScaleGen tables are Spark
        # output DIRECTORIES of part files — accept both
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # optional 3rd arg: comma-separated key filter (mirrors Verify's)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        names = [n for n in names if n in only]
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = n_skip = 0
    # an oracled key whose Verify output is missing entirely (the query
    # threw) must FAIL, not silently drop out of the listing
    for name in sorted(set(oracles) - set(names)):
        print(f"FAIL  {name}: query produced no output dir (Verify error?)")
        n_fail += 1
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        spark_arrow = con.execute(
            f"SELECT * FROM read_parquet({files!r})").arrow()
        spark_df = spark_arrow.to_pandas()
        if name not in oracles:
            print(f"skip  {name}: no oracle ({len(spark_df)} rows)")
            n_skip += 1
            continue
        try:
            duck_arrow = con.execute(oracles[name]).arrow()
            duck_df = duck_arrow.to_pandas()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # Type-CLASS audit at the arrow level (r12 lesson: sum(BIGINT)/
        # count_if silently widen to HUGEINT = decimal128(38,0) in
        # DuckDB, and the driver's typed hash then mismatches even when
        # every value is equal; compare.py's old astype harmonization
        # hid exactly that). Classes must match column-by-column; int
        # WIDTH (int32 vs int64) and timestamp unit are harmonized —
        # the driver demonstrably tolerates those (12 r12-green keys
        # differ there). A decimal on ONE side only is the killed class.
        def tclass(t):
            s = str(t)
            for k in ("decimal", "int", "uint", "float", "double", "bool",
                      "date", "timestamp", "string", "large_string", "list"):
                if s.startswith(k):
                    # date vs timestamp harmonized: DuckDB date_trunc
                    # returns DATE where Spark returns TIMESTAMP and the
                    # driver's gate accepts it (rollup_time_grain was
                    # r12-green)
                    return {"uint": "int", "double": "float",
                            "large_string": "string", "date": "datetime",
                            "timestamp": "datetime",
                            "decimal": s}.get(k, k)
            return s
        sk = {f.name: tclass(f.type) for f in spark_arrow.schema}
        dk = {f.name: tclass(f.type) for f in duck_arrow.schema}
        mism = [(c, sk[c], dk[c]) for c in sk if c in dk and sk[c] != dk[c]]
        if mism:
            for c, a, b in mism:
                hint = (" — DuckDB HUGEINT widening, add "
                        "CAST(... AS BIGINT) in the oracle SQL"
                        if b.startswith("decimal128(38, 0)") else "")
            print(f"FAIL  {name}: type-class mismatch {mism}{hint}")
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL  {name}: rows {len(s)} vs {len(d)}")
            n_fail += 1
            continue
        # exact value compare; width-only dtype drift harmonized via the
        # string render (class equality already proven above)
        bad = None
        for c in s.columns:
            a, b = s[c], d[c]
            if sk.get(c) == "datetime":
                a, b = pd.to_datetime(a), pd.to_datetime(b)
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = (a == b) | (a.isna() & b.isna())
            else:
                eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
            if not eq.all():
                i = int(eq.idxmin())
                bad = (c, i, a.iloc[i], b.iloc[i])
                break
        if bad:
            c, i, va, vb = bad
            print(f"FAIL  {name}: col {c} row {i}: spark={va!r} duck={vb!r}")
            n_fail += 1
        else:
            print(f"pass  {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
