#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against the
parquet tables in <sfDir>, and compares against the Spark parquet dump in
<verifyOutDir>/<name>/. Compare model: sort columns by name, then compare
row-by-row values (exact). Queries present in the out dir but absent from
oracle_sql.json get a rows-only check.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

class ArrayColumnError(Exception):
    """Mirrors the driver's gate, which dies on array-typed cells
    ('unhashable numpy.ndarray' in its pandas sort). Gated queries must
    serialize arrays (array_join / array_to_string) on both sides."""

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            s = df[c].dropna()
            if len(s) and not isinstance(s.iloc[0], (str, bytes, dict)) \
                    and hasattr(s.iloc[0], "__len__"):
                raise ArrayColumnError(
                    f"column '{c}' holds array cells; the driver gate cannot "
                    "compare these — serialize to string in the gated query")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        try:
            got = pd.concat([pd.read_parquet(f) for f in files]) if files \
                else pd.DataFrame()
        except Exception as e:
            results[name] = f"READ-FAIL {e}"
            continue
        if name not in oracles:
            # the driver reads rows-only dumps too — array cells break it there
            try:
                norm(got)
            except ArrayColumnError as ae:
                results[name] = f"ARRAY-COLUMN {ae}"
                continue
            results[name] = f"rows-only rows={len(got)}" + \
                (" EMPTY!" if len(got) == 0 else "")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {e}"
            continue
        try:
            g, e = norm(got), norm(exp)
        except ArrayColumnError as ae:
            results[name] = f"ARRAY-COLUMN {ae}"
            continue
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(g)} duck={len(e)}"
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            results[name] = "OK"
        except AssertionError as ae:
            results[name] = "VALUE-MISMATCH " + str(ae).split("\n")[0]
            # show first differing rows for debugging
            for i in range(min(len(g), len(e))):
                if not g.iloc[i].equals(e.iloc[i]):
                    results[name] += f" | row {i}: spark={g.iloc[i].to_dict()} duck={e.iloc[i].to_dict()}"
                    break
    ok = sum(1 for v in results.values() if v == "OK")
    ronly = sum(1 for v in results.values() if v.startswith("rows-only") and "EMPTY" not in v)
    for k in sorted(results):
        flag = "PASS" if results[k] == "OK" else ("INFO" if results[k].startswith("rows-only") and "EMPTY" not in results[k] else "FAIL")
        print(f"[{flag}] {k}: {results[k]}")
    print(f"\n{ok} exact-match, {ronly} rows-only, "
          f"{len(results) - ok - ronly} failing, of {len(results)}")
    sys.exit(0 if ok + ronly == len(results) else 1)

if __name__ == "__main__":
    main()
