#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare (sorted columns, sorted rows, values)."""
import sys, os, json, glob
import duckdb
import pandas as pd

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.read_parquet(spark_dir)
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if list(map(str, got.dtypes)) != list(map(str, want.dtypes)):
            print(f"WARN {name}: dtypes {list(map(str, got.dtypes))} vs {list(map(str, want.dtypes))}")
        g = got.sort_values(by=list(got.columns), ignore_index=True)
        w = want.sort_values(by=list(want.columns), ignore_index=True)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        if not g.equals(w):
            # find first differing cell for diagnosis
            diff = (g != w) & ~(g.isna() & w.isna())
            cells = list(zip(*diff.to_numpy().nonzero()))[:5]
            detail = [(int(r), g.columns[c], g.iat[r, c], w.iat[r, c]) for r, c in cells]
            print(f"FAIL {name}: values differ, first={detail}"); n_fail += 1; continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
