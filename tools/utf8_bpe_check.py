#!/usr/bin/env python3
"""Cross-engine UTF-8 BPE check: after `runMain graft.BpeProbe utf8 <work>`,
replay each generated oracle SQL (training AND the frozen-merge admission
arm) in DuckDB against the planted non-ASCII documents table and diff the
Spark results BITWISE (string compare per cell — the md5 tok_hash column
pins the merged sequences, so any engine divergence in case mapping, pair
ordering, or greedy merge shows as a hash mismatch, not a rounding blur).

Usage: utf8_bpe_check.py [work_dir]
"""
import sys, json
import duckdb

work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_bpe_utf8"

con = duckdb.connect()
# Spark writes parquet as a directory of part files
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{work}/documents.parquet/*.parquet'")
oracles = json.load(open(f"{work}/out/oracle_sql.json"))
bad = 0
for name, sql in sorted(oracles.items()):
    odf = con.sql(sql).df()
    sdf = con.sql(f"SELECT * FROM '{work}/out/{name}/*.parquet'").df()
    cols = sorted(odf.columns)
    assert sorted(sdf.columns) == cols, \
        f"{name}: columns differ: {sorted(sdf.columns)} vs {cols}"
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    assert len(o) == len(s), \
        f"{name}: row count differs: oracle={len(o)} spark={len(s)}"
    ok = True
    for c in cols:
        mask = o[c].astype(str) != s[c].astype(str)
        if mask.any():
            i = int(mask.idxmax())
            print(f"FAIL {name} col {c} row {i}: oracle={o[c][i]!r} "
                  f"spark={s[c][i]!r} ({int(mask.sum())} diffs)")
            bad += 1
            ok = False
    if ok:
        print(f"PASS utf8 {name} bitwise: {len(o)} rows, cols={cols}")
if bad:
    sys.exit(1)
