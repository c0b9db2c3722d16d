#!/usr/bin/env python3
"""Cross-engine UTF-8 BPE check: after `runMain graft.BpeProbe utf8 <work>`,
replay the generated x_text_bpe oracle SQL in DuckDB against the planted
non-ASCII documents table and diff the Spark result BITWISE (string
compare per cell — the md5 tok_hash column pins the merged sequences, so
any engine divergence in case mapping, pair ordering, or greedy merge
shows as a hash mismatch, not a rounding blur).

Usage: utf8_bpe_check.py [work_dir]
"""
import sys, json
import duckdb

work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_bpe_utf8"

con = duckdb.connect()
# Spark writes parquet as a directory of part files
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{work}/documents.parquet/*.parquet'")
sql = json.load(open(f"{work}/out/oracle_sql.json"))["x_text_bpe"]
odf = con.sql(sql).df()
sdf = con.sql(f"SELECT * FROM '{work}/out/x_text_bpe/*.parquet'").df()
cols = sorted(odf.columns)
assert sorted(sdf.columns) == cols, f"columns differ: {sorted(sdf.columns)} vs {cols}"
o = odf[cols].sort_values(cols).reset_index(drop=True)
s = sdf[cols].sort_values(cols).reset_index(drop=True)
assert len(o) == len(s), f"row count differs: oracle={len(o)} spark={len(s)}"
bad = 0
for c in cols:
    mask = o[c].astype(str) != s[c].astype(str)
    if mask.any():
        i = int(mask.idxmax())
        print(f"FAIL col {c} row {i}: oracle={o[c][i]!r} spark={s[c][i]!r} "
              f"({int(mask.sum())} diffs)")
        bad += 1
if bad:
    sys.exit(1)
print(f"PASS utf8 bpe bitwise: {len(o)} rows, cols={cols}")
