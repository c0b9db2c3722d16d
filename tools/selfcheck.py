#!/usr/bin/env python3
"""Self-check: mimic the driver's t2 gate. Run graft.Verify first to
produce <out>/<query>/ parquet + <out>/oracle_sql.json, then compare each
Spark result against DuckDB running the oracle SQL on the same tables.

Usage: selfcheck.py [sf_dir] [verify_out]
"""
import sys, json, math
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

def fresh_con():
    # One connection PER QUERY: DuckDB working memory accumulates across
    # heavy oracles in a shared connection (observed OOM at sf0.1 on the
    # 3 largest after ~80 prior queries, each fine in isolation).
    c = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return c

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes = [], []
for name in sorted(oracle):
    sql = oracle[name]
    con = fresh_con()
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {str(e)[:200]}"))
        continue
    try:
        sdf = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"spark result missing: {str(e)[:120]}"))
        continue
    if sorted(odf.columns) != sorted(sdf.columns):
        fails.append((name, f"columns differ: oracle={sorted(odf.columns)} spark={sorted(sdf.columns)}"))
        continue
    cols = sorted(odf.columns)
    odf, sdf = odf[cols], sdf[cols]
    if len(odf) != len(sdf):
        fails.append((name, f"row count differs: oracle={len(odf)} spark={len(sdf)}"))
        continue
    o = odf.sort_values(cols).reset_index(drop=True)
    s = sdf.sort_values(cols).reset_index(drop=True)
    bad = None
    for c in cols:
        ov, sv = o[c], s[c]
        if ov.dtype.kind == "f" or sv.dtype.kind == "f":
            ovf = ov.astype(float); svf = sv.astype(float)
            mask = ~((ovf.isna() & svf.isna()) |
                     ((ovf - svf).abs() <= 1e-9 + 1e-9 * ovf.abs()))
        else:
            mask = ~((ov.isna() & sv.isna()) | (ov.astype(str) == sv.astype(str)))
        if mask.any():
            i = int(mask.idxmax())
            bad = f"col {c} row {i}: oracle={o[c][i]!r} spark={s[c][i]!r} ({int(mask.sum())} diffs)"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

# Rows-only queries (no oracle SQL): their parquet output must exist,
# be readable, and be non-degenerate; a Verify-reported failure is a FAIL.
con = duckdb.connect()
try:
    manifest = json.load(open(f"{out}/queries.json"))
    for name in sorted(set(manifest.get("queries", [])) - set(oracle)):
        if name in manifest.get("failed", []):
            fails.append((name, "Verify reported query failure"))
            continue
        try:
            n = len(con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df())
            if n == 0:
                # "non-degenerate" means non-empty: a rows-only query that
                # regresses to 0 rows must fail the gate, not slip through.
                fails.append((name, "rows-only output empty"))
            else:
                passes.append(f"{name}(rows={n})")
        except Exception as e:
            fails.append((name, f"rows-only output unreadable: {str(e)[:120]}"))
    for name in manifest.get("failed", []):
        if not any(f[0] == name for f in fails):
            fails.append((name, "Verify reported query failure"))
except FileNotFoundError:
    print("WARN no queries.json manifest; rows-only queries unchecked")

print(f"PASS {len(passes)}: {' '.join(passes)}")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
