#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run Verify output vs DuckDB oracle.

Usage: python3 tools/check.py <outDir> <sfDir>
Reads <outDir>/<name>/ parquet (Spark result) and <outDir>/oracle_sql.json,
runs each oracle SQL in DuckDB with tables registered over <sfDir>/*.parquet,
sorts columns by name and rows lexicographically, compares cell-by-cell.
Strict compare first; reports max float divergence when strict fails.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_cell(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return v
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return tuple(norm_cell(x) for x in v)
    return v

def table_of(rows, cols):
    # sort columns by name, then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out

def cells_equal(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if af == bf: return True
        return abs(af-bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    if type(a) != type(b): return str(a) == str(b)
    return a == b

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols, srows = rel.columns, rel.fetchall()
            orel = con.sql(sql)
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sc, st = table_of(srows, scols)
        oc, ot = table_of(orows, ocols)
        if [c.lower() for c in sc] != [c.lower() for c in oc]:
            print(f"FAIL {name}: columns {sc} vs oracle {oc}"); n_fail += 1; continue
        if len(st) != len(ot):
            print(f"FAIL {name}: rows {len(st)} vs oracle {len(ot)}"); n_fail += 1; continue
        bad = None; exact = True; maxdiv = 0.0
        for i, (a, b) in enumerate(zip(st, ot)):
            for j, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    exact = False
                    if isinstance(x, float) and isinstance(y, float) and y != 0:
                        maxdiv = max(maxdiv, abs(x-y)/max(1.0, abs(y)))
                if not cells_equal(x, y):
                    bad = (i, sc[j], x, y); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            tag = "exact" if exact else f"float-tol (maxdiv={maxdiv:.2e})"
            print(f"PASS {name}: {len(st)} rows [{tag}]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
