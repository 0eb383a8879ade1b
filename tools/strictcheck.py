#!/usr/bin/env python3
"""Type-strict replica of the driver's hash gate.

Usage: python3 tools/strictcheck.py <outDir> <sfDir>

Unlike check.py (value-level, 1e-9 float tolerance), this compares the Spark
parquet result and the DuckDB oracle result at the ARROW level: column names
(sorted), arrow types, and exact cell values (no float tolerance). A query
that passes here should hash-match under any reasonable driver normalization.
"""
import sys, json, glob
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def sorted_table(t: pa.Table) -> pa.Table:
    cols = sorted(t.column_names)
    t = t.select(cols)
    # sort rows by all columns via duckdb (handles nested types poorly; fall
    # back to python sort on string repr)
    try:
        import pyarrow.compute as pc
        keys = [(c, "ascending") for c in cols]
        idx = pc.sort_indices(t, sort_keys=keys)
        return t.take(idx)
    except Exception:
        rows = sorted(
            ((str(t.slice(i, 1).to_pylist()), i) for i in range(t.num_rows)))
        return t.take([i for _, i in rows])

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for tb in TABLES:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM '{sf_dir}/{tb}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result"); n_fail += 1; continue
        try:
            spark_t = pa.concat_tables([pq.read_table(f) for f in files])
            oracle_t = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        st, ot = sorted_table(spark_t), sorted_table(oracle_t)
        if [c.lower() for c in st.column_names] != [c.lower() for c in ot.column_names]:
            print(f"FAIL {name}: cols {st.column_names} vs {ot.column_names}")
            n_fail += 1; continue
        bad = []
        for sc, oc in zip(st.schema, ot.schema):
            if sc.type != oc.type:
                bad.append(f"type {sc.name}: spark={sc.type} oracle={oc.type}")
        if st.num_rows != ot.num_rows:
            bad.append(f"rows {st.num_rows} vs {ot.num_rows}")
        if not bad:
            sp, op = st.to_pylist(), ot.to_pylist()
            for i, (a, b) in enumerate(zip(sp, op)):
                if a != b:
                    diffs = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
                    bad.append(f"row {i}: {diffs}")
                    break
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name}: {st.num_rows} rows strict"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
