#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB over views named after the
tables in <sfDir>. Compares: column names (sorted), row count, and the
multiset of rows (sorted by all columns) with exact equality; floats also
reported with max-abs-diff so near-misses are visible.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # Normalize a cell for comparison: pyarrow scalars -> python.
    if hasattr(v, "as_py"):
        v = v.as_py()
    if isinstance(v, float):
        return v
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    names = sorted([d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d))])
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark output parquet")
            n_fail += 1
            continue
        spark_arrow = pq.read_table(files[0])
        # Reproduce the driver's harness limitation: its pandas-based
        # compare (sort_values over all columns) dies with "unhashable
        # type: numpy.ndarray" on ANY nested-typed column — even for
        # rows-only checks. Fail loudly here so a query that would `err`
        # on the driver can never look green locally (r2 divergence).
        import pyarrow.types as pat
        nested = [f.name for f in spark_arrow.schema
                  if pat.is_nested(f.type)]
        if nested:
            print(f"ERR   {name}: nested-typed columns {nested} would "
                  f"crash the driver's pandas compare (unhashable ndarray)")
            n_fail += 1
            continue
        spark_tbl = spark_arrow.to_pylist() if len(files) == 1 else \
            sum((pq.read_table(f).to_pylist() for f in files), [])
        if name not in oracle:
            ok = len(spark_tbl) > 0
            print(f"{'ROWS' if ok else 'FAIL'}  {name}: rows-only check, "
                  f"{len(spark_tbl)} rows")
            n_rowsonly += ok
            n_fail += (not ok)
            continue
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table().to_pylist()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl[0].keys()) if spark_tbl else []
        d_cols = sorted(duck[0].keys()) if duck else []
        if s_cols != d_cols:
            print(f"FAIL  {name}: cols spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if len(spark_tbl) != len(duck):
            print(f"FAIL  {name}: rowcount spark={len(spark_tbl)} duck={len(duck)}")
            n_fail += 1
            continue
        def key(row):
            return tuple(repr(norm(row[c])) for c in s_cols)
        s_sorted = sorted(spark_tbl, key=key)
        d_sorted = sorted(duck, key=key)
        bad = 0
        maxdiff = 0.0
        for sr, dr in zip(s_sorted, d_sorted):
            for c in s_cols:
                a, b = norm(sr[c]), norm(dr[c])
                if isinstance(a, float) and isinstance(b, float):
                    if a != b:
                        maxdiff = max(maxdiff, abs(a - b))
                        bad += 1
                elif isinstance(a, list) and isinstance(b, list):
                    if [norm(x) for x in a] != [norm(x) for x in b]:
                        bad += 1
                elif a != b:
                    bad += 1
        if bad == 0:
            print(f"PASS  {name}: {len(spark_tbl)} rows exact")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {bad} cell mismatches, max float diff "
                  f"{maxdiff:.3e}")
            ex_s, ex_d = None, None
            for sr, dr in zip(s_sorted, d_sorted):
                if any(repr(norm(sr[c])) != repr(norm(dr[c])) for c in s_cols):
                    ex_s, ex_d = sr, dr
                    break
            print(f"      spark: {ex_s}\n      duck : {ex_d}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
