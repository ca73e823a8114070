#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and
<verifyOutDir>/oracle_sql.json, runs the oracle SQL in DuckDB over the
parquet tables in <sfDir>, and compares: schema (column names sorted),
row count, and a hash of the value matrix with columns sorted by name
and rows sorted lexicographically. Floats are compared with rounding to
9 significant digits to mirror a tolerance-style hash.
"""
import sys, os, json, glob, math, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in mat:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = n_noracle = 0
    seen = set()
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        seen.add(name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(d)
        s_cols = list(tbl.column_names)
        s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(s_rows)} rows")
            n_noracle += 1
            continue
        try:
            res = con.execute(oracle[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"  [FAIL]   {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok_schema = sorted(s_cols) == sorted(d_cols)
        ok_count = len(s_rows) == len(d_rows)
        sh, dh = frame_hash(s_cols, s_rows), frame_hash(d_cols, d_rows)
        if ok_schema and ok_count and sh == dh:
            print(f"  [ok]     {name}: {len(s_rows)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  [FAIL]   {name}: schema={ok_schema} ({sorted(s_cols)} vs {sorted(d_cols)}) "
                  f"count={len(s_rows)}/{len(d_rows)} hash={sh}/{dh}")
            if ok_schema and len(s_rows) and len(d_rows):
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ms = sorted(tuple(norm_val(r[i]) for i in order_s) for r in s_rows)
                md = sorted(tuple(norm_val(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ms[:2000], md[:2000]):
                    if a != b:
                        print(f"      spark:  {a}\n      duckdb: {b}")
                        break
    # A query that crashed Spark-side leaves no output directory — that is
    # a FAIL, not a skip. Declared set = queries.json manifest if present,
    # else at minimum every oracle key.
    declared = set(oracle)
    mpath = os.path.join(out_dir, "queries.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            declared |= set(json.load(f))
    for name in sorted(declared - seen):
        print(f"  [FAIL]   {name}: declared but no output directory (query crashed?)")
        n_fail += 1
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
