#!/usr/bin/env python3
"""Full-precision (bitwise) oracle compare — the DRIVER's standard.

tools/check_oracle.py normalizes floats to 9 significant digits, which
is what let an ulp-level f1 divergence (a7_confusion, rounds 1-2) pass
locally while the driver's full-precision hash failed. This tool makes
the strict comparison runnable locally: every value must be IDENTICAL
(bitwise for floats, modulo NaN==NaN) between the Spark result parquet
and the DuckDB oracle result.

Usage: python3 tools/check_exact.py <sfDir> <verifyOutDir>
"""
import os, sys, json, math, struct
import duckdb

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def dtype_clash(s_dtype, o_dtype):
    """int-vs-float divergence between Spark parquet and oracle .df() dtypes.

    This is the exact lens the driver applies: DuckDB renders HUGEINT /
    DECIMAL aggregate outputs as float64 in pandas, so an oracle column
    that *is* numerically integer still hashes as `4521.0` against
    Spark's `4521`. Value comparison via tolist() cannot see it (Python
    `4521 == 4521.0`), so the dtype kinds are compared directly.
    Returns a message when one side is integer-kind and the other
    float-kind; None otherwise.
    """
    sk, ok = s_dtype.kind, o_dtype.kind
    ints, floats = set('iu'), set('f')
    if (sk in ints and ok in floats) or (sk in floats and ok in ints):
        return f'spark {s_dtype} vs oracle {o_dtype} (cast the oracle, e.g. ::BIGINT)'
    return None


def same(a, b) -> bool:
    """Bitwise-equal for floats (so -0.0 != 0.0, any NaN == any NaN);
    plain equality for everything else."""
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return struct.pack('<d', a) == struct.pack('<d', b)
    return a == b


def main(sf: str, out: str) -> int:
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    con = duckdb.connect()
    for t in TABLES:
        # guard like check_oracle.py: a missing table must not abort the
        # whole run before any comparison happens
        if os.path.exists(f'{sf}/{t}.parquet'):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    n_pass, fails = 0, []
    for name in sorted(oracle):
        try:
            sdf = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            odf = con.execute(oracle[name]).df()
            scols = sorted(sdf.columns)
            if scols != sorted(odf.columns):
                fails.append((name, f'COLS {scols} vs {sorted(odf.columns)}'))
                continue
            s = sdf[scols].sort_values(scols).reset_index(drop=True)
            o = odf[scols].sort_values(scols).reset_index(drop=True)
            if len(s) != len(o):
                fails.append((name, f'ROWS {len(s)} vs {len(o)}'))
                continue
            bad = None
            for c in scols:
                clash = dtype_clash(s[c].dtype, o[c].dtype)
                if clash:
                    bad = f'col {c} DTYPE {clash}'
                    break
            for c in scols if not bad else []:
                for i, (a, b) in enumerate(zip(s[c].tolist(), o[c].tolist())):
                    if not same(a, b):
                        bad = f'col {c} row {i}: {a!r} != {b!r}'
                        break
                if bad:
                    break
            if bad:
                fails.append((name, bad))
            else:
                n_pass += 1
                print(f'  [exact]  {name}: {len(s)} rows x {len(scols)} cols')
        except Exception as e:
            fails.append((name, f'ERR {e}'))
    for n, m in fails:
        print(f'  [FAIL]   {n}: {m}')
    print(f'EXACT_PASS={n_pass} FAIL={len(fails)}')
    return 1 if fails else 0


def selftest() -> int:
    """Deliberate-failure check for the dtype guard: an uncast DuckDB
    sum() output (HUGEINT -> float64 under .df()) against an int64
    Spark-side column MUST be flagged, and the ::BIGINT-cast form must
    pass clean."""
    con = duckdb.connect()
    spark_side = con.execute("SELECT 4521::BIGINT AS n").df()
    uncast = con.execute("SELECT sum(x) AS n FROM (SELECT 4521::INT AS x) t").df()
    cast = con.execute("SELECT sum(x)::BIGINT AS n FROM (SELECT 4521::INT AS x) t").df()
    assert dtype_clash(spark_side['n'].dtype, uncast['n'].dtype), \
        'uncast HUGEINT sum NOT flagged — guard is broken'
    assert dtype_clash(spark_side['n'].dtype, cast['n'].dtype) is None, \
        '::BIGINT-cast sum wrongly flagged'
    print('SELFTEST_PASS: uncast HUGEINT flagged, ::BIGINT-cast clean')
    return 0


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == '--selftest':
        sys.exit(selftest())
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify'
    sys.exit(main(sf, out))
