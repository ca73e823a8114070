#!/usr/bin/env python3
"""Bitwise compare two graft.Verify output dirs (determinism audit).

Catches run-to-run nondeterminism (double summation order, shuffle
arrival) and partition-layout sensitivity — the silent killers of a
full-precision hash gate. Usage:

  # run-to-run: two fresh Verify runs, same settings
  python3 tools/compare_runs.py /tmp/det_a /tmp/det_b

  # partition invariance: one run at 32, one at SPARK_GRAFT_CPUS=7
  python3 tools/compare_runs.py /tmp/det_32 /tmp/det_7 --skip-timing

--skip-timing excludes the wall-clock columns of the rows-only timing
reports (x_report stage latencies, x_width_stress.fit_sec), which are
expected to differ.
"""
import os, sys, math, struct
import duckdb

TIMING_COLS = {'end_to_end_s', 'featurize_s', 'translate_s', 'score_s',
               'spread_s', 'fit_sec'}


def same(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return struct.pack('<d', a) == struct.pack('<d', b)
    return a == b


def main(a: str, b: str, skip_timing: bool) -> int:
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    diffs = []
    for name in names:
        try:
            da = con.execute(f"SELECT * FROM '{a}/{name}/*.parquet'").df()
            db = con.execute(f"SELECT * FROM '{b}/{name}/*.parquet'").df()
            drop = TIMING_COLS if skip_timing else set()
            cols = sorted(set(da.columns) - drop)
            if cols != sorted(set(db.columns) - drop):
                diffs.append((name, f'COLS {cols} vs {sorted(set(db.columns) - drop)}'))
                continue
            sa = da[cols].sort_values(cols).reset_index(drop=True)
            sb = db[cols].sort_values(cols).reset_index(drop=True)
            if len(sa) != len(sb):
                diffs.append((name, f'ROWS {len(sa)} vs {len(sb)}'))
                continue
            bad = None
            for c in cols:
                la, lb = sa[c].tolist(), sb[c].tolist()
                for i, (x, y) in enumerate(zip(la, lb)):
                    if not same(x, y):
                        bad = f'col {c} row {i}: {x!r} vs {y!r}'
                        break
                if bad:
                    break
            if bad:
                diffs.append((name, bad))
        except Exception as e:
            diffs.append((name, f'ERR {e}'))
    for n, m in diffs:
        print(f'  [DIFF]   {n}: {m}')
    print(f'compared {len(names)} queries: SAME={len(names) - len(diffs)} DIFF={len(diffs)}')
    return 1 if diffs else 0


if __name__ == '__main__':
    args = [x for x in sys.argv[1:] if not x.startswith('--')]
    sys.exit(main(args[0], args[1], '--skip-timing' in sys.argv))
