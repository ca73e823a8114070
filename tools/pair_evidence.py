#!/usr/bin/env python3
"""t_frequent_pairs scale evidence (VERDICT r13 Next #1): measure the
query's TRUE input — the i<j pair rows the streaming pass emits — and
the pair group-by's key space, per decade, straight from the parquet
with DuckDB. The streaming pass emits C(min(k, cap), 2) pairs per
basket where k = distinct partkeys in the basket and cap = 32
(ExtraQueries.MaxBasket), dedup included; the group-by then aggregates
those rows over the distinct-(a, b) key space. If pair rows and key
space grow ~10x per decade, the 11.6x time ratio is a ~1.16x/decade
constant on a linear plan (shuffle + hash-agg growth), not a
complexity defect.

Usage: pair_evidence.py DIR [DIR ...]   (each DIR holds lineitem.parquet)
Prints one JSON object keyed by dir.
"""
import json
import sys

import duckdb

CAP = 32
out = {}
for d in sys.argv[1:]:
    con = duckdb.connect()
    li = f"read_parquet('{d}/lineitem.parquet/*.parquet')" \
        if __import__('os').path.isdir(f"{d}/lineitem.parquet") else None
    if li is None:
        li = f"read_parquet('{d}/lineitem.parquet')"
    baskets, pair_rows = con.execute(f"""
        SELECT count(*),
               sum(CAST(least(k, {CAP}) * (least(k, {CAP}) - 1) / 2 AS BIGINT))
        FROM (SELECT count(DISTINCT l_partkey) AS k FROM {li}
              GROUP BY l_orderkey)""").fetchone()
    # the group-by key space: distinct (a, b) pairs with a < b, a and b
    # in the same basket (cap never binds on this corpus: baskets <= 13)
    distinct_pairs = con.execute(f"""
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM {li})
        SELECT count(*) FROM (
          SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
          FROM d x JOIN d y
            ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)
        """).fetchone()[0]
    out[d] = {"baskets": baskets, "pair_rows": int(pair_rows),
              "distinct_pairs": int(distinct_pairs)}
    con.close()

dirs = list(out)
for i in range(1, len(dirs)):
    a, b = out[dirs[i - 1]], out[dirs[i]]
    b[f"pair_rows_ratio_vs_{dirs[i-1]}"] = round(
        b["pair_rows"] / a["pair_rows"], 3)
    b[f"distinct_pairs_ratio_vs_{dirs[i-1]}"] = round(
        b["distinct_pairs"] / a["distinct_pairs"], 3)
print(json.dumps(out, indent=1))
