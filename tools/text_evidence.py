#!/usr/bin/env python3
"""Text-band scale honesty evidence (VERDICT r14 Next #6 follow-through):
verify, per corpus, that the word-cipher replica construction in
make_scale_corpus.py delivers what the third-decade TEXT spot needs —
text workloads whose TRUE input grows with the data, with no
cross-replica aliasing (which understates work: aliased replicas share
shingles, so dedup/LSH/BM25 state stops growing) and no corpus-made
quadratics (exact twins across replicas made pair workloads grow N^2
under the pre-r15 affine cipher at >104 replicas).

Measured per corpus dir (documents.parquet, file or part-directory):
- docs, replicas (from the doc_id // OFFSET key space)
- distinct TOKENS: global vs sum-over-replicas — equal means replica
  token namespaces are pairwise DISJOINT. Token disjointness implies
  word-3-gram SHINGLE disjointness outright (any shingle's tokens pin
  its replica), which is the property the dedup/LSH family keys on.
- per-replica distinct word-3-gram shingles: min == max == the source
  corpus' count means every replica's internal shingle structure is
  ISOMORPHIC to the source (the dup graph neither grows nor collapses
  within a replica).
- global distinct shingles: must equal replicas x per-replica count
  exactly (the two properties above make this an identity; computing
  it exact double-checks both at once).

Usage: text_evidence.py DIR [DIR ...]
Prints one JSON object keyed by dir, with per-decade ratios appended —
the honest reading is distinct shingles growing EXACTLY 10.0x/decade.
"""
import json
import os
import sys

import duckdb

OFFSET = 10_000_000
out = {}
for d in sys.argv[1:]:
    con = duckdb.connect()
    p = f"{d}/documents.parquet"
    docs = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) \
        else f"read_parquet('{p}')"
    n_docs, reps = con.execute(
        f"SELECT count(*), count(DISTINCT doc_id // {OFFSET}) FROM {docs}"
    ).fetchone()
    tok_global, tok_sum = con.execute(f"""
        WITH tok AS (SELECT doc_id // {OFFSET} AS rep,
                            unnest(string_split(text, ' ')) AS t FROM {docs})
        SELECT count(DISTINCT t),
               (SELECT sum(n) FROM
                 (SELECT count(DISTINCT t) AS n FROM tok GROUP BY rep))
        FROM tok""").fetchone()
    # duckdb can't lateral-join generate_series on a column arg: use a
    # constant upper bound (max token count) + an i <= len(t)-2 filter,
    # the same idiom the repo's DuckDB oracle shingle CTE uses.
    cap = con.execute(
        f"SELECT max(len(string_split(text, ' '))) FROM {docs}").fetchone()[0]
    sh_min, sh_max, sh_global = con.execute(f"""
        WITH doc AS (SELECT doc_id // {OFFSET} AS rep,
                            string_split(text, ' ') AS t FROM {docs}),
        sh AS (SELECT rep, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
               FROM doc, generate_series(1, {cap}) AS g(i)
               WHERE i <= len(t) - 2)
        SELECT min(n), max(n), (SELECT count(DISTINCT s) FROM sh)
        FROM (SELECT count(DISTINCT s) AS n FROM sh GROUP BY rep)"""
    ).fetchone()
    out[d] = {
        "docs": n_docs, "replicas": reps,
        "distinct_tokens": tok_global,
        "sum_per_replica_tokens": int(tok_sum),
        "cross_replica_token_overlap": int(tok_sum) - tok_global,
        "per_replica_distinct_shingles_min": sh_min,
        "per_replica_distinct_shingles_max": sh_max,
        "global_distinct_shingles": sh_global,
        "shingle_namespaces_disjoint":
            sh_global == reps * sh_min and sh_min == sh_max,
    }
    con.close()

dirs = list(out)
for i in range(1, len(dirs)):
    a, b = out[dirs[i - 1]], out[dirs[i]]
    b[f"shingles_ratio_vs_{dirs[i-1]}"] = round(
        b["global_distinct_shingles"] / a["global_distinct_shingles"], 3)
print(json.dumps(out, indent=1))
