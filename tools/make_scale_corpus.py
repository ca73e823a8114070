#!/usr/bin/env python3
"""Build a self-generated 10x corpus (sf1-equivalent) from the driver's
deterministic sf0.1 parquet, for the BENCH_SCALE measurement
(VERDICT r9 Next #1).

Design: each replica r in 0..9 is a self-contained shard —
every entity key (custkey/suppkey/partkey/orderkey/event_id/user_id/
doc_id/vec_id) is shifted by r*OFFSET consistently on both the PK and
every FK, so referential structure, join fan-outs, group sizes and
per-key distributions are exactly sf0.1's, while distinct-key counts
and total rows grow 10x. That is precisely the "same data shape,
10x the data" scaling experiment.

Four content tweaks keep derived workloads honest at 10-100x (replica
0 is ALWAYS the identity, so capped demo rows that filter to low ids
see bit-identical data at every scale):
- documents.text goes through a per-replica AFFINE letter cipher
  (i -> (a*i + b) % 26, a in {1,3,5,7} by r//26, b = r % 26 — 104
  distinct bijections, see caesar_pair) composed with a digit rotation
  (r % 10): each replica's INTERNAL dup/near-dup graph is isomorphic
  to sf0.1's, with zero cross-replica token collisions for r < 104
  (a plain letter rotation wrapped at 26 and collided at the 100x
  corpus) — without this every doc would have N-1 exact twins and the
  LSH pair workload would grow N^2 by corpus construction, not by
  algorithm behavior.
- embeddings get a deterministic per-dimension, per-replica jitter
  (+0.1*sin(r*131 + i*17), ~30% of the component scale): replicas are
  similar-but-distinct vectors that spread across SRP/LSH buckets the
  way genuinely new data does. A constant per-replica offset left all
  replicas in the SAME buckets and made bucketed-ANN pair work grow
  N^2 (t_ann_bucket_top1 measured 38x at 10x, the r10 sf10 run).
- events shift each replica into its own 31-day time band: replicated
  IDENTICAL timestamps multiply per-window density by N, turning every
  time-range join quadratic by construction (j10_range_join measured
  30x at 10x); banded time keeps window density constant, which is how
  real event streams grow.

region/nation are fixed dimension domains and stay single-copy
(scale grows facts, not countries); nationkeys are NOT shifted.

Usage: python3 tools/make_scale_corpus.py [src_dir] [out_dir] [replicas]
Defaults: /root/testdata/sf0.1 /root/repo/scaledata/sf1 10
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scaledata/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# far above every key in the source corpus (max l_orderkey ~ 150k,
# user_id ~ 2k, vec_id 2k); also % 50 == 0 and % 10 == 0 so workload
# key-derived features (o_custkey % 50, l_orderkey % 10) keep their
# class structure within each replica
OFFSET = 10_000_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def caesar_pair(r):
    """translate() from/to alphabets via an AFFINE cipher on letters:
    index i -> (a*i + b) % 26 with a = one of four units mod 26 chosen
    by r//26 and b = r%26 — 104 distinct letter bijections. Two
    distinct affine maps agree on at most TWO letters, and only on a
    pair exactly 13 apart ((a1-a2)(i1-i2) = 0 mod 26 with a1-a2 in
    {2,4,6} forces i1-i2 = 13; none at all when only b differs), so up
    to 104 replicas have zero cross-replica collisions for any token
    whose distinct letters are not one such 13-apart pair, even on
    digitless text (a plain rotation wraps at 26 and gave r, r+26, ...
    identical mappings — caught at the 100x corpus). Digits rotate by
    r % 10 on top. r=0 is the identity (a=1, b=0)."""
    lower = "abcdefghijklmnopqrstuvwxyz"
    digits = "0123456789"
    a = [1, 3, 5, 7][(r // 26) % 4]
    b = r % 26
    lo_to = "".join(lower[(a * i + b) % 26] for i in range(26))
    frm = lower + lower.upper() + digits
    to = lo_to + lo_to.upper() + (digits[r % 10:] + digits[:r % 10])
    return frm, to


def write(t, union_sql):
    """Write as a DIRECTORY of one parquet file per replica part — the
    many-files shape a real 10x corpus has. A single 10x file caps the
    scan at ONE Spark partition (maxPartitionBytes never splits a file
    below its size), which serializes every downstream pipeline and
    measures the corpus artifact, not the plan."""
    path = f"{OUT}/{t}.parquet"
    os.makedirs(path, exist_ok=True)
    for i, part_sql in enumerate(union_sql if isinstance(union_sql, list) else [union_sql]):
        con.execute(f"COPY ({part_sql}) TO '{path}/part-{i:03d}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{path}/*.parquet')").fetchone()[0]
    print(f"[scale] {t}: {n} rows -> {path}")


# fixed dimensions: single copy
write("region", f"SELECT * FROM {src('region')}")
write("nation", f"SELECT * FROM {src('nation')}")

parts = []
for r in range(REPLICAS):
    o = r * OFFSET
    parts.append(f"""SELECT c_custkey + {o} AS c_custkey, c_name, c_nationkey,
        c_acctbal, c_mktsegment FROM {src('customer')}""")
write("customer", parts)

parts = [f"""SELECT s_suppkey + {r * OFFSET} AS s_suppkey, s_name, s_nationkey,
    s_acctbal FROM {src('supplier')}""" for r in range(REPLICAS)]
write("supplier", parts)

parts = [f"""SELECT p_partkey + {r * OFFSET} AS p_partkey, p_name, p_brand,
    p_type, p_size, p_retailprice FROM {src('part')}""" for r in range(REPLICAS)]
write("part", parts)

parts = [f"""SELECT o_orderkey + {r * OFFSET} AS o_orderkey,
    o_custkey + {r * OFFSET} AS o_custkey, o_orderstatus, o_totalprice,
    o_orderdate, o_orderpriority FROM {src('orders')}""" for r in range(REPLICAS)]
write("orders", parts)

parts = [f"""SELECT l_orderkey + {r * OFFSET} AS l_orderkey,
    l_partkey + {r * OFFSET} AS l_partkey,
    l_suppkey + {r * OFFSET} AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}"""
         for r in range(REPLICAS)]
write("lineitem", parts)

parts = [f"""SELECT event_id + {r * OFFSET} AS event_id,
    ts + INTERVAL {r * 31} DAY AS ts,
    user_id + {r * OFFSET} AS user_id, event_type, value, props
    FROM {src('events')}""" for r in range(REPLICAS)]
write("events", parts)

parts = []
for r in range(REPLICAS):
    frm, to = caesar_pair(r)
    parts.append(f"""SELECT doc_id + {r * OFFSET} AS doc_id,
        translate(text, '{frm}', '{to}') AS text, lang, source, n_chars
        FROM {src('documents')}""")
write("documents", parts)

parts = [f"""SELECT vec_id + {r * OFFSET} AS vec_id,
    CASE WHEN {r} = 0 THEN embedding ELSE
      list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
        z -> CAST(z[1] + 0.1 * sin(CAST({r} * 131 + z[2] * 17 AS DOUBLE)) AS FLOAT))
    END AS embedding,
    label FROM {src('embeddings')}""" for r in range(REPLICAS)]
write("embeddings", parts)

print("[scale] done")
