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

Four content tweaks keep derived workloads honest at 10-1000x (replica
0 is ALWAYS the identity, so capped demo rows that filter to low ids
see bit-identical data at every scale):
- documents.text goes through a per-replica WORD cipher (word_cipher_sql):
  each of the corpus' vocabulary words maps to a replica-unique code
  token, so every replica's INTERNAL dup/near-dup graph is exactly
  isomorphic to sf0.1's (a bijection on the token set preserves term
  frequencies, shingle-set Jaccard, and BM25 structure verbatim) while
  replica token NAMESPACES are pairwise disjoint BY CONSTRUCTION up to
  14 741 replicas — so cross-replica shingle collisions are exactly
  zero and the LSH/dedup workload grows with the data, not N^2 by
  corpus construction. This replaces the r9-r14 AFFINE letter cipher
  (i -> (a*i + b) % 26 composed with a digit rotation), which offered
  only 104 distinct letter bijections on this corpus' digitless text:
  replicas r and r+104 carried IDENTICAL text, so the 1000x corpus
  gave every doc ~9 exact cross-replica twins and the third decade was
  text-dishonest (VERDICT r14 "What's missing" #3 / Next #6; the r15
  README documented the bound, this widening removes it).
  tools/text_evidence.py measures the honesty claims per corpus.
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
                                          [tables]
Defaults: /root/testdata/sf0.1 /root/repo/scaledata/sf1 10 (all tables)
`tables` is a comma list (e.g. "documents,embeddings") for mixed-scale
spot corpora: the sf100 TEXT spot scales only the text-band tables
1000x and keeps the relational facts at the sf10 scale already
measured, so the 17+ GB lineitem replication isn't re-paid for rows
that never read it.
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scaledata/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
TABLES = (set(sys.argv[4].split(",")) if len(sys.argv) > 4 else
          {"region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings"})
# far above every key in the source corpus (max l_orderkey ~ 150k,
# user_id ~ 2k, vec_id 2k); also % 50 == 0 and % 10 == 0 so workload
# key-derived features (o_custkey % 50, l_orderkey % 10) keep their
# class structure within each replica
OFFSET = 10_000_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


# The driver corpus' full document vocabulary (31 words, lowercase
# letters only — verified below against the actual source before any
# documents part is written, so a changed driver corpus fails LOUDLY
# instead of silently leaking unciphered tokens across replicas).
VOCAB = sorted([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"])


# Multiplicative scrambler for code payloads: odd and not divisible by
# 13, so it is a unit mod 26^w for every width w — multiplication is a
# BIJECTION on payload space, preserving code uniqueness while
# spreading codes uniformly over the letter alphabet. Without it the
# low sequential integers (r*31+i <= 31k out of 26^4+) zero-pad to
# 'a'-run-degenerate tokens ("xaaab"): every code shares an 'xaa…'
# prefix, which char-level workloads read as massive intra-doc
# repetition — the first r15 corpus measured t_filter_pipeline 13x and
# t_bpe_encode 12x their committed sf10 times on fake repetition/merge
# pathologies, corpus artifacts rather than plan behavior.
MULT = 1_000_003


def word_code(r, i, w):
    """Replica-unique code token for vocabulary word i of replica r.

    'x' + base-26 of ((r*len(VOCAB) + i) * MULT mod 26^width), with
    width = max(len(w), 5) - 1 payload letters. Disjointness is
    structural:
    - codes never equal SOURCE tokens: the source text contains no 'x'
      (checked below), every code starts with one;
    - codes never collide with OTHER codes: same payload length →
      distinct (r, i) → distinct integer → distinct scrambled value
      (MULT is a unit mod 26^width) → distinct base-26 string;
      different payload lengths → different total length;
    - capacity: payload ≥ 4 letters = 456 976 codes per length class
      ≥ 31 × 14 741 replicas (5 codes of headroom at that hard-assert
      bound) — ~15x past the 1000x corpus's 31 000 codes (the affine
      letter cipher this replaces aliased at 104).
    Word LENGTH is preserved for every vocabulary word of ≥ 5 chars
    (16 of 31, incl. the high-frequency ones); shorter words widen to
    5, so per-token hash work grows slightly (conservative: never
    understates text cost)."""
    width = max(len(w), 5) - 1
    space = 26 ** width
    raw = r * len(VOCAB) + i
    assert raw < space, f"replica {r} overflows the {width}-char payload"
    n = raw * MULT % space
    payload = []
    for _ in range(width):
        payload.append(chr(ord("a") + n % 26))
        n //= 26
    return "x" + "".join(reversed(payload))


def word_cipher_sql(r):
    """SQL expression rewriting `text` for replica r: split on single
    spaces, map each vocabulary word through word_code via one CASE,
    re-join. r=0 is the identity (bit-identical text at every scale)."""
    if r == 0:
        return "text"
    cases = " ".join(
        f"WHEN '{w}' THEN '{word_code(r, i, w)}'" for i, w in enumerate(VOCAB))
    return ("array_to_string(list_transform(string_split(text, ' '), "
            f"t -> CASE t {cases} ELSE t END), ' ')")


def assert_vocab_covered():
    """Every source token must be in VOCAB (ELSE t would pass an
    unknown token through IDENTICALLY in all replicas — a silent
    cross-replica shingle leak), and 'x' must not occur in the source
    (it namespaces the code tokens away from replica 0)."""
    bad = con.execute(f"""SELECT DISTINCT tok FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM {src('documents')})
        WHERE tok NOT IN ({','.join("'" + w + "'" for w in VOCAB)})
        LIMIT 5""").fetchall()
    assert not bad, f"source tokens outside the hardcoded VOCAB: {bad}"
    nx = con.execute(f"SELECT count(*) FROM {src('documents')} "
                     "WHERE text LIKE '%x%'").fetchone()[0]
    assert nx == 0, f"{nx} source docs contain 'x' — code-token namespace unsafe"


def write(t, union_sql):
    """Write as a DIRECTORY of one parquet file per replica part — the
    many-files shape a real 10x corpus has. A single 10x file caps the
    scan at ONE Spark partition (maxPartitionBytes never splits a file
    below its size), which serializes every downstream pipeline and
    measures the corpus artifact, not the plan."""
    if t not in TABLES:
        return
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

if "documents" in TABLES:
    assert_vocab_covered()
parts = []
for r in range(REPLICAS):
    parts.append(f"""SELECT doc_id + {r * OFFSET} AS doc_id,
        {word_cipher_sql(r)} AS text, lang, source, n_chars
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
