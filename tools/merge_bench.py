#!/usr/bin/env python3
"""Element-wise MIN-merge of several full graft.Bench sweeps into one
artifact (r12).

Why: the build host shows bursty hypervisor steal (historically ~4%
average, concentrated in multi-minute windows). A 15-minute full sweep
that straddles one of those windows carries 2-7x phantom inflation on
whichever rows ran inside it — the committed r11 file had exactly this
(x_index_append 5.6 s vs a quiet 1.2 s), and two r12 sweeps were hit
in DIFFERENT segments (one at the tail, one at the head). Contention
only ever INFLATES a timing, never deflates it, so the element-wise
minimum across sweeps is the robust estimator — it is also consistent
with the per-row protocol, which is already best-of-N for sub-second
rows.

Non-timing rows: recall/gap metrics are deterministic (asserted equal
across runs); canary_drift is reported as the median across runs (a
merged file has no single sweep for the canary to describe).

Usage: merge_bench.py OUT RUN1.json RUN2.json [RUN3.json ...]
"""
import json
import sys

out_path, run_paths = sys.argv[1], sys.argv[2:]
runs = [json.load(open(p)) for p in run_paths]

# A canary-rejected sweep is self-describing since r14 ("rejected":
# true in the line) — refuse to launder its phantom numbers into a
# merged artifact.
for p, r in zip(run_paths, runs):
    assert not r.get("rejected"), f"{p} is a canary-rejected sweep — re-shoot it"

DETERMINISTIC = (
    "ivf_kmeans_recall_at_1", "ivf_sq8_recall_at_1",
    "ivf_sq8_winner_cos_gap_mean", "ivf_sq8_winner_cos_gap_max",
    "pq_rerank_recall_at_1", "ivfadc_recall_at_1", "filtered_recall_at_1",
)

base = runs[-1]  # key order / metadata from the most recent run

# A sweep missing keys the others carry would silently min over fewer
# runs (or copy a stale base value) — flag it loudly so a partial
# SPARK_GRAFT_BENCH_ONLY run never sneaks into a merged artifact.
for p, r in zip(run_paths, runs):
    missing = [k for k in base["queries"] if k not in r["queries"]]
    if missing:
        print(f"[merge] WARNING: {p} lacks {len(missing)} keys the base "
              f"run carries (e.g. {missing[:3]}) — partial sweep?",
              file=sys.stderr)

merged = {}
for k in base["queries"]:
    # >= 0: a legitimate 0.0 (e.g. a gap metric at perfect recall) must
    # still flow through the DETERMINISTIC equality assertion — the
    # error sentinel is -1.0, not 0.0.
    vals = [r["queries"][k] for r in runs
            if k in r["queries"] and r["queries"][k] >= 0]
    if not vals:
        merged[k] = base["queries"][k]
    elif k in DETERMINISTIC:
        assert max(vals) - min(vals) < 1e-9, f"{k} differs across runs: {vals}"
        merged[k] = vals[0]
    elif k == "canary_drift":
        merged[k] = sorted(vals)[len(vals) // 2]
    else:
        merged[k] = min(vals)


def is_per_query(k):
    """Same key set Bench.scala's total_query_sec sums: the per-query
    rows only — not the stage decomposition (stage_*, incl. the
    microseconds-valued stage_point_lookup_us), the skew harness rows,
    the recall/gap metrics, the canary, or the per-batch ms rows."""
    return not (k.endswith("_per_batch_ms") or k == "canary_drift"
                or k in DETERMINISTIC
                or k.startswith("stage_") or k.startswith("skew_"))


# key order is load-bearing downstream (the archiver keeps the line's
# TAIL): queries first, headline "value" last
doc = dict(base)
doc["queries"] = merged
doc["total_query_sec"] = round(
    sum(v for k, v in merged.items() if is_per_query(k) and v > 0), 2)
doc["merged_runs"] = len(runs)
doc.pop("value", None)
doc["value"] = merged.get("stage_end_to_end", base.get("value"))

with open(out_path, "w") as f:
    json.dump(doc, f, separators=(",", ":"))
    f.write("\n")
print(f"[merge] wrote {out_path}: min over {len(runs)} sweeps, "
      f"headline {doc['value']}")
