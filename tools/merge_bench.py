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

DETERMINISTIC = (
    "ivf_kmeans_recall_at_1", "ivf_sq8_recall_at_1",
    "ivf_sq8_winner_cos_gap_mean", "ivf_sq8_winner_cos_gap_max",
    "pq_rerank_recall_at_1", "ivfadc_recall_at_1", "filtered_recall_at_1",
)

base = runs[-1]  # key order / metadata from the most recent run
merged = {}
for k in base["queries"]:
    vals = [r["queries"][k] for r in runs
            if k in r["queries"] and r["queries"][k] > 0]
    if not vals:
        merged[k] = base["queries"][k]
    elif k in DETERMINISTIC:
        assert max(vals) - min(vals) < 1e-9, f"{k} differs across runs: {vals}"
        merged[k] = vals[0]
    elif k == "canary_drift":
        merged[k] = sorted(vals)[len(vals) // 2]
    else:
        merged[k] = min(vals)

# key order is load-bearing downstream (the archiver keeps the line's
# TAIL): queries first, headline "value" last
doc = dict(base)
doc["queries"] = merged
doc["total_query_sec"] = round(
    sum(v for k, v in merged.items()
        if not k.endswith("_per_batch_ms") and k != "canary_drift"
        and k not in DETERMINISTIC and v > 0), 2)
doc["merged_runs"] = len(runs)
doc.pop("value", None)
doc["value"] = merged.get("stage_end_to_end", base.get("value"))

with open(out_path, "w") as f:
    json.dump(doc, f, separators=(",", ":"))
    f.write("\n")
print(f"[merge] wrote {out_path}: min over {len(runs)} sweeps, "
      f"headline {doc['value']}")
