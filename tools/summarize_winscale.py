#!/usr/bin/env python3
"""Summarize a WinScaleProbe artifact: throughput, per-batch cost
flatness (last-quarter vs first-quarter mean trigger ms, skipping the
warmup batch), peak/final state, parity, restart stats if present.
Usage: summarize_winscale.py WINSCALE_*.json"""
import json, sys

for path in sys.argv[1:]:
    d = json.load(open(path))
    print(f"== {path}")
    meta = {k: v for k, v in d.items() if not isinstance(v, dict)}
    print(f"   {meta}")
    for kind, r in d.items():
        if not isinstance(r, dict):
            continue
        b = [x for x in r.get("batches", []) if x["rows"] > 100]
        ms = [x["ms"] for x in b]
        q = max(1, len(ms) // 4)
        flat = (sum(ms[-q:]) / q) / (sum(ms[1:1 + q]) / q) if len(ms) > q + 1 else float("nan")
        state = [x["stateRows"] for x in b]
        print(f"   {kind}: wall={r['wall_sec']}s batches={r['n_batches']} "
              f"rows/s={r['rows_per_sec']:,} peak_state={r['peak_state_rows']:,} "
              f"final_state={state[-1] if state else 0:,}")
        print(f"     per-batch ms: first={ms[0] if ms else 0} "
              f"median={sorted(ms)[len(ms)//2] if ms else 0} max={max(ms) if ms else 0}; "
              f"lastQ/firstQ(flatness)={flat:.2f}")
        p = r.get("parity", {})
        print(f"     parity: streamed={p.get('streamed'):,} batch={p.get('batch'):,} "
              f"mismatched={p.get('mismatched')} match={p.get('match')}")
        if "restart" in r:
            print(f"     restart: {r['restart']}")
