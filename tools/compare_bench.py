#!/usr/bin/env python3
"""Compare a BENCH JSON artifact against the newest per-query table in
BASELINE.md and flag regressions.

Usage: python3 tools/compare_bench.py BENCH_rN.json [ratio]

The baseline is the last fenced code block in BASELINE.md (the most
recent round's "name seconds" table, three pairs per line). A query is
flagged when bench/baseline > ratio (default 2.0 — the grading bar).
Queries new since the baseline table are listed informationally, never
flagged. Exit 1 iff any query is flagged, so this can gate a script.

With the min-of-2 bench artifact, a flag here is a REAL plan change,
not positional contention — check the JSON's raw_passes to confirm
both passes are slow before hunting a regression.
"""
import json
import re
import sys
from pathlib import Path


def load_baseline(path):
    blocks = re.findall(r"```\n(.*?)```", Path(path).read_text(), re.S)
    table = {}
    for line in blocks[-1].splitlines():
        for name, sec in re.findall(r"(\S+)\s+(\d+\.\d+)", line):
            table[name] = float(sec)
    return table


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    doc = json.loads(Path(sys.argv[1]).read_text())
    if "queries" in doc:
        bench = doc["queries"]
    else:
        # driver-written BENCH_rN.json keeps only a truncated "tail" of
        # the bench line — recover whole "name":seconds pairs from it
        # (raw_passes arrays don't match the scalar pattern)
        bench = {m[0]: float(m[1]) for m in
                 re.findall(r'"(\w+)":(\d+\.\d+)[,}]', doc.get("tail", ""))}
        if not bench:
            # tail may hold only the raw_passes arrays ("name":[a,b]) —
            # the reported number is the min of the warm passes
            bench = {m[0]: min(float(x) for x in m[1].split(",")) for m in
                     re.findall(r'"(\w+)":\[([\d.,]+)\]', doc.get("tail", ""))}
        if not bench:
            sys.exit(f"no per-query numbers found in {sys.argv[1]}")
    ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    base = load_baseline(Path(__file__).resolve().parent.parent / "BASELINE.md")

    flagged, new = [], []
    for name, sec in sorted(bench.items()):
        if name not in base:
            new.append(name)
        elif sec > base[name] * ratio:
            flagged.append((name, sec, base[name]))

    total = sum(bench.values())
    base_total = sum(base[n] for n in bench if n in base)
    if base_total > 0:
        print(f"total {total:.1f}s vs baseline {base_total:.1f}s "
              f"({total / base_total:.2f}x) over {len(bench)} queries")
    else:
        print(f"total {total:.1f}s over {len(bench)} queries "
              f"(no overlap with baseline table)")
    for name in new:
        print(f"  new (no baseline): {name} {bench[name]:.2f}s")
    for name, sec, b in flagged:
        print(f"  FLAG {name}: {sec:.2f}s vs baseline {b:.2f}s ({sec / b:.1f}x)")
    if not flagged:
        print(f"  all queries within {ratio}x of baseline")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
