#!/usr/bin/env python3
"""Per-stage shuffle summary from a Spark event log (round 17: the
'encode is shuffle-free' evidence). Usage: eventlog_shuffle.py <eventlog-file>
Prints one JSON object: total shuffle write/read bytes and the top
stages by shuffle write."""
import json
import sys

path = sys.argv[1]
stages = []
with open(path) as f:
    for line in f:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") != "SparkListenerStageCompleted":
            continue
        info = ev["Stage Info"]
        w = r = 0
        for acc in info.get("Accumulables", []):
            if acc.get("Name") == "internal.metrics.shuffle.write.bytesWritten":
                w = int(acc.get("Value", 0))
            elif acc.get("Name") == "internal.metrics.shuffle.read.remoteBytesRead":
                r += int(acc.get("Value", 0))
            elif acc.get("Name") == "internal.metrics.shuffle.read.localBytesRead":
                r += int(acc.get("Value", 0))
        stages.append({
            "stage": info["Stage ID"],
            "name": info.get("Stage Name", "")[:80],
            "shuffle_write_mb": round(w / 1048576, 1),
            "shuffle_read_mb": round(r / 1048576, 1),
        })

top = sorted(stages, key=lambda s: -s["shuffle_write_mb"])[:8]
print(json.dumps({
    "stages": len(stages),
    "total_shuffle_write_gb": round(sum(s["shuffle_write_mb"] for s in stages) / 1024, 2),
    "total_shuffle_read_gb": round(sum(s["shuffle_read_mb"] for s in stages) / 1024, 2),
    "top_write_stages": top,
}))
