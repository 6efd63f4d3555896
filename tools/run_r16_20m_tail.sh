#!/usr/bin/env bash
# Round-16: 20M chain tail — ivfpq landing (with the shuffle-GC fix:
# System.gc between the staged write's passes + 120s periodic cleaner)
# then the sims cold/warm probes and the recall frontier. The prefix
# index is already landed (PRELAND_r16_20M prefix ok, 1026 s, peak
# 91.9 GB); the previous ivfpq attempts ENOSPC'd on dead-shuffle
# pile-up (55 GB of blockmgr at peak).
set -uo pipefail
set -x
cd /root/repo

NEED_GB=50
AVAIL_GB=$(df -BG --output=avail / | tail -1 | tr -dc '0-9')
if [ "$AVAIL_GB" -lt "$NEED_GB" ]; then
  echo "REFUSING: need ${NEED_GB} GB free on /, have ${AVAIL_GB} GB."
  du -sh /root/repo/spark-warehouse/graft_ann_* /tmp/scale*d1 /tmp/blockmgr-* 2>/dev/null | sort -rh | head
  exit 2
fi
if pgrep -f "Xmx64g" >/dev/null; then echo "REFUSING: another 64g JVM is running"; exit 2; fi

CLS=/tmp/ann16_classes
rm -rf "$CLS"
cp -r target/scala-2.13/classes "$CLS"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() {
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx$1 \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.sql.objectHashAggregate.sortBased.fallbackThreshold=2097152 \
    -cp "$CLS:/opt/spark/jars/*" "${@:2}"
}

SUF20=$(printf '/tmp/scale10000d1' | md5sum | cut -c1-16)
SAMPLE_PID=""
start_sampler() {
  rm -f /tmp/ann16_peak20 /tmp/ann16_breakdown
  ( while true; do
      U=$(df -k / | tail -1 | awk '{print $3}')
      B=$(du -sk /tmp/blockmgr-* 2>/dev/null | awk '{s+=$1} END {print s+0}')
      W=$(du -sk /root/repo/spark-warehouse 2>/dev/null | awk '{print $1}')
      echo "$U" >> /tmp/ann16_peak20
      echo "$(date +%s) $U $B $W" >> /tmp/ann16_breakdown
      sleep 10
    done ) &
  SAMPLE_PID=$!
}
stop_sampler() {
  kill "$SAMPLE_PID" 2>/dev/null; wait "$SAMPLE_PID" 2>/dev/null
  sort -n /tmp/ann16_peak20 | tail -1 | awk '{printf "%.1f", $1/1048576}'
}

rm -rf "/root/repo/spark-warehouse/graft_ann_ivfpq_$SUF20" \
       "/root/repo/spark-warehouse/graft_ann_pq_codes_$SUF20"

start_sampler; t0=$(date +%s)
if SPARK_GRAFT_PRELAND_KINDS=ivfpq SPARK_GRAFT_PROBE_PARTS=64 \
  run 64g graft.tools.PreLand /tmp/scale10000d1 > /tmp/ann16_preland20m_ivfpq3.log 2>&1; then
  QOK=1; else QOK=0; fi
t1=$(date +%s); QSEC=$((t1-t0)); QPK=$(stop_sampler)
cp /tmp/ann16_breakdown /tmp/ann16_breakdown_ivfpq

cat > /root/repo/PRELAND_r16_20M.json <<EOF
{"corpus": "/tmp/scale10000d1", "vectors": 20000000,
 "landing": "two-pass staged + shuffle-hash assignment join + bounded agg maps; 64 shuffle partitions (32 OOMed the ivfpq encode fold at this decade); dead-shuffle GC between staged-write passes (55 GB of stale blockmgr at peak ENOSPC'd the first two ivfpq attempts)",
 "prefix": {"ok": 1, "sec": 1026, "peak_disk_used_gb": 91.9},
 "ivfpq": {"ok": $QOK, "sec": $QSEC, "peak_disk_used_gb": $QPK},
 "note": "prefix landed on the second attempt (box alone, 74 GB free); ivfpq landed after the shuffle-GC fix with the 19 GB prefix table resident",
 "r15_baseline": "ENOSPC (capacity: other corpora resident)"}
EOF
[ "$QOK" = 1 ] || { echo IVFPQ20M_FAILED; exit 1; }

if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run 64g graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann16_sims20m_cold.log 2>&1; then
  cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r16_20M_sims_cold.json
else echo "20M cold probe FAILED"; fi
if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run 64g graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann16_sims20m_warm.log 2>&1; then
  cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r16_20M_sims_warm.json
else echo "20M warm probe FAILED"; fi

mkdir -p /tmp/ann16q
if SPARK_GRAFT_RERANK_SWEEP=20,60 SPARK_GRAFT_RECALL_OOS_ONLY=1 \
  SPARK_GRAFT_RECALL_NPROBES=1,8,32,140,559 \
  SPARK_GRAFT_RECALL_KINDS=prefix,ivfpq SPARK_GRAFT_PROBE_OUT=/tmp/ann16q \
  run 24g graft.tools.RecallProbe /tmp/scale10000d1 > /tmp/ann16_recall20m.log 2>&1; then
  cp /tmp/ann16q/recall.json /root/repo/RECALL_r16_20M.json
else echo "20M recall FAILED"; fi
echo DONE_R16_20M_TAIL
