#!/usr/bin/env bash
# Round-17: re-land the 20M composed IVF+PQ index under the codegen
# encode + assignment-reuse landing (VERDICT r16 #1), calibrate the
# serving depth (VERDICT r16 #3), then re-measure the serving frontier:
#  1. PRELAND_r17_20M: drop + re-land ivfpq at 20M. r16 took 1656 s at
#     ~92 GB peak (encode fold = 2 corpus shuffles + corpus-wide
#     re-quantization); the r17 landing reads assignments back from the
#     landed prefix index (column-pruned) and encodes per-row in
#     whole-stage codegen — expected scan-bound. Event log records the
#     per-stage shuffle as evidence.
#  2. Calibration runs inside PreLand (both 20M and 2M corpora get a
#     servedNprobe sidecar).
#  3. PROBE_r17_20M_sims_{cold,warm}: sim2b/sim4b/sim4c at the NEW
#     engine default depth (sim4c previously served at nprobe=559=√K
#     where composed tied flat ADC).
#  4. RECALL_r17_20M: OOS recall sweep (unchanged grid, audits the
#     curve the calibrated default was derived from).
#  5. RATESERVE_r17: co-served prefix+ivfpq on the 2M corpus at the
#     calibrated default depth — the >= 4 qps gate.
set -uo pipefail
set -x
cd /root/repo

NEED_GB=30
AVAIL_GB=$(df -BG --output=avail / | tail -1 | tr -dc '0-9')
if [ "$AVAIL_GB" -lt "$NEED_GB" ]; then
  echo "REFUSING: need ${NEED_GB} GB free on /, have ${AVAIL_GB} GB."
  du -sh /root/repo/spark-warehouse/graft_ann_* /tmp/scale*d1 /tmp/blockmgr-* 2>/dev/null | sort -rh | head
  exit 2
fi
[ -e /tmp/scale10000d1/embeddings.parquet ] || { echo "REFUSING: 20M corpus missing"; exit 2; }
[ -e /tmp/scale1000d1/embeddings.parquet ] || { echo "REFUSING: 2M corpus missing"; exit 2; }
if pgrep -f "Xmx64g" >/dev/null; then echo "REFUSING: another 64g JVM is running"; exit 2; fi

CLS=/tmp/ann17_classes
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
  rm -f /tmp/ann17_peak /tmp/ann17_breakdown
  ( while true; do
      U=$(df -k / | tail -1 | awk '{print $3}')
      B=$(du -sk /tmp/blockmgr-* 2>/dev/null | awk '{s+=$1} END {print s+0}')
      W=$(du -sk /root/repo/spark-warehouse 2>/dev/null | awk '{print $1}')
      echo "$U" >> /tmp/ann17_peak
      echo "$(date +%s) $U $B $W" >> /tmp/ann17_breakdown
      sleep 5
    done ) &
  SAMPLE_PID=$!
}
stop_sampler() {
  kill "$SAMPLE_PID" 2>/dev/null; wait "$SAMPLE_PID" 2>/dev/null
  sort -n /tmp/ann17_peak | tail -1 | awk '{printf "%.1f", $1/1048576}'
}

# ---- 1: re-land 20M ivfpq under the r17 landing ----------------------
rm -rf "/root/repo/spark-warehouse/graft_ann_ivfpq_$SUF20" \
       "/root/repo/spark-warehouse/graft_ann_ivfpq_${SUF20}__tombs"
rm -rf /tmp/graft-eventlog && mkdir -p /tmp/graft-eventlog
start_sampler; t0=$(date +%s)
if SPARK_GRAFT_PRELAND_KINDS=ivfpq SPARK_GRAFT_PROBE_PARTS=64 \
  SPARK_GRAFT_EVENTLOG=1 \
  run 64g graft.tools.PreLand /tmp/scale10000d1 > /tmp/ann17_preland20m_ivfpq.log 2>&1; then
  QOK=1; else QOK=0; fi
t1=$(date +%s); QSEC=$((t1-t0)); QPK=$(stop_sampler)
CAL20=$(grep -oP 'calibrated servedNprobe=\K[0-9]+' /tmp/ann17_preland20m_ivfpq.log || echo null)
EVLOG=$(ls -t /tmp/graft-eventlog/* 2>/dev/null | head -1)
SHUF=$(python3 tools/eventlog_shuffle.py "$EVLOG" 2>/dev/null || echo '{}')
cat > /root/repo/PRELAND_r17_20M.json <<EOF
{"corpus": "/tmp/scale10000d1", "vectors": 20000000, "kind": "ivfpq",
 "landing": "r17: assignment reuse from the landed prefix index (column-pruned read, no corpus re-quantization) + codegen per-row PQ encode (no encode shuffle); 64 shuffle partitions",
 "ivfpq": {"ok": $QOK, "sec": $QSEC, "peak_disk_used_gb": $QPK},
 "calibrated_served_nprobe": $CAL20,
 "shuffle_by_stage": $SHUF,
 "r16_baseline": {"sec": 1656, "peak_disk_used_gb": 92.0, "note": "encode fold = explode+join+max_by groupBy + vec_id repartition + collect_list fold; corpus-wide rankedPrefix re-quantization"}}
EOF
[ "$QOK" = 1 ] || { echo IVFPQ20M_FAILED; cat /tmp/ann17_preland20m_ivfpq.log | tail -30; exit 1; }

# ---- 2: calibrate the 2M corpus (tables already landed; fast) --------
if SPARK_GRAFT_PRELAND_KINDS=ivfpq SPARK_GRAFT_PROBE_PARTS=32 \
  run 24g graft.tools.PreLand /tmp/scale1000d1 > /tmp/ann17_preland2m.log 2>&1; then
  echo "2M calibration ok"; else echo "2M calibration FAILED"; fi
CAL2=$(grep -oP 'calibrated servedNprobe=\K[0-9]+' /tmp/ann17_preland2m.log || echo null)

# ---- 3: 20M serving probes (cold then warm) --------------------------
for PASS in cold warm; do
  if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
    SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
    run 64g graft.tools.ScaleProbe 10 \
      sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
    > /tmp/ann17_sims20m_$PASS.log 2>&1; then
    cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r17_20M_sims_$PASS.json
  else echo "20M $PASS probe FAILED"; fi
done

# ---- 4: OOS recall sweep (same grid as r16) --------------------------
mkdir -p /tmp/ann17q
if SPARK_GRAFT_RERANK_SWEEP=20,60 SPARK_GRAFT_RECALL_OOS_ONLY=1 \
  SPARK_GRAFT_RECALL_NPROBES=1,8,32,140,559 \
  SPARK_GRAFT_RECALL_KINDS=prefix,ivfpq SPARK_GRAFT_PROBE_OUT=/tmp/ann17q \
  run 24g graft.tools.RecallProbe /tmp/scale10000d1 > /tmp/ann17_recall20m.log 2>&1; then
  cp /tmp/ann17q/recall.json /root/repo/RECALL_r17_20M.json
else echo "20M recall FAILED"; fi

# ---- 5: co-served rate probe at the calibrated default ---------------
export SPARK_GRAFT_PROBE_OUT=/tmp/ann17q
if SPARK_GRAFT_SERVE_KIND=prefix+ivfpq SPARK_GRAFT_SERVE_RATES=64,4 \
  SPARK_GRAFT_SERVE_SEC=120 SPARK_GRAFT_RATE_TAG=r17fair64i4npdef \
  run 24g graft.tools.RateServeProbe /tmp/scale1000d1 \
  > /tmp/ann17_rate_fair64i4.log 2>&1; then
  cp /tmp/ann17q/RATESERVE_r17fair64i4npdef_*_mixed.json /root/repo/
else echo "RATESERVE default-depth arm FAILED"; fi

echo "CAL20=$CAL20 CAL2=$CAL2"
echo DONE_R17_20M
