#!/usr/bin/env bash
# Round-17: 40M retry under the WAVE landing. The first attempt
# (run_r17_40m.sh) ENOSPC'd at 93 GB used mid pass-1: corpus disk-cache
# (~18 GB) + ranking shuffles (~20) + corpus join shuffle (~22) +
# bucket repartition shuffle + staging all coexisted. The wave mode
# (SPARK_GRAFT_LAND_WAVES) broadcasts bounded assignment slices so the
# corpus never shuffles, drops the corpus cache after the assignment
# checkpoint, and reclaims each wave's shuffle before the next starts:
# predicted pass-1 peak ≈ base 26 + staging 38 + wave shuffle 5 ≈ 73 GB
# of the 96 GB box. Corpus scale20000d1 already generated (_done).
set -uo pipefail
set -x
cd /root/repo

SUF40=$(printf '/tmp/scale20000d1' | md5sum | cut -c1-16)
if pgrep -f "graft.tools" >/dev/null; then echo "REFUSING: probe JVM running"; exit 2; fi
[ -e /tmp/scale20000d1/_done ] || { echo "REFUSING: 40M corpus missing"; exit 2; }
AVAIL_GB=$(df -BG --output=avail / | tail -1 | tr -dc '0-9')
[ "$AVAIL_GB" -ge 64 ] || { echo "REFUSING: need 64 GB free, have ${AVAIL_GB}"; exit 2; }

# partial state from the failed attempt (no marker was written; the
# trained quantizer sidecar is KEPT — retraining is deterministic but
# costs a corpus pass)
rm -rf "spark-warehouse/graft_ann_index_$SUF40" "spark-warehouse/graft_ann_index_${SUF40}__tombs" \
       "spark-warehouse/graft_ann_ivfpq_$SUF40" spark-warehouse/*__landstage

CLS=/tmp/ann17c_classes
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
    -Dspark.io.compression.codec=zstd \
    -cp "$CLS:/opt/spark/jars/*" "${@:2}"
}

SAMPLE_PID=""
start_sampler() {
  rm -f /tmp/ann17c_peak /tmp/ann17c_breakdown
  ( while true; do
      U=$(df -k / | tail -1 | awk '{print $3}')
      B=$(du -sk /tmp/blockmgr-* 2>/dev/null | awk '{s+=$1} END {print s+0}')
      W=$(du -sk /root/repo/spark-warehouse 2>/dev/null | awk '{print $1}')
      echo "$U" >> /tmp/ann17c_peak
      echo "$(date +%s) $U $B $W" >> /tmp/ann17c_breakdown
      sleep 5
    done ) &
  SAMPLE_PID=$!
}
stop_sampler() {
  kill "$SAMPLE_PID" 2>/dev/null; wait "$SAMPLE_PID" 2>/dev/null
  sort -n /tmp/ann17c_peak | tail -1 | awk '{printf "%.1f", $1/1048576}'
}

start_sampler; t0=$(date +%s)
if SPARK_GRAFT_PRELAND_KINDS=prefix SPARK_GRAFT_PROBE_PARTS=128 \
  SPARK_GRAFT_LAND_WAVES=6 SPARK_GRAFT_LAND_CHUNKS=8 \
  run 64g graft.tools.PreLand /tmp/scale20000d1 > /tmp/ann17_preland40m_prefix2.log 2>&1; then
  P40=1; else P40=0; fi
t1=$(date +%s); P40S=$((t1-t0)); P40PK=$(stop_sampler)
cp /tmp/ann17c_breakdown /tmp/ann17c_breakdown_prefix 2>/dev/null || true

QOK=0; QSEC=null; QPK=null; CAL40=null
if [ "$P40" = 1 ]; then
  start_sampler; t0=$(date +%s)
  if SPARK_GRAFT_PRELAND_KINDS=ivfpq SPARK_GRAFT_PROBE_PARTS=128 \
    run 64g graft.tools.PreLand /tmp/scale20000d1 > /tmp/ann17_preland40m_ivfpq2.log 2>&1; then
    QOK=1; else QOK=0; fi
  t1=$(date +%s); QSEC=$((t1-t0)); QPK=$(stop_sampler)
  CAL40=$(grep -oP 'calibrated servedNprobe=\K[0-9]+' /tmp/ann17_preland40m_ivfpq2.log || echo null)
fi
cat > /root/repo/PRELAND_r17_40M.json <<EOF
{"corpus": "/tmp/scale20000d1", "vectors": 40000000,
 "landing": "r17 retry: WAVE pass-1 (6 bounded-broadcast assignment slices - corpus never shuffles, corpus cache dropped after the assignment checkpoint) + chunked pass-2 (8 bucket groups), zstd shuffle, 128 shuffle partitions; ivfpq = assignment reuse + codegen encode",
 "prefix": {"ok": $P40, "sec": $P40S, "peak_disk_used_gb": $P40PK},
 "ivfpq": {"ok": $QOK, "sec": $QSEC, "peak_disk_used_gb": $QPK},
 "calibrated_served_nprobe": $CAL40,
 "first_attempt": {"ok": 0, "sec": 2780, "peak_disk_used_gb": 93.0,
   "note": "single-pass shuffle-hash pass-1 ENOSPC'd: corpus disk-cache ~18 GB + ranking shuffles ~20 + corpus join shuffle ~22 + bucket repartition shuffle + staging -> ~2.5x at-rest live at once; the chunked pass-2 fix addressed the wrong stage at this decade"},
 "r16_baseline": "not attempted (2x staged write alone = 76 GB; box cannot hold it)"}
EOF
[ "$P40" = 1 ] || { echo PREFIX40M_FAILED; tail -30 /tmp/ann17_preland40m_prefix2.log; exit 1; }
[ "$QOK" = 1 ] || { echo IVFPQ40M_FAILED; tail -30 /tmp/ann17_preland40m_ivfpq2.log; exit 1; }

for PASS in cold warm; do
  if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
    SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale20000d1 \
    run 64g graft.tools.ScaleProbe 20 \
      sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
    > /tmp/ann17_sims40m_$PASS.log 2>&1; then
    cp /tmp/scale20000d1/probe.json /root/repo/PROBE_r17_40M_sims_$PASS.json
  else echo "40M $PASS probe FAILED"; tail -5 /tmp/ann17_sims40m_$PASS.log; fi
done

mkdir -p /tmp/ann17q
if SPARK_GRAFT_RERANK_SWEEP=20,60 SPARK_GRAFT_RECALL_OOS_ONLY=1 \
  SPARK_GRAFT_RECALL_NPROBES=1,8,32,198,791 \
  SPARK_GRAFT_RECALL_KINDS=prefix,ivfpq SPARK_GRAFT_PROBE_OUT=/tmp/ann17q \
  run 24g graft.tools.RecallProbe /tmp/scale20000d1 > /tmp/ann17_recall40m.log 2>&1; then
  cp /tmp/ann17q/recall.json /root/repo/RECALL_r17_40M.json
else echo "40M recall FAILED"; tail -5 /tmp/ann17_recall40m.log; fi

echo "CAL40=$CAL40"
echo DONE_R17_40M_RETRY
