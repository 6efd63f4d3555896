#!/usr/bin/env bash
# Round-16: 20M prefix-landing retry + the probe/recall tail. The first
# r16 attempt ENOSPC'd at 93 GB used: the 20M transient is ~68 GB
# (superlinear vs the 10M's ~20 GB — the staged write holds staging +
# final table + assignment shuffle simultaneously at this scale), and a
# concurrent Verify run ate the margin. This retry runs ALONE (refuses
# if another big JVM is up), with ~5 GB more freed, and samples a
# transient BREAKDOWN (blockmgr vs warehouse) for PLANS.md.
set -uo pipefail
set -x
cd /root/repo

NEED_GB=66
AVAIL_GB=$(df -BG --output=avail / | tail -1 | tr -dc '0-9')
if [ "$AVAIL_GB" -lt "$NEED_GB" ]; then
  echo "REFUSING: need ${NEED_GB} GB free on /, have ${AVAIL_GB} GB."
  du -sh /root/repo/spark-warehouse/graft_ann_* /tmp/scale*d1 /tmp/blockmgr-* 2>/dev/null | sort -rh | head
  exit 2
fi
[ -e /tmp/scale10000d1/embeddings.parquet ] || { echo "REFUSING: corpus missing"; exit 2; }
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
# breakdown sampler: used-GB total, blockmgr GB, warehouse GB
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

# clean the failed prefix attempt's partial state (keep ivfpq + fine +
# quantizer if the ivfpq landing succeeded)
rm -rf "/root/repo/spark-warehouse/graft_ann_index_$SUF20" \
       "/root/repo/spark-warehouse/graft_ann_index_${SUF20}__tombs"

start_sampler; t0=$(date +%s)
if SPARK_GRAFT_PRELAND_KINDS=prefix SPARK_GRAFT_PROBE_PARTS=64 \
  run 64g graft.tools.PreLand /tmp/scale10000d1 > /tmp/ann16_preland20m_prefix2.log 2>&1; then
  P20=1; else P20=0; fi
t1=$(date +%s); P20S=$((t1-t0)); P20PK=$(stop_sampler)
cp /tmp/ann16_breakdown /tmp/ann16_breakdown_prefix

# merge with the ivfpq result from the first chain (written by
# run_r16_20m.sh before it was superseded; re-land here if it failed)
QOK=0; QSEC=null; QPK=null
if [ -d "/root/repo/spark-warehouse/graft_ann_ivfpq_$SUF20" ] && [ -f /tmp/ann16_ivfpq_result ]; then
  read -r QOK QSEC QPK < /tmp/ann16_ivfpq_result
elif [ ! -d "/root/repo/spark-warehouse/graft_ann_ivfpq_$SUF20" ]; then
  start_sampler; t0=$(date +%s)
  if SPARK_GRAFT_PRELAND_KINDS=ivfpq SPARK_GRAFT_PROBE_PARTS=64 \
    run 64g graft.tools.PreLand /tmp/scale10000d1 > /tmp/ann16_preland20m_ivfpq2.log 2>&1; then
    QOK=1; else QOK=0; fi
  t1=$(date +%s); QSEC=$((t1-t0)); QPK=$(stop_sampler)
fi
cat > /root/repo/PRELAND_r16_20M.json <<EOF
{"corpus": "/tmp/scale10000d1", "vectors": 20000000,
 "landing": "two-pass staged + shuffle-hash assignment join + bounded agg maps; 64 shuffle partitions (32 OOMed the ivfpq encode fold at this decade)",
 "prefix": {"ok": $P20, "sec": $P20S, "peak_disk_used_gb": $P20PK},
 "ivfpq": {"ok": $QOK, "sec": $QSEC, "peak_disk_used_gb": $QPK},
 "note": "retry after the first r16 attempt ENOSPC'd at 93 GB peak with a concurrent Verify run; this run had the box alone with ~67 GB free",
 "r15_baseline": "ENOSPC (capacity: other corpora resident)"}
EOF
[ "$P20" = 1 ] || { echo PREFIX20M_FAILED; exit 1; }
[ "$QOK" = 1 ] || { echo IVFPQ20M_MISSING; exit 1; }

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
echo DONE_R16_20M_RETRY
