#!/usr/bin/env bash
# Round-17: the 40M-vector decade (VERDICT r16 #4). Enablers over r16:
#  - chunked pass-2 staged landing (SPARK_GRAFT_LAND_CHUNKS): peak disk
#    ~ at-rest x (1 + 1/G) instead of 2x (staging deleted per bucket
#    group as consumed)
#  - codegen PQ encode + assignment reuse: the ivfpq landing is
#    scan-bound (182 s at 20M vs 1656 s in r16)
#  - zstd shuffle compression for the landing JVM (the corpus-vector
#    shuffles are the live-transient term)
# Budget arithmetic (PLANS round-17): prefix at-rest ~38 GB at 40M;
# pass-1 live = join shuffle (~22) + repartition shuffle (~28) with the
# earlier stage 120s-GC-collected, staging grows to 38 => peak ~66 GB.
# The box must start the landing with >= 70 GB free or this refuses.
set -uo pipefail
set -x
cd /root/repo

SUF40=$(printf '/tmp/scale20000d1' | md5sum | cut -c1-16)
SUF20=$(printf '/tmp/scale10000d1' | md5sum | cut -c1-16)
SUF10=$(printf '/tmp/scale5000d1' | md5sum | cut -c1-16)
SUF2=$(printf '/tmp/scale1000d1' | md5sum | cut -c1-16)

CLS=/tmp/ann17b_classes
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

if pgrep -f "Xmx64g" >/dev/null; then echo "REFUSING: another 64g JVM is running"; exit 2; fi

# ---- 0: clear everything re-landable (all regenerable/re-landable;
# the 20M prefix re-lands in ~17 min, ivfpq in ~3 min, corpora regen
# deterministically from scale1000d1) -----------------------------------
for t in graft_ann_index_$SUF20 graft_ann_index_${SUF20}__tombs \
         graft_ann_ivfpq_$SUF20 graft_ann_pq_codes_$SUF20 graft_ann_fine_$SUF20 \
         graft_ann_index_$SUF10 graft_ann_index_${SUF10}__tombs \
         graft_ann_ivfpq_$SUF10 graft_ann_pq_codes_$SUF10 graft_ann_fine_$SUF10 \
         graft_ann_index_$SUF2 graft_ann_index_${SUF2}__tombs \
         graft_ann_ivfpq_$SUF2 graft_ann_km_index_$SUF2 \
         graft_ann_pq_codes_$SUF2 graft_ann_fine_$SUF2; do
  rm -rf "/root/repo/spark-warehouse/$t"
done
rm -rf /tmp/scale5000d1 /tmp/rateserve_* /tmp/graft-eventlog
# stale 40M state from any earlier attempt
for t in graft_ann_index_$SUF40 graft_ann_index_${SUF40}__tombs \
         graft_ann_ivfpq_$SUF40 graft_ann_pq_codes_$SUF40 graft_ann_fine_$SUF40; do
  rm -rf "/root/repo/spark-warehouse/$t"
done
rm -f "/root/repo/spark-warehouse/graft_ann_quantizer_$SUF40.bin"

AVAIL_GB=$(df -BG --output=avail / | tail -1 | tr -dc '0-9')
if [ "$AVAIL_GB" -lt 70 ]; then
  echo "REFUSING: need 70 GB free before datagen, have ${AVAIL_GB} GB."
  df -h /; du -sh /root/repo/spark-warehouse /tmp/scale*d1 2>/dev/null
  exit 2
fi

# ---- 1: generate the 40M corpus (2x the 20M corpus) ------------------
rm -rf /tmp/scale20000d1
if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale10000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale20000d1 \
  run 64g graft.tools.ScaleProbe 2 none > /tmp/ann17_gen40m.log 2>&1; then
  echo GEN40M_OK
else echo GEN40M_FAILED; tail -20 /tmp/ann17_gen40m.log; exit 1; fi
# the 20M source corpus is now redundant (regenerable) — free it for
# the landing's transient
rm -rf /tmp/scale10000d1
rm -f "/root/repo/spark-warehouse/graft_ann_quantizer_$SUF20.bin"

SAMPLE_PID=""
start_sampler() {
  rm -f /tmp/ann17b_peak /tmp/ann17b_breakdown
  ( while true; do
      U=$(df -k / | tail -1 | awk '{print $3}')
      B=$(du -sk /tmp/blockmgr-* 2>/dev/null | awk '{s+=$1} END {print s+0}')
      W=$(du -sk /root/repo/spark-warehouse 2>/dev/null | awk '{print $1}')
      echo "$U" >> /tmp/ann17b_peak
      echo "$(date +%s) $U $B $W" >> /tmp/ann17b_breakdown
      sleep 5
    done ) &
  SAMPLE_PID=$!
}
stop_sampler() {
  kill "$SAMPLE_PID" 2>/dev/null; wait "$SAMPLE_PID" 2>/dev/null
  sort -n /tmp/ann17b_peak | tail -1 | awk '{printf "%.1f", $1/1048576}'
}

# ---- 2: land prefix at 40M 128 parts (heap law: rows/parts), 8 bucket
# groups in pass 2 ------------------------------------------------------
start_sampler; t0=$(date +%s)
if SPARK_GRAFT_PRELAND_KINDS=prefix SPARK_GRAFT_PROBE_PARTS=128 \
  SPARK_GRAFT_LAND_CHUNKS=8 \
  run 64g graft.tools.PreLand /tmp/scale20000d1 > /tmp/ann17_preland40m_prefix.log 2>&1; then
  P40=1; else P40=0; fi
t1=$(date +%s); P40S=$((t1-t0)); P40PK=$(stop_sampler)
cp /tmp/ann17b_breakdown /tmp/ann17b_breakdown_prefix 2>/dev/null || true

# ---- 3: land ivfpq at 40M (assignment reuse + codegen encode) + cal --
QOK=0; QSEC=null; QPK=null; CAL40=null
if [ "$P40" = 1 ]; then
  start_sampler; t0=$(date +%s)
  if SPARK_GRAFT_PRELAND_KINDS=ivfpq SPARK_GRAFT_PROBE_PARTS=128 \
    run 64g graft.tools.PreLand /tmp/scale20000d1 > /tmp/ann17_preland40m_ivfpq.log 2>&1; then
    QOK=1; else QOK=0; fi
  t1=$(date +%s); QSEC=$((t1-t0)); QPK=$(stop_sampler)
  CAL40=$(grep -oP 'calibrated servedNprobe=\K[0-9]+' /tmp/ann17_preland40m_ivfpq.log || echo null)
fi
cat > /root/repo/PRELAND_r17_40M.json <<EOF
{"corpus": "/tmp/scale20000d1", "vectors": 40000000,
 "landing": "r17: chunked pass-2 (8 bucket groups, staging deleted as consumed), zstd shuffle, 128 shuffle partitions; ivfpq = assignment reuse + codegen encode",
 "prefix": {"ok": $P40, "sec": $P40S, "peak_disk_used_gb": $P40PK},
 "ivfpq": {"ok": $QOK, "sec": $QSEC, "peak_disk_used_gb": $QPK},
 "calibrated_served_nprobe": $CAL40,
 "budget": "box cleared to ~75 GB free; predicted prefix peak ~66 GB (staging 38 + repartition shuffle 28 with the join shuffle GC-collected mid-pass); r16 could not attempt this decade (2x staged write alone = 76 GB)"}
EOF
[ "$P40" = 1 ] || { echo PREFIX40M_FAILED; tail -30 /tmp/ann17_preland40m_prefix.log; exit 1; }
[ "$QOK" = 1 ] || { echo IVFPQ40M_FAILED; tail -30 /tmp/ann17_preland40m_ivfpq.log; exit 1; }

# ---- 4: serving probes (cold, warm) ----------------------------------
for PASS in cold warm; do
  if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
    SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale20000d1 \
    run 64g graft.tools.ScaleProbe 20 \
      sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
    > /tmp/ann17_sims40m_$PASS.log 2>&1; then
    cp /tmp/scale20000d1/probe.json /root/repo/PROBE_r17_40M_sims_$PASS.json
  else echo "40M $PASS probe FAILED"; tail -5 /tmp/ann17_sims40m_$PASS.log; fi
done

# ---- 5: OOS recall sweep at the 40M grid (k1 = 791) ------------------
mkdir -p /tmp/ann17q
if SPARK_GRAFT_RERANK_SWEEP=20,60 SPARK_GRAFT_RECALL_OOS_ONLY=1 \
  SPARK_GRAFT_RECALL_NPROBES=1,8,32,198,791 \
  SPARK_GRAFT_RECALL_KINDS=prefix,ivfpq SPARK_GRAFT_PROBE_OUT=/tmp/ann17q \
  run 24g graft.tools.RecallProbe /tmp/scale20000d1 > /tmp/ann17_recall40m.log 2>&1; then
  cp /tmp/ann17q/recall.json /root/repo/RECALL_r17_40M.json
else echo "40M recall FAILED"; tail -5 /tmp/ann17_recall40m.log; fi

echo "CAL40=$CAL40"
echo DONE_R17_40M
