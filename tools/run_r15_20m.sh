#!/usr/bin/env bash
# r15 best-effort tail / r16 head-start: the 20M crossover corpus.
# Generates scale10000d1, lands prefix + ivfpq through the two-pass
# staged path (the r14 one-pass landing ENOSPC'd at 20M with >65 GB of
# transient), then measures the sims cold/warm and the serving
# frontier. Every artifact publishes only on step success; a partial
# run still leaves the corpus + any landed tables for the next round.
# Frees the 5M warehouse landings first (re-landable in ~13 min now).
set -uo pipefail
set -x
cd /root/repo
CLS=/tmp/ann15_classes
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
SAMPLE_PID=""
start_sampler() {
  rm -f /tmp/ann15_peak20
  ( while true; do df -k / | tail -1 | awk '{print $3}' >> /tmp/ann15_peak20; sleep 5; done ) &
  SAMPLE_PID=$!
}
stop_sampler() {
  kill "$SAMPLE_PID" 2>/dev/null; wait "$SAMPLE_PID" 2>/dev/null
  sort -n /tmp/ann15_peak20 | tail -1 | awk '{printf "%.1f", $1/1048576}'
}

SUF5=$(printf '/tmp/scale2500d1' | md5sum | cut -c1-16)
SUF20=$(printf '/tmp/scale10000d1' | md5sum | cut -c1-16)

# free the 5M landings (recorded; re-landable in ~13 min on this path)
for t in graft_ann_index_$SUF5 graft_ann_index_${SUF5}__tombs \
         graft_ann_ivfpq_$SUF5 graft_ann_km_index_$SUF5 \
         graft_ann_fine_$SUF5 graft_ann_pq_codes_$SUF5; do
  rm -rf "/root/repo/spark-warehouse/$t"
done
rm -rf /tmp/scale10000d1

if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run 64g graft.tools.ScaleProbe 10 none > /tmp/ann15_gen20m.log 2>&1; then
  echo GEN20M_OK
else echo GEN20M_FAILED; exit 1; fi

for t in graft_ann_index_$SUF20 graft_ann_ivfpq_$SUF20 \
         graft_ann_fine_$SUF20 graft_ann_pq_codes_$SUF20; do
  rm -rf "/root/repo/spark-warehouse/$t"
done
rm -f "/root/repo/spark-warehouse/graft_ann_quantizer_$SUF20.bin"

start_sampler; t0=$(date +%s)
if SPARK_GRAFT_PRELAND_KINDS=prefix \
  run 64g graft.tools.PreLand /tmp/scale10000d1 > /tmp/ann15_preland20m_prefix.log 2>&1; then
  P20=1; else P20=0; fi
t1=$(date +%s); P20S=$((t1-t0)); P20PK=$(stop_sampler)
start_sampler; t0=$(date +%s)
if SPARK_GRAFT_PRELAND_KINDS=ivfpq \
  run 64g graft.tools.PreLand /tmp/scale10000d1 > /tmp/ann15_preland20m_ivfpq.log 2>&1; then
  Q20=1; else Q20=0; fi
t1=$(date +%s); Q20S=$((t1-t0)); Q20PK=$(stop_sampler)
cat > /root/repo/PRELAND_r15_20M.json <<EOF
{"corpus": "/tmp/scale10000d1", "vectors": 20000000,
 "landing": "two-pass staged + shuffle-hash assignment join + bounded agg maps",
 "prefix": {"ok": $P20, "sec": $P20S, "peak_disk_used_gb": $P20PK},
 "ivfpq": {"ok": $Q20, "sec": $Q20S, "peak_disk_used_gb": $Q20PK},
 "r14_baseline": "ENOSPC (one-pass transient >65 GB at 10M; 20M never landed)"}
EOF
[ "$Q20" = 1 ] || { echo IVFPQ20M_FAILED; exit 1; }

if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run 64g graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann15_sims20m_cold.log 2>&1; then
  cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r15_20M_sims_cold.json
else echo "20M cold probe FAILED"; fi
if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run 64g graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann15_sims20m_warm.log 2>&1; then
  cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r15_20M_sims_warm.json
else echo "20M warm probe FAILED"; fi

mkdir -p /tmp/ann15q
if SPARK_GRAFT_RERANK_SWEEP=20,60 SPARK_GRAFT_RECALL_OOS_ONLY=1 \
  SPARK_GRAFT_RECALL_NPROBES=1,8,32,140,559 \
  SPARK_GRAFT_RECALL_KINDS=prefix,ivfpq SPARK_GRAFT_PROBE_OUT=/tmp/ann15q \
  run 24g graft.tools.RecallProbe /tmp/scale10000d1 > /tmp/ann15_recall20m.log 2>&1; then
  cp /tmp/ann15q/recall.json /root/repo/RECALL_r15_20M.json
else echo "20M recall FAILED"; fi
echo DONE_R15_20M
