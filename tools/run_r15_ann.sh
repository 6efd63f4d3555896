#!/usr/bin/env bash
# Round-15 ANN chain (VERDICT r14 next #1/#2/#3, quiet box, run AFTER
# the 1B hopping-restart probe frees its corpus):
#   1. fail-fast demo: serving the UNLANDED 5M ivfpq index must refuse
#      with the typed MissingIndexException in seconds (the r14 shape
#      OOM'd a 64 GB heap after 280-377 s in the inline-build fallback)
#   2. PRELAND_r15: land prefix + ivfpq at 5M through the two-pass
#      staged landing, recording wall time and PEAK DISK (the r14
#      one-pass landing's transient was ~11 GB/1M vectors; ivfpq
#      ENOSPC'd at 5M)
#   3. PROBE_r15_5M sims cold + warm: the sim4b-vs-sim4c crossover
#      numbers at 5M, plus RECALL_r15_5M (sec/query vs nprobe x rpp)
#   4. 10M: generate scale5000d1 and land prefix + ivfpq where the r14
#      landing ENOSPC'd (>65 GB transient at 10M)
# Artifacts publish ONLY when their step exits 0.
set -uo pipefail
set -x
cd /root/repo

CLS=/tmp/ann15_classes
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

run64() {
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx64g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.sql.objectHashAggregate.sortBased.fallbackThreshold=2097152 \
    -cp "$CLS:/opt/spark/jars/*" "$@"
}
run24() {
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx24g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.sql.objectHashAggregate.sortBased.fallbackThreshold=2097152 \
    -cp "$CLS:/opt/spark/jars/*" "$@"
}

# disk-peak sampler: records max used KB on / while a step runs
SAMPLE_PID=""
start_sampler() {
  rm -f /tmp/ann15_peak
  ( while true; do df -k / | tail -1 | awk '{print $3}' >> /tmp/ann15_peak; sleep 5; done ) &
  SAMPLE_PID=$!
}
stop_sampler() { # echoes peak used GB
  kill "$SAMPLE_PID" 2>/dev/null; wait "$SAMPLE_PID" 2>/dev/null
  sort -n /tmp/ann15_peak | tail -1 | awk '{printf "%.1f", $1/1048576}'
}

SUF5=$(printf '/tmp/scale2500d1' | md5sum | cut -c1-16)
SUF10=$(printf '/tmp/scale5000d1' | md5sum | cut -c1-16)

# ---- 0: clear the stale 5M landings so the new landing path is measured
for t in graft_ann_index_$SUF5 graft_ann_index_${SUF5}__tombs \
         graft_ann_ivfpq_$SUF5 graft_ann_ivfpq_${SUF5}__tombs \
         graft_ann_km_index_$SUF5 graft_ann_km_index_${SUF5}__tombs \
         graft_ann_fine_$SUF5 graft_ann_pq_codes_$SUF5; do
  rm -rf "/root/repo/spark-warehouse/$t"
done
rm -f "/root/repo/spark-warehouse/graft_ann_quantizer_$SUF5.bin"
ls /tmp/scale2500d1

# ---- 1: fail-fast demo on the unlanded ivfpq index ------------------
t0=$(date +%s)
SPARK_GRAFT_SERVE_KIND=ivfpq SPARK_GRAFT_SERVE_RATES=1 \
  SPARK_GRAFT_SERVE_SEC=30 SPARK_GRAFT_RATE_TAG=r15_failfast \
  run24 graft.tools.RateServeProbe /tmp/scale2500d1 \
  > /tmp/ann15_failfast.log 2>&1
rc=$?
t1=$(date +%s)
echo "FAILFAST rc=$rc sec=$((t1-t0))"
grep -c "MissingIndexException" /tmp/ann15_failfast.log || true

# ---- 2: PRELAND_r15 — land 5M prefix then ivfpq, measuring peak disk
df -k / | tail -1
start_sampler
t0=$(date +%s)
if SPARK_GRAFT_PRELAND_KINDS=prefix \
  run64 graft.tools.PreLand /tmp/scale2500d1 > /tmp/ann15_preland5m_prefix.log 2>&1; then
  PFX_OK=1; else PFX_OK=0; fi
t1=$(date +%s); PFX_SEC=$((t1-t0)); PFX_PEAK=$(stop_sampler)
df -k / | tail -1
start_sampler
t0=$(date +%s)
if SPARK_GRAFT_PRELAND_KINDS=ivfpq \
  run64 graft.tools.PreLand /tmp/scale2500d1 > /tmp/ann15_preland5m_ivfpq.log 2>&1; then
  PQ_OK=1; else PQ_OK=0; fi
t1=$(date +%s); PQ_SEC=$((t1-t0)); PQ_PEAK=$(stop_sampler)
df -k / | tail -1
cat > /root/repo/PRELAND_r15_5M.json <<EOF
{"corpus": "/tmp/scale2500d1", "vectors": 5000000,
 "landing": "two-pass staged (repartition on cell into buckets x splits, pass-2 bounded sorts) + shuffle-hash assignment join",
 "prefix": {"ok": $PFX_OK, "sec": $PFX_SEC, "peak_disk_used_gb": $PFX_PEAK},
 "ivfpq": {"ok": $PQ_OK, "sec": $PQ_SEC, "peak_disk_used_gb": $PQ_PEAK},
 "r14_baseline": {"prefix_sec": 794, "prefix_peak_gb": "~83 of 94 (one-pass)", "ivfpq": "ENOSPC"}}
EOF
[ "$PQ_OK" = 1 ] || { echo "IVFPQ LANDING FAILED"; exit 1; }

# ---- 3: 5M sims cold + warm + the ivfpq depth frontier ---------------
if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale100d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale2500d1 \
  run64 graft.tools.ScaleProbe 25 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann15_sims5m_cold.log 2>&1; then
  cp /tmp/scale2500d1/probe.json /root/repo/PROBE_r15_5M_sims_cold.json
else echo "5M cold probe FAILED"; fi
if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale100d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale2500d1 \
  run64 graft.tools.ScaleProbe 25 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann15_sims5m_warm.log 2>&1; then
  cp /tmp/scale2500d1/probe.json /root/repo/PROBE_r15_5M_sims_warm.json
else echo "5M warm probe FAILED"; fi

mkdir -p /tmp/ann15q
if SPARK_GRAFT_RERANK_SWEEP=20,60 SPARK_GRAFT_RECALL_OOS_ONLY=1 \
  SPARK_GRAFT_RECALL_NPROBES=1,8,32,121,484 \
  SPARK_GRAFT_RECALL_KINDS=prefix,ivfpq SPARK_GRAFT_PROBE_OUT=/tmp/ann15q \
  run24 graft.tools.RecallProbe /tmp/scale2500d1 > /tmp/ann15_recall5m.log 2>&1; then
  cp /tmp/ann15q/recall.json /root/repo/RECALL_r15_5M.json
else echo "5M recall probe FAILED"; fi

# ---- 4: 10M — land where r14 ENOSPC'd --------------------------------
rm -rf /tmp/scale5000d1
if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale100d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale5000d1 \
  run64 graft.tools.ScaleProbe 50 none > /tmp/ann15_gen10m.log 2>&1; then
  for t in graft_ann_index_$SUF10 graft_ann_ivfpq_$SUF10 \
           graft_ann_fine_$SUF10 graft_ann_pq_codes_$SUF10; do
    rm -rf "/root/repo/spark-warehouse/$t"
  done
  rm -f "/root/repo/spark-warehouse/graft_ann_quantizer_$SUF10.bin"
  start_sampler
  t0=$(date +%s)
  if SPARK_GRAFT_PRELAND_KINDS=prefix \
    run64 graft.tools.PreLand /tmp/scale5000d1 > /tmp/ann15_preland10m_prefix.log 2>&1; then
    PFX10_OK=1; else PFX10_OK=0; fi
  t1=$(date +%s); PFX10_SEC=$((t1-t0)); PFX10_PEAK=$(stop_sampler)
  start_sampler
  t0=$(date +%s)
  if SPARK_GRAFT_PRELAND_KINDS=ivfpq \
    run64 graft.tools.PreLand /tmp/scale5000d1 > /tmp/ann15_preland10m_ivfpq.log 2>&1; then
    PQ10_OK=1; else PQ10_OK=0; fi
  t1=$(date +%s); PQ10_SEC=$((t1-t0)); PQ10_PEAK=$(stop_sampler)
  cat > /root/repo/PRELAND_r15_10M.json <<EOF
{"corpus": "/tmp/scale5000d1", "vectors": 10000000,
 "landing": "two-pass staged + shuffle-hash assignment join",
 "prefix": {"ok": $PFX10_OK, "sec": $PFX10_SEC, "peak_disk_used_gb": $PFX10_PEAK},
 "ivfpq": {"ok": $PQ10_OK, "sec": $PQ10_SEC, "peak_disk_used_gb": $PQ10_PEAK},
 "r14_baseline": "both ENOSPC'd (>65 GB transient at 10M, one-pass)"}
EOF
else
  echo "10M datagen FAILED"
fi
echo DONE_R15_ANN
