#!/usr/bin/env bash
# Round-16 item #4: attack the co-served ivfpq per-batch floor.
#  1. SERVEPROF_r16: phase-timed breakdown of one ivfpq serve batch at
#     nprobe = default(√K), 32, 8 — where does the 8-15 s floor live?
#  2. RATESERVE_r16: co-served prefix+ivfpq under the FAIR scheduler
#     (per-stream pools — under FIFO every ivfpq stage queued behind
#     the prefix stream's job arrivals), at ivfpq offered rates 2 and
#     4; one FIFO control arm reproduces the r15 behavior on this jar.
# Requires the 2M (scale1000d1) prefix+ivfpq landings (present from
# r13-r15; re-land with PreLand if cleared).
set -uo pipefail
set -x
cd /root/repo

NEED_GB=5
AVAIL_GB=$(df -BG --output=avail / | tail -1 | tr -dc '0-9')
[ "$AVAIL_GB" -ge "$NEED_GB" ] || { echo "REFUSING: need ${NEED_GB} GB free, have ${AVAIL_GB}"; exit 2; }
SUF=$(printf '/tmp/scale1000d1' | md5sum | cut -c1-16)
for t in graft_ann_index_$SUF graft_ann_ivfpq_$SUF; do
  [ -d "/root/repo/spark-warehouse/$t" ] || { echo "REFUSING: $t not landed (run PreLand /tmp/scale1000d1)"; exit 2; }
done

CLS=/tmp/serve16_classes
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

run24() {
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx24g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.sql.objectHashAggregate.sortBased.fallbackThreshold=2097152 \
    -cp "$CLS:/opt/spark/jars/*" "$@"
}

mkdir -p /tmp/ann16q
export SPARK_GRAFT_PROBE_OUT=/tmp/ann16q

# ---- 1: per-batch phase profile -------------------------------------
if SPARK_GRAFT_SERVE_NPROBES=0,32,8 SPARK_GRAFT_RATE_TAG=r16 \
  run24 graft.tools.ServeProfileProbe /tmp/scale1000d1 \
  > /tmp/ann16_serveprof.log 2>&1; then
  cp /tmp/ann16q/SERVEPROF_r16.json /root/repo/SERVEPROF_r16.json
else echo "serve profile FAILED"; fi

# ---- 2: co-served knee, FAIR vs FIFO --------------------------------
# FIFO control at the r15 shape (64,2): same jar, old scheduler
if SPARK_GRAFT_SERVE_KIND=prefix+ivfpq SPARK_GRAFT_SERVE_RATES=64,2 \
  SPARK_GRAFT_SERVE_SEC=120 SPARK_GRAFT_SERVE_SCHED=FIFO \
  SPARK_GRAFT_RATE_TAG=r16fifo64 \
  run24 graft.tools.RateServeProbe /tmp/scale1000d1 \
  > /tmp/ann16_rate_fifo64.log 2>&1; then
  cp /tmp/ann16q/RATESERVE_r16fifo64_*_mixed.json /root/repo/
else echo "FIFO control FAILED"; fi
# FAIR arms: ivfpq offered at 2 (r15 comparison) and 4 (the >= 4 qps target)
for IV in 2 4; do
  if SPARK_GRAFT_SERVE_KIND=prefix+ivfpq SPARK_GRAFT_SERVE_RATES=64,$IV \
    SPARK_GRAFT_SERVE_SEC=120 SPARK_GRAFT_RATE_TAG=r16fair64i$IV \
    run24 graft.tools.RateServeProbe /tmp/scale1000d1 \
    > /tmp/ann16_rate_fair64i$IV.log 2>&1; then
    cp /tmp/ann16q/RATESERVE_r16fair64i${IV}_*_mixed.json /root/repo/
  else echo "FAIR arm ivfpq=$IV FAILED"; fi
done

echo DONE_R16_SERVE
