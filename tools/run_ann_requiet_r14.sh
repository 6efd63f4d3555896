#!/usr/bin/env bash
# Round-14 ANN measurement RE-RUN on a quiet box. The first measurement
# pass overlapped the 1B hopping window probe (22+ cores busy), which
# inflated every latency: recall VALUES are load-invariant but the
# sec/query and sustained-qps numbers are not comparable to the r13
# quiet-box artifacts. Corpora + landings persist in /tmp from
# run_ann_prep_r14.sh, so this pays zero build cost.
set -x
cd /root/repo || exit 1

CLS=/tmp/ann_classes
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

run_probe() {
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx24g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLS:/opt/spark/jars/*" "$@"
}

export SPARK_GRAFT_PROBE_OUT=/tmp/ann14q
mkdir -p /tmp/ann14q

SPARK_GRAFT_RERANK_SWEEP=20,60,250 \
  run_probe graft.tools.RecallProbe /tmp/scale100d1 > /tmp/ann14q_recall100.log 2>&1
cp /tmp/ann14q/recall.json /root/repo/RECALL_r14_100x.json
SPARK_GRAFT_RERANK_SWEEP=20,60,250 SPARK_GRAFT_RECALL_OOS_ONLY=1 \
  SPARK_GRAFT_RECALL_KINDS=prefix,ivfpq \
  run_probe graft.tools.RecallProbe /tmp/scale1000d1 > /tmp/ann14q_recall1000.log 2>&1
cp /tmp/ann14q/recall.json /root/repo/RECALL_r14_1000x.json

SPARK_GRAFT_SERVE_KIND=ivfpq SPARK_GRAFT_SERVE_RPP=60 \
  SPARK_GRAFT_SERVE_RATES=1,2,4 SPARK_GRAFT_SERVE_SEC=60 \
  SPARK_GRAFT_RATE_TAG=r14_rpp60 \
  run_probe graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14q_rate_ivfpq60.log 2>&1
SPARK_GRAFT_SERVE_KIND=ivfpq SPARK_GRAFT_SERVE_RPP=20 \
  SPARK_GRAFT_SERVE_RATES=2,4,8,16 SPARK_GRAFT_SERVE_SEC=60 \
  SPARK_GRAFT_RATE_TAG=r14_rpp20 \
  run_probe graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14q_rate_ivfpq20.log 2>&1
SPARK_GRAFT_SERVE_KIND=prefix+ivfpq SPARK_GRAFT_SERVE_RATES=64,2 \
  SPARK_GRAFT_SERVE_SEC=120 SPARK_GRAFT_RATE_TAG=r14 \
  run_probe graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14q_rate_mixed.log 2>&1
cp /tmp/ann14q/RATESERVE_r14*.json /root/repo/

# MAXTOMBS is PER-TABLE (compactMaxTombstones checks each sidecar);
# the first pass used 30000, which 16 batches x 80% deletes across 3
# sidecars (~20.6k/table at end) never reach — the trigger never
# fired. 8000 crosses around batch 5-6, so the batch-8 cadence tick
# fires on all three tables while the byte-ratio (sliver/gen ~0.017
# vs 0.5) defers throughout — the exact shape the probe exists to
# show; the batch-12 tick should defer again (~5.3k/table re-accrued).
SPARK_GRAFT_MAINT_MIX=10,10,80 SPARK_GRAFT_MAINT_COMPACT=4 \
  SPARK_GRAFT_MAINT_SLIVER=0.5 SPARK_GRAFT_MAINT_MAXTOMBS=8000 \
  SPARK_GRAFT_MAINT_BATCHES=16 SPARK_GRAFT_MAINT_ROWS=5000 \
  SPARK_GRAFT_MAINT_SERVE=1 SPARK_GRAFT_MAINT_TAG=deletes \
  run_probe graft.tools.MaintenanceProbe /tmp/scale1000d1 > /tmp/ann14q_maint.log 2>&1
cp /tmp/ann14q/MAINT_r14_*_deletes.json /root/repo/
rm -rf /tmp/maint_corpus*

echo DONE_ANN_QUIET
