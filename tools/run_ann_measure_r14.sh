#!/usr/bin/env bash
# Round-14 ANN measurement phase (corpora + landings already built by
# run_ann_prep_r14.sh / PreLand). Runs at -Xmx24g: the serving probes
# work over pre-landed 2M-vector indexes (the 64g requirement is for
# LANDING larger corpora), and the smaller heap lets this phase share
# the box with the window-restart probe without tripping the OOM
# killer — three 64g JVMs on a 128 GB box is how round 14 lost its
# first hopping run.
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

export SPARK_GRAFT_PROBE_OUT=/tmp/ann14
mkdir -p /tmp/ann14

# 1. recall/latency frontier: full sweep at 100x, OOS-only
#    prefix-vs-ivfpq at 1000x, rerankPerProbe swept for ivfpq
SPARK_GRAFT_RERANK_SWEEP=20,60,250 \
  run_probe graft.tools.RecallProbe /tmp/scale100d1 > /tmp/ann14_recall100.log 2>&1
cp /tmp/ann14/recall.json /root/repo/RECALL_r14_100x.json
SPARK_GRAFT_RERANK_SWEEP=20,60,250 SPARK_GRAFT_RECALL_OOS_ONLY=1 \
  SPARK_GRAFT_RECALL_KINDS=prefix,ivfpq \
  run_probe graft.tools.RecallProbe /tmp/scale1000d1 > /tmp/ann14_recall1000.log 2>&1
cp /tmp/ann14/recall.json /root/repo/RECALL_r14_1000x.json

# 2. sustained-rate serving: ivfpq at two rerank depths (frontier qps),
#    then the mixed prefix+ivfpq concurrent run
SPARK_GRAFT_SERVE_KIND=ivfpq SPARK_GRAFT_SERVE_RPP=60 \
  SPARK_GRAFT_SERVE_RATES=1,2,4 SPARK_GRAFT_SERVE_SEC=60 \
  SPARK_GRAFT_RATE_TAG=r14_rpp60 \
  run_probe graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14_rate_ivfpq60.log 2>&1
SPARK_GRAFT_SERVE_KIND=ivfpq SPARK_GRAFT_SERVE_RPP=20 \
  SPARK_GRAFT_SERVE_RATES=2,4,8,16 SPARK_GRAFT_SERVE_SEC=60 \
  SPARK_GRAFT_RATE_TAG=r14_rpp20 \
  run_probe graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14_rate_ivfpq20.log 2>&1
SPARK_GRAFT_SERVE_KIND=prefix+ivfpq SPARK_GRAFT_SERVE_RATES=64,2 \
  SPARK_GRAFT_SERVE_SEC=120 SPARK_GRAFT_RATE_TAG=r14 \
  run_probe graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14_rate_mixed.log 2>&1
cp /tmp/ann14/RATESERVE_r14*.json /root/repo/

# 3. delete-dominant maintenance at the 2M-vector corpus: tombstone-row
#    trigger fires while the byte-ratio defers
SPARK_GRAFT_MAINT_MIX=10,10,80 SPARK_GRAFT_MAINT_COMPACT=4 \
  SPARK_GRAFT_MAINT_SLIVER=0.5 SPARK_GRAFT_MAINT_MAXTOMBS=30000 \
  SPARK_GRAFT_MAINT_BATCHES=16 SPARK_GRAFT_MAINT_ROWS=5000 \
  SPARK_GRAFT_MAINT_SERVE=1 SPARK_GRAFT_MAINT_TAG=deletes \
  run_probe graft.tools.MaintenanceProbe /tmp/scale1000d1 > /tmp/ann14_maint.log 2>&1
cp /tmp/ann14/MAINT_r14_*_deletes.json /root/repo/
rm -rf /tmp/maint_corpus*

echo DONE_ANN_MEASURE
