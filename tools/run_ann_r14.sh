#!/usr/bin/env bash
# Round-14 ANN-serving + maintenance runs (VERDICT r13 next #3/#6/#8),
# sequential after the win1b window runs release the box. Plain java
# against a class snapshot — no sbt lock contention.
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
  java $ADD_OPENS -Xmx64g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLS:/opt/spark/jars/*" "$@"
}

export SPARK_GRAFT_PROBE_OUT=/tmp/ann14

mkdir -p /tmp/ann14

# 0. corpora: embeddings-only 100x -> 1000x composition at dup 0.01
#    (the ANN probes read only embeddings; skipping lineitem/orders/
#    events/documents saves ~20 GB on a box also holding the 1B prep)
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_OUT=/tmp/scale100d1 \
  run_probe graft.tools.ScaleProbe 100 none > /tmp/ann14_gen100.log 2>&1
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale100d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale1000d1 \
  run_probe graft.tools.ScaleProbe 10 none > /tmp/ann14_gen1000.log 2>&1

# 1. recall/latency frontier at 100x and 1000x with the rerankPerProbe
#    knob swept for ivfpq (VERDICT #3)
SPARK_GRAFT_RERANK_SWEEP=20,60,250 \
  run_probe graft.tools.RecallProbe /tmp/scale100d1 > /tmp/ann14_recall100.log 2>&1
cp /tmp/ann14/recall.json /root/repo/RECALL_r14_100x.json
SPARK_GRAFT_RERANK_SWEEP=20,60,250 SPARK_GRAFT_RECALL_OOS_ONLY=1 \
  SPARK_GRAFT_RECALL_KINDS=prefix,ivfpq \
  run_probe graft.tools.RecallProbe /tmp/scale1000d1 > /tmp/ann14_recall1000.log 2>&1
cp /tmp/ann14/recall.json /root/repo/RECALL_r14_1000x.json

# 2. sim4b vs sim4c crossover re-measure at the 20M-vector corpus
#    (post-recall-fix number the composed-index claim rests on)
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale100d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale1000d1 \
  run_probe graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims1000.log 2>&1
cp /tmp/scale1000d1/probe.json /root/repo/PROBE_r14_1000x_sims.json 2>/dev/null || \
  cp /tmp/ann14/probe.json /root/repo/PROBE_r14_1000x_sims.json

# 3. sustained-rate serving: ivfpq at two rerank depths (frontier qps),
#    then the mixed prefix+ivfpq concurrent run (VERDICT #8)
SPARK_GRAFT_SERVE_KIND=ivfpq SPARK_GRAFT_SERVE_RPP=60 \
  SPARK_GRAFT_SERVE_RATES=1,2,4 SPARK_GRAFT_SERVE_SEC=60 \
  SPARK_GRAFT_RATE_TAG=r14_rpp60 \
  run_probe graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14_rate_ivfpq60.log 2>&1
SPARK_GRAFT_SERVE_KIND=ivfpq SPARK_GRAFT_SERVE_RPP=20 \
  SPARK_GRAFT_SERVE_RATES=1,2,4,8,16 SPARK_GRAFT_SERVE_SEC=60 \
  SPARK_GRAFT_RATE_TAG=r14_rpp20 \
  run_probe graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14_rate_ivfpq20.log 2>&1
SPARK_GRAFT_SERVE_KIND=prefix+ivfpq SPARK_GRAFT_SERVE_RATES=64,2 \
  SPARK_GRAFT_SERVE_SEC=120 SPARK_GRAFT_RATE_TAG=r14 \
  run_probe graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14_rate_mixed.log 2>&1
cp /tmp/ann14/RATESERVE_r14*.json /root/repo/

# 4. delete-dominant maintenance at 1000x: tombstone-row trigger fires
#    while the byte-ratio defers (VERDICT #6)
SPARK_GRAFT_MAINT_MIX=10,10,80 SPARK_GRAFT_MAINT_COMPACT=4 \
  SPARK_GRAFT_MAINT_SLIVER=0.5 SPARK_GRAFT_MAINT_MAXTOMBS=30000 \
  SPARK_GRAFT_MAINT_BATCHES=16 SPARK_GRAFT_MAINT_ROWS=5000 \
  SPARK_GRAFT_MAINT_SERVE=1 SPARK_GRAFT_MAINT_TAG=deletes \
  run_probe graft.tools.MaintenanceProbe /tmp/scale1000d1 > /tmp/ann14_maint.log 2>&1
cp /tmp/ann14/MAINT_r14_*_deletes.json /root/repo/
rm -rf /tmp/maint_corpus*

echo DONE_ANN
