#!/usr/bin/env bash
# sim4b-vs-sim4c crossover re-measure at the 20M-vector corpus (the
# post-recall-fix number the composed-index claim rests on). Needs the
# box to itself (-Xmx64g; exact sim1 ground truth at 20M).
set -x
cd /root/repo || exit 1
CLS=/tmp/ann_classes
rm -rf "$CLS"; cp -r target/scala-2.13/classes "$CLS"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run_probe() { java $ADD_OPENS -Xmx64g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CLS:/opt/spark/jars/*" "$@"; }

# land prefix+ivfpq (+ flat pq codes land inside sim4b's first run)
SPARK_GRAFT_PRELAND_KINDS=prefix,ivfpq \
  run_probe graft.tools.PreLand /tmp/scale10000d1 > /tmp/ann14_preland20m.log 2>&1

# pass 1 = cold (pays the flat-PQ code landing sim4b needs);
# pass 2 = warm, fresh JVM over fully-landed indexes — the crossover
# number (matches the r13 cold/warm artifact convention)
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run_probe graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims20m_cold.log 2>&1
cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r14_20M_sims_cold.json
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run_probe graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims20m_warm.log 2>&1
cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r14_20M_sims_warm.json
echo DONE_SIMS_20M
