#!/usr/bin/env bash
# Round-14 session C: sim4b-vs-sim4c crossover at a 5M-vector corpus.
# 20M was the plan, but this box's usable disk is ~94 GB total and the
# prefix landing's transient (external-sort spill + shuffle + the
# cell-sorted vector copy) measured >65 GB at 10M vectors — both 20M
# and 10M ENOSPC'd. 5M (~33 GB transient) is the largest corpus that
# fits beside the corpora/landings the graded queries need, and with
# the measured 200k and 2M points it still gives a three-point
# scaling curve. Per-kind PreLand in separate JVMs so each kind's
# shuffle temp is freed before the next starts.
set -x
cd /root/repo || exit 1

CLS=/tmp/ann_classes
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
    -cp "$CLS:/opt/spark/jars/*" "$@"
}

# free the dead 10M corpus from the ENOSPC attempt
rm -rf /tmp/scale5000d1

SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale100d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale2500d1 \
  run64 graft.tools.ScaleProbe 25 none > /tmp/ann14_gen5m.log 2>&1

SPARK_GRAFT_PRELAND_KINDS=prefix \
  run64 graft.tools.PreLand /tmp/scale2500d1 > /tmp/ann14_preland5m_prefix.log 2>&1
df -h / | tail -1
SPARK_GRAFT_PRELAND_KINDS=ivfpq \
  run64 graft.tools.PreLand /tmp/scale2500d1 > /tmp/ann14_preland5m_ivfpq.log 2>&1
df -h / | tail -1

# pass 1 = cold (pays sim4b's flat-PQ code landing), pass 2 = warm
# fresh JVM — the crossover number
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale100d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale2500d1 \
  run64 graft.tools.ScaleProbe 25 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims5m_cold.log 2>&1
cp /tmp/scale2500d1/probe.json /root/repo/PROBE_r14_5M_sims_cold.json
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale100d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale2500d1 \
  run64 graft.tools.ScaleProbe 25 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims5m_warm.log 2>&1
cp /tmp/scale2500d1/probe.json /root/repo/PROBE_r14_5M_sims_warm.json
echo DONE_SIMS_5M
