#!/usr/bin/env bash
# Round-14 session C: sim4b-vs-sim4c crossover at a 10M-vector corpus.
# 20M was the plan, but this box's usable disk is ~94 GB and the 20M
# prefix landing's transient (sort spill + shuffle + the cell-sorted
# vector copy, ~60-65 GB peak) ENOSPC'd twice — 10M (~30 GB peak) is
# the largest corpus that fits beside the corpora/landings the graded
# queries need. Per-kind PreLand in separate JVMs so each kind's
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

# free the dead 20M corpus + any partial landings from the ENOSPC runs
rm -rf /tmp/scale10000d1

SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale5000d1 \
  run64 graft.tools.ScaleProbe 5 none > /tmp/ann14_gen10m.log 2>&1

SPARK_GRAFT_PRELAND_KINDS=prefix \
  run64 graft.tools.PreLand /tmp/scale5000d1 > /tmp/ann14_preland10m_prefix.log 2>&1
df -h / | tail -1
SPARK_GRAFT_PRELAND_KINDS=ivfpq \
  run64 graft.tools.PreLand /tmp/scale5000d1 > /tmp/ann14_preland10m_ivfpq.log 2>&1
df -h / | tail -1

# pass 1 = cold (pays sim4b's flat-PQ code landing), pass 2 = warm
# fresh JVM — the crossover number
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale5000d1 \
  run64 graft.tools.ScaleProbe 5 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims10m_cold.log 2>&1
cp /tmp/scale5000d1/probe.json /root/repo/PROBE_r14_10M_sims_cold.json
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale5000d1 \
  run64 graft.tools.ScaleProbe 5 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims10m_warm.log 2>&1
cp /tmp/scale5000d1/probe.json /root/repo/PROBE_r14_10M_sims_warm.json
echo DONE_SIMS_10M
