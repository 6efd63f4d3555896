#!/usr/bin/env bash
# Round-15 quiet-box serving + maintenance measurements (VERDICT r14
# next #6/#8), run AFTER run_r15_ann.sh:
#   1. prefix knee UNDER co-serving: offered prefix 48/64/80 qps beside
#      a constant ivfpq@2 companion at the 2M corpus (r14 held 59 of 64)
#   2. delete-heavy maintenance at 24 GB heap: the r14 run needed 64 GB
#      (partial-agg OOM at 24); the compaction fold no longer pins the
#      whole table MEMORY_AND_DISK through the rewrite, so re-measure
# Artifacts publish only when their step exits 0.
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

run24() {
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx24g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.sql.objectHashAggregate.sortBased.fallbackThreshold=2097152 \
    -cp "$CLS:/opt/spark/jars/*" "$@"
}

export SPARK_GRAFT_PROBE_OUT=/tmp/ann15q
mkdir -p /tmp/ann15q

# ---- 1: mixed-kind co-serving knee (2M corpus, landings exist) ------
for R in 48 64 80; do
  if SPARK_GRAFT_SERVE_KIND=prefix+ivfpq SPARK_GRAFT_SERVE_RATES=$R,2 \
    SPARK_GRAFT_SERVE_SEC=120 SPARK_GRAFT_RATE_TAG=r15p$R \
    run24 graft.tools.RateServeProbe /tmp/scale1000d1 \
    > /tmp/ann15_rate_mixed$R.log 2>&1; then
    cp /tmp/ann15q/RATESERVE_r15p${R}_*_mixed.json /root/repo/
  else echo "mixed rate $R FAILED"; fi
done

# ---- 2: delete-heavy maintenance at 24 g ----------------------------
if SPARK_GRAFT_MAINT_MIX=10,10,80 SPARK_GRAFT_MAINT_COMPACT=4 \
  SPARK_GRAFT_MAINT_SLIVER=0.5 SPARK_GRAFT_MAINT_MAXTOMBS=8000 \
  SPARK_GRAFT_MAINT_BATCHES=16 SPARK_GRAFT_MAINT_ROWS=5000 \
  SPARK_GRAFT_MAINT_SERVE=1 SPARK_GRAFT_MAINT_TAG=deletes24g \
  SPARK_GRAFT_MAINT_ROUND=r15 \
  run24 graft.tools.MaintenanceProbe /tmp/scale1000d1 \
  > /tmp/ann15_maint24g.log 2>&1; then
  cp /tmp/ann15q/MAINT_r15_1000x_deletes24g.json /root/repo/
else
  echo "MAINT 24g FAILED — see /tmp/ann15_maint24g.log"
fi
rm -rf /tmp/maint_corpus*
echo DONE_R15_SERVE_MAINT
