#!/usr/bin/env bash
# r15 mixed-serving knee retry: land the 2M prefix+ivfpq indexes first
# (the fail-fast contract refused the unlanded ivfpq — by design), then
# sweep offered prefix 48/64/80 qps beside ivfpq@2.
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
SPARK_GRAFT_PRELAND_KINDS=prefix,ivfpq \
  run 64g graft.tools.PreLand /tmp/scale1000d1 > /tmp/ann15_preland2m.log 2>&1
grep PRELAND /tmp/ann15_preland2m.log
export SPARK_GRAFT_PROBE_OUT=/tmp/ann15q
for R in 48 64 80; do
  if SPARK_GRAFT_SERVE_KIND=prefix+ivfpq SPARK_GRAFT_SERVE_RATES=$R,2 \
    SPARK_GRAFT_SERVE_SEC=120 SPARK_GRAFT_RATE_TAG=r15p$R \
    run 24g graft.tools.RateServeProbe /tmp/scale1000d1 \
    > /tmp/ann15_rate_mixed$R.log 2>&1; then
    cp /tmp/ann15q/RATESERVE_r15p${R}_*_mixed.json /root/repo/
  else echo "mixed rate $R FAILED"; fi
done
echo DONE_R15_MIXED
