#!/usr/bin/env bash
# Round-14 session C: rebuild the 100x/1000x ANN corpora + all-kind
# landings (un-timed PREP — overlaps the 1B hopping stream, noted in
# NOTES; the 20M corpus is deferred to the tumbling-restart window for
# disk headroom beside the 1B prep + hopping checkpoint).
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

run24() {
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx24g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CLS:/opt/spark/jars/*" "$@"
}

SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_OUT=/tmp/scale100d1 \
  run24 graft.tools.ScaleProbe 100 none > /tmp/ann14_gen100.log 2>&1
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale100d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale1000d1 \
  run24 graft.tools.ScaleProbe 10 none > /tmp/ann14_gen1000.log 2>&1
run24 graft.tools.PreLand /tmp/scale100d1 /tmp/scale1000d1 \
  > /tmp/ann14_preland.log 2>&1

echo DONE_ANN_PREP_SMALL
