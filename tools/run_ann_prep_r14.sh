#!/usr/bin/env bash
# Round-14 ANN PREP (not a measurement): generate the dup-0.01
# embeddings corpora (100x -> 1000x) and pre-land all index kinds +
# quantizer sidecars, so the later measurement session pays zero
# one-time build cost. Safe to overlap with a streaming probe — noted
# in the overlapped artifact.
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

SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_OUT=/tmp/scale100d1 \
  run_probe graft.tools.ScaleProbe 100 none > /tmp/ann14_gen100.log 2>&1
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale100d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale1000d1 \
  run_probe graft.tools.ScaleProbe 10 none > /tmp/ann14_gen1000.log 2>&1

run_probe graft.tools.PreLand /tmp/scale100d1 /tmp/scale1000d1 \
  > /tmp/ann14_preland.log 2>&1

echo DONE_PREP
