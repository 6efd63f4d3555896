#!/usr/bin/env bash
# Round-14 chain, session C (the box was reset mid-round: /tmp wiped,
# prior prep corpora and in-flight runs lost). Phase 1: the hopping
# engine at the 1B decade, quiet box — the state-heaviest engine's
# missing decade (VERDICT r13 next #1). Regenerates the 1B prep corpus
# (~550 s, repartition(64) datagen) since the reset removed it.
set -x
cd /root/repo || exit 1

CLS=/tmp/win1b_classes

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

export SPARK_GRAFT_PROBE_SRC=/root/testdata/sf0.1
export SPARK_GRAFT_PROBE_OUT=/tmp/win1b
export SPARK_GRAFT_WIN_ROWS_PER_FILE=5000000
export SPARK_GRAFT_WIN_PARITY=checksum
export SPARK_GRAFT_WIN_PARITY_PARTS=256
export SPARK_GRAFT_INGEST_FILES=4
export SPARK_GRAFT_ROCKS_MB=16384

mkdir -p /tmp/win1b

SPARK_GRAFT_WIN_KINDS=hopping \
  run_probe graft.tools.WinScaleProbe 10000 \
  > /tmp/win1b_hopping.log 2>&1
cp /tmp/win1b/win_scale.json /root/repo/WINSCALE_r14_10000x_hopping.json

echo DONE_PHASE1_HOPPING
