#!/usr/bin/env bash
# Round-14 session C, phase 2: tumbling-restart at 1B (64g) CONCURRENT
# with the full ANN prep rebuild (24g) — the reset wiped /tmp, so the
# 100x/1000x/20M corpora and landings must be regenerated. Prep is not
# a timed headline; the restart artifact's headline is restore latency
# + parity, and the overlapped load is noted in NOTES (same convention
# as the prior session's step B).
set -x
cd /root/repo || exit 1

CLS=/tmp/win1b_classes
ACLS=/tmp/ann_classes

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
run24() {
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx24g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$ACLS:/opt/spark/jars/*" "$@"
}

export SPARK_GRAFT_PROBE_SRC=/root/testdata/sf0.1
export SPARK_GRAFT_PROBE_OUT=/tmp/win1b
export SPARK_GRAFT_WIN_ROWS_PER_FILE=5000000
export SPARK_GRAFT_WIN_PARITY=checksum
export SPARK_GRAFT_WIN_PARITY_PARTS=256
export SPARK_GRAFT_INGEST_FILES=4
export SPARK_GRAFT_ROCKS_MB=16384

SPARK_GRAFT_WIN_KINDS=tumbling SPARK_GRAFT_WIN_RESTART=10 \
  run64 graft.tools.WinScaleProbe 10000 \
  > /tmp/win1b_tumbling_restart.log 2>&1 &
WINPID=$!

(
  # 100x/1000x corpora + landings already rebuilt by
  # run_r14c_annprep_small.sh (overlapped with the hopping stream);
  # only the 20M corpus + its prefix/ivfpq landings remain
  SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
    SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
    run24 graft.tools.ScaleProbe 10 none > /tmp/ann14_gen20m.log 2>&1
  SPARK_GRAFT_PRELAND_KINDS=prefix,ivfpq \
    run24 graft.tools.PreLand /tmp/scale10000d1 > /tmp/ann14_preland20m.log 2>&1
  echo DONE_ANN_PREP
) > /tmp/ann14_prep_runner.log 2>&1 &
PREPID=$!

wait $WINPID
cp /tmp/win1b/win_scale.json /root/repo/WINSCALE_r14_10000x_tumbling_restart.json
echo STEP_RESTART_DONE
wait $PREPID
echo DONE_PHASE2
