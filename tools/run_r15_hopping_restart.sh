#!/usr/bin/env bash
# Round-15: hopping-window restore at the 1B decade (VERDICT r14 next #4).
# Tumbling restore is proven (WINSCALE_r14_10000x_tumbling_restart,
# 19.7M state rows at the kill); hopping carries 4x the state (83.4M
# peak) and is the genuine checkpoint-reload stress case. Kill after 10
# committed batches (~the state plateau), resume from the RocksDB
# checkpoint, parity across the kill.
# Regenerates the 1B prep corpus (the r14 session's was freed for disk).
# Per ADVICE r14: fail fast per step and only publish the artifact when
# the probe step exits 0.
set -euo pipefail
set -x
cd /root/repo

CLS=/tmp/win1b_classes
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

export SPARK_GRAFT_PROBE_SRC=/root/testdata/sf0.1
export SPARK_GRAFT_PROBE_OUT=/tmp/win1b
export SPARK_GRAFT_WIN_ROWS_PER_FILE=5000000
export SPARK_GRAFT_WIN_PARITY=checksum
export SPARK_GRAFT_WIN_PARITY_PARTS=256
export SPARK_GRAFT_INGEST_FILES=4
export SPARK_GRAFT_ROCKS_MB=16384

mkdir -p /tmp/win1b

SPARK_GRAFT_WIN_KINDS=hopping SPARK_GRAFT_WIN_RESTART=10 \
  run_probe graft.tools.WinScaleProbe 10000 \
  > /tmp/win1b_hopping_restart.log 2>&1
cp /tmp/win1b/win_scale.json /root/repo/WINSCALE_r15_10000x_hopping_restart.json

echo DONE_R15_HOPPING_RESTART
