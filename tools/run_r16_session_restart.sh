#!/usr/bin/env bash
# Round-16 item #3: session-window restore at the 1B decade. Restore is
# proven for KV (RESTORE_r13), tumbling (WINSCALE_r14), and hopping
# (WINSCALE_r15); the merging SESSION engine — whose state rows change
# IDENTITY on merge — is the shape where a checkpoint-reload bug would
# hide. Kill after 10 committed batches (~the 21M-row plateau), resume
# from the RocksDB checkpoint, checksum parity across the kill.
set -uo pipefail
set -x
cd /root/repo

# ---- disk-budget preamble (VERDICT r15 next #8) -----------------------
# 1B-event prep corpus ~13 GB + RocksDB checkpoints; need ~25 GB free.
NEED_GB=25
AVAIL_GB=$(df -BG --output=avail / | tail -1 | tr -dc '0-9')
if [ "$AVAIL_GB" -lt "$NEED_GB" ]; then
  echo "REFUSING: need ${NEED_GB} GB free on /, have ${AVAIL_GB} GB."
  echo "Re-landable state that can be cleared:"
  du -sh /root/repo/spark-warehouse/graft_ann_* 2>/dev/null | sort -rh | head
  du -sh /tmp/scale*d1 /tmp/win1b 2>/dev/null | sort -rh | head
  exit 2
fi

CLS=/tmp/win1b_classes_r16
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

SPARK_GRAFT_WIN_KINDS=session SPARK_GRAFT_WIN_RESTART=10 \
  run_probe graft.tools.WinScaleProbe 10000 \
  > /tmp/win1b_session_restart.log 2>&1
cp /tmp/win1b/win_scale.json /root/repo/WINSCALE_r16_10000x_session_restart.json

echo DONE_R16_SESSION_RESTART
