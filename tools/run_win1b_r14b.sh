#!/usr/bin/env bash
# Round-14 1B-decade window runs, part 2: the interval kind already ran
# and its artifact is committed (WINSCALE_r14_10000x_interval.json), so
# this variant runs only the remaining steps — hopping, the tumbling
# restart variant, and the batch-side partition sweep. Sequential: the
# runs share one prep corpus and stamp its file mod times.
set -x
cd /root/repo || exit 1

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

# 1. hopping at 1B — the state-heaviest engine's missing decade
SPARK_GRAFT_WIN_KINDS=hopping \
  run_probe graft.tools.WinScaleProbe 10000 \
  > /tmp/win1b_hopping.log 2>&1
cp /tmp/win1b/win_scale.json /root/repo/WINSCALE_r14_10000x_hopping.json

# 2. tumbling at 1B with a mid-run kill + restore (window-state restore
#    at scale)
SPARK_GRAFT_WIN_KINDS=tumbling SPARK_GRAFT_WIN_RESTART=10 \
  run_probe graft.tools.WinScaleProbe 10000 \
  > /tmp/win1b_tumbling_restart.log 2>&1
cp /tmp/win1b/win_scale.json /root/repo/WINSCALE_r14_10000x_tumbling_restart.json

# 3. batch-side partition-scaling sweep over the same 1B prep corpus
run_probe graft.tools.BatchWinSweep /tmp/win1b/winprobe_prep_10000 \
  > /tmp/win1b_sweep.log 2>&1
cp /tmp/win1b/batch_win_sweep.json /root/repo/BATCHWIN_r14_10000x_sweep.json

echo DONE_ALL
