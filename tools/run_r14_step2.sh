#!/usr/bin/env bash
# Round-14 follow-on chain (replaces the tail of run_win1b_r14b.sh,
# whose runner was killed so the steps could be re-sequenced around
# disk and box-quietness constraints):
#   A. wait for the in-flight hopping 1B run; record its artifact
#   B. tumbling-restart 1B (64g) CONCURRENT with 20M ANN corpus
#      datagen + PreLand (24g) — the prep is not a timed headline, and
#      the restart artifact notes the overlapped load
#   C. BatchWinSweep alone (quiet box: sec-vs-partitions is headline)
#   D. quiet ANN re-run (recall/rates/maint — first pass overlapped
#      the hopping probe, latencies not comparable to r13 quiet-box)
#   E. sims20m cold + warm passes (quiet box)
set -x
cd /root/repo || exit 1

CLS=/tmp/win1b_classes   # snapshot taken by run_win1b_r14b.sh

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
    -cp "$CLS:/opt/spark/jars/*" "$@"
}

# ---- A: wait out the hopping run, keep its artifact ----------------
while pgrep -f "graft.tools.WinScaleProbe" > /dev/null; do sleep 30; done
cp /tmp/win1b/win_scale.json /root/repo/WINSCALE_r14_10000x_hopping.json
echo STEP_A_DONE

# ---- B: tumbling restart (64g) || 20M prep (24g) -------------------
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
  # the corpus must exist before PreLand (it reads embeddings.parquet)
  SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
    SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
    run24 graft.tools.ScaleProbe 10 none > /tmp/ann14_gen20m.log 2>&1
  SPARK_GRAFT_PRELAND_KINDS=prefix,ivfpq \
    run24 graft.tools.PreLand /tmp/scale10000d1 > /tmp/ann14_preland20m.log 2>&1
  echo DONE_20M_PREP
) > /tmp/ann14_20mprep_runner.log 2>&1 &
PREPID=$!

wait $WINPID
cp /tmp/win1b/win_scale.json /root/repo/WINSCALE_r14_10000x_tumbling_restart.json
wait $PREPID
echo STEP_B_DONE

# ---- C: batch partition sweep, quiet box ---------------------------
run64 graft.tools.BatchWinSweep /tmp/win1b/winprobe_prep_10000 \
  > /tmp/win1b_sweep.log 2>&1
cp /tmp/win1b/batch_win_sweep.json /root/repo/BATCHWIN_r14_10000x_sweep.json
# the 1B prep corpus is no longer needed; free its 11G before the
# ANN phases land 20M-corpus artifacts
rm -rf /tmp/win1b/winprobe_prep_10000
echo STEP_C_DONE

# ---- D: quiet-box ANN re-measurement -------------------------------
bash tools/run_ann_requiet_r14.sh > /tmp/ann_requiet_runner.log 2>&1
echo STEP_D_DONE

# ---- E: 20M cold + warm sims passes (indexes pre-landed in B) ------
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run64 graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims20m_cold.log 2>&1
cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r14_20M_sims_cold.json
SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run64 graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims20m_warm.log 2>&1
cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r14_20M_sims_warm.json
echo DONE_STEP2_ALL
