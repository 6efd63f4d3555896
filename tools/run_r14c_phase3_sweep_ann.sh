#!/usr/bin/env bash
# Round-14 session C, phases 3-5, all QUIET-BOX, sequential:
#   3. BatchWinSweep over the 1B prep corpus (sec-vs-partitions
#      headline), then free the 1B prep dir
#   4. ANN measurements: recall 100x (re-recorded quiet — the committed
#      artifact was from the load-overlapped pass) + recall 1000x,
#      rate-serve (ivfpq rpp60, ivfpq rpp20, mixed prefix+ivfpq),
#      delete-heavy maintenance with MAXTOMBS=8000 (per-table trigger
#      actually fires; 30000 never crossed at 16x80% deletes)
#   5. 20M sims cold + warm (the sim4b/sim4c crossover corpus)
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

# ---- 3: batch partition sweep, quiet box ---------------------------
export SPARK_GRAFT_PROBE_OUT=/tmp/win1b
run64 graft.tools.BatchWinSweep /tmp/win1b/winprobe_prep_10000 \
  > /tmp/win1b_sweep.log 2>&1
cp /tmp/win1b/batch_win_sweep.json /root/repo/BATCHWIN_r14_10000x_sweep.json
rm -rf /tmp/win1b/winprobe_prep_10000
echo STEP3_DONE

# ---- 3.5: re-land the 20M prefix/ivfpq indexes -----------------------
# the overlapped PreLand hit ENOSPC (spill) beside the 1B tumbling
# checkpoint; the prep corpus + checkpoint are freed now, so the
# landing re-runs alone with ~60G headroom (un-timed build)
SPARK_GRAFT_PRELAND_KINDS=prefix,ivfpq \
  run64 graft.tools.PreLand /tmp/scale10000d1 > /tmp/ann14_preland20m_b.log 2>&1
echo STEP35_DONE

# ---- 4: quiet ANN measurements --------------------------------------
export SPARK_GRAFT_PROBE_OUT=/tmp/ann14q
mkdir -p /tmp/ann14q

SPARK_GRAFT_RERANK_SWEEP=20,60,250 \
  run24 graft.tools.RecallProbe /tmp/scale100d1 > /tmp/ann14q_recall100.log 2>&1
cp /tmp/ann14q/recall.json /root/repo/RECALL_r14_100x.json
SPARK_GRAFT_RERANK_SWEEP=20,60,250 SPARK_GRAFT_RECALL_OOS_ONLY=1 \
  SPARK_GRAFT_RECALL_KINDS=prefix,ivfpq \
  run24 graft.tools.RecallProbe /tmp/scale1000d1 > /tmp/ann14q_recall1000.log 2>&1
cp /tmp/ann14q/recall.json /root/repo/RECALL_r14_1000x.json

SPARK_GRAFT_SERVE_KIND=ivfpq SPARK_GRAFT_SERVE_RPP=60 \
  SPARK_GRAFT_SERVE_RATES=1,2,4 SPARK_GRAFT_SERVE_SEC=60 \
  SPARK_GRAFT_RATE_TAG=r14_rpp60 \
  run24 graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14q_rate_ivfpq60.log 2>&1
SPARK_GRAFT_SERVE_KIND=ivfpq SPARK_GRAFT_SERVE_RPP=20 \
  SPARK_GRAFT_SERVE_RATES=2,4,8,16 SPARK_GRAFT_SERVE_SEC=60 \
  SPARK_GRAFT_RATE_TAG=r14_rpp20 \
  run24 graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14q_rate_ivfpq20.log 2>&1
SPARK_GRAFT_SERVE_KIND=prefix+ivfpq SPARK_GRAFT_SERVE_RATES=64,2 \
  SPARK_GRAFT_SERVE_SEC=120 SPARK_GRAFT_RATE_TAG=r14 \
  run24 graft.tools.RateServeProbe /tmp/scale1000d1 > /tmp/ann14q_rate_mixed.log 2>&1
cp /tmp/ann14q/RATESERVE_r14*.json /root/repo/

SPARK_GRAFT_MAINT_MIX=10,10,80 SPARK_GRAFT_MAINT_COMPACT=4 \
  SPARK_GRAFT_MAINT_SLIVER=0.5 SPARK_GRAFT_MAINT_MAXTOMBS=8000 \
  SPARK_GRAFT_MAINT_BATCHES=16 SPARK_GRAFT_MAINT_ROWS=5000 \
  SPARK_GRAFT_MAINT_SERVE=1 SPARK_GRAFT_MAINT_TAG=deletes \
  run24 graft.tools.MaintenanceProbe /tmp/scale1000d1 > /tmp/ann14q_maint.log 2>&1
cp /tmp/ann14q/MAINT_r14_*_deletes.json /root/repo/
rm -rf /tmp/maint_corpus*
echo STEP4_DONE

# ---- 5: 20M cold + warm sims (quiet) --------------------------------
# Per ADVICE r14: only publish probe.json when the probe step exits 0 —
# the original unconditional cp would have committed a partial/stale
# probe.json under a completed-run name after the 20M landing ENOSPC'd
# (it got lucky: no probe.json existed to copy).
if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run64 graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims20m_cold.log 2>&1; then
  cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r14_20M_sims_cold.json
else
  echo "20M cold probe FAILED — artifact not published"
fi
if SPARK_GRAFT_PROBE_DUP=0.01 SPARK_GRAFT_PROBE_TABLES=embeddings \
  SPARK_GRAFT_PROBE_SRC=/tmp/scale1000d1 SPARK_GRAFT_PROBE_OUT=/tmp/scale10000d1 \
  run64 graft.tools.ScaleProbe 10 \
    sim2b_ann_ivf_served sim4b_ann_pq_served sim4c_ann_ivfpq_served \
  > /tmp/ann14_sims20m_warm.log 2>&1; then
  cp /tmp/scale10000d1/probe.json /root/repo/PROBE_r14_20M_sims_warm.json
else
  echo "20M warm probe FAILED — artifact not published"
fi
echo DONE_PHASES_3_4_5
