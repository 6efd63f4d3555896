#!/usr/bin/env bash
# Round-16 item #2: re-bench the sketch-heavy family at 1000x under the
# r15 objectHashAggregate fallbackThreshold (2M keys). These queries
# (CMS/HLL/topk TypedImperativeAggregates over events, dd3's minhash
# banding over documents) were tuned when every >128-group agg silently
# sort-fell-back; any win from the raised threshold is free. A/B: the
# same corpus + query list at threshold 128 (the old default) vs 2M.
# ScaleProbe builds its own session (no Graft.session), so the -D
# system property drives the conf. Runs beside the session-1B probe:
# both arms see the same background load, so the A/B ratio holds.
set -uo pipefail
set -x
cd /root/repo

NEED_GB=20
AVAIL_GB=$(df -BG --output=avail / | tail -1 | tr -dc '0-9')
if [ "$AVAIL_GB" -lt "$NEED_GB" ]; then
  echo "REFUSING: need ${NEED_GB} GB free on /, have ${AVAIL_GB} GB."
  du -sh /tmp/scale*d1 /tmp/win1b /tmp/skq* 2>/dev/null | sort -rh | head
  exit 2
fi

CLS=/tmp/skq_classes
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

run() { # $1 = fallbackThreshold, rest = main + args
  # shellcheck disable=SC2086
  java $ADD_OPENS -Xmx24g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.sql.objectHashAggregate.sortBased.fallbackThreshold=$1 \
    -cp "$CLS:/opt/spark/jars/*" "${@:2}"
}

QUERIES="dd3_dedup_minhash_lsh q46_heavy_hitters q47_topk_per_group q53_hll_cardinality q54_window_distinct_hll q56_window_heavy_hitters"

# compose 10x -> 100x -> 1000x of events+documents only (dup 0.01)
export SPARK_GRAFT_PROBE_DUP=0.01
export SPARK_GRAFT_PROBE_TABLES=events,documents
if [ ! -e /tmp/skq1000/_done ]; then
  rm -rf /tmp/skq10 /tmp/skq100 /tmp/skq1000
  SPARK_GRAFT_PROBE_SRC=/root/testdata/sf0.1 SPARK_GRAFT_PROBE_OUT=/tmp/skq10 \
    run 2097152 graft.tools.ScaleProbe 10 none > /tmp/skq_gen10.log 2>&1
  SPARK_GRAFT_PROBE_SRC=/tmp/skq10 SPARK_GRAFT_PROBE_OUT=/tmp/skq100 \
    run 2097152 graft.tools.ScaleProbe 10 none > /tmp/skq_gen100.log 2>&1
  SPARK_GRAFT_PROBE_SRC=/tmp/skq100 SPARK_GRAFT_PROBE_OUT=/tmp/skq1000 \
    run 2097152 graft.tools.ScaleProbe 10 none > /tmp/skq_gen1000.log 2>&1
  rm -rf /tmp/skq10 /tmp/skq100
fi
[ -e /tmp/skq1000/_done ] || { echo GEN1000_FAILED; exit 1; }

# A: the old 128-key default; B: the landed 2M. Fresh JVM each so the
# conf is session-wide and caches don't leak across arms.
# shellcheck disable=SC2086
SPARK_GRAFT_PROBE_SRC=/root/testdata/sf0.1 SPARK_GRAFT_PROBE_OUT=/tmp/skq1000 \
  run 128 graft.tools.ScaleProbe 10 $QUERIES > /tmp/skq_a128.log 2>&1 || echo A128_FAILED
cp /tmp/skq1000/probe.json /root/repo/PROBE_r16_1000x_sketch_fb128.json
# shellcheck disable=SC2086
SPARK_GRAFT_PROBE_SRC=/root/testdata/sf0.1 SPARK_GRAFT_PROBE_OUT=/tmp/skq1000 \
  run 2097152 graft.tools.ScaleProbe 10 $QUERIES > /tmp/skq_b2m.log 2>&1 || echo B2M_FAILED
cp /tmp/skq1000/probe.json /root/repo/PROBE_r16_1000x_sketch_fb2m.json

echo DONE_R16_SKETCH_REBENCH
