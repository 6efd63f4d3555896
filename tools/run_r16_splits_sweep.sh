#!/usr/bin/env bash
# Round-16 item #7: landing-splits sizing rule. Sweep
# SPARK_GRAFT_LAND_SPLITS over 4/8/16 on the 10M prefix landing and
# record wall time + peak disk, to state the formula (per-task sort ≈
# table bytes / (buckets × splits) vs per-task overhead) as a PLANS.md
# rule. The landed table is removed between arms (same fingerprint
# would otherwise short-circuit the re-land).
set -uo pipefail
set -x
cd /root/repo

NEED_GB=45
AVAIL_GB=$(df -BG --output=avail / | tail -1 | tr -dc '0-9')
if [ "$AVAIL_GB" -lt "$NEED_GB" ]; then
  echo "REFUSING: need ${NEED_GB} GB free on /, have ${AVAIL_GB} GB."
  du -sh /root/repo/spark-warehouse/graft_ann_* /tmp/scale*d1 /tmp/win1b /tmp/skq* 2>/dev/null | sort -rh | head
  exit 2
fi
[ -e /tmp/scale5000d1/embeddings.parquet ] || { echo "REFUSING: corpus /tmp/scale5000d1 missing"; exit 2; }

CLS=/tmp/splits16_classes
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

SUF=$(printf '/tmp/scale5000d1' | md5sum | cut -c1-16)
SAMPLE_PID=""
start_sampler() {
  rm -f /tmp/splits16_peak
  ( while true; do df -k / | tail -1 | awk '{print $3}' >> /tmp/splits16_peak; sleep 5; done ) &
  SAMPLE_PID=$!
}
stop_sampler() {
  kill "$SAMPLE_PID" 2>/dev/null; wait "$SAMPLE_PID" 2>/dev/null
  sort -n /tmp/splits16_peak | tail -1 | awk '{printf "%.1f", $1/1048576}'
}

ARMS=""
for SPL in 4 8 16; do
  for t in graft_ann_index_$SUF graft_ann_index_${SUF}__tombs \
           graft_ann_ivfpq_$SUF graft_ann_fine_$SUF graft_ann_pq_codes_$SUF; do
    rm -rf "/root/repo/spark-warehouse/$t"
  done
  rm -f "/root/repo/spark-warehouse/graft_ann_quantizer_$SUF.bin"
  start_sampler; t0=$(date +%s)
  if SPARK_GRAFT_PRELAND_KINDS=prefix SPARK_GRAFT_LAND_SPLITS=$SPL \
    java $ADD_OPENS -Xmx64g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Dspark.sql.objectHashAggregate.sortBased.fallbackThreshold=2097152 \
      -cp "$CLS:/opt/spark/jars/*" graft.tools.PreLand /tmp/scale5000d1 \
      > /tmp/splits16_s$SPL.log 2>&1; then OK=1; else OK=0; fi
  t1=$(date +%s); SEC=$((t1-t0)); PK=$(stop_sampler)
  FILES=$(find /root/repo/spark-warehouse/graft_ann_index_$SUF -name '*.parquet' 2>/dev/null | wc -l)
  ARMS="$ARMS{\"splits\":$SPL,\"ok\":$OK,\"sec\":$SEC,\"peak_disk_used_gb\":$PK,\"index_files\":$FILES},"
done
cat > /root/repo/PRELAND_r16_splits.json <<EOF
{"corpus": "/tmp/scale5000d1", "vectors": 10000000, "kind": "prefix",
 "sweep": [${ARMS%,}],
 "note": "SPARK_GRAFT_LAND_SPLITS sweep on the 10M prefix landing; per-task pass-2 sort ~= table bytes / (16 buckets x splits)"}
EOF
echo DONE_R16_SPLITS
