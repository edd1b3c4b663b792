#!/bin/bash
# A/B the r17 epoch/instance-fence cost (r17 verdict item 3): alternate
# TimeOne solos of the PRE-fence build (worktree at e29ed34^ = 99ae26d,
# compiled at $PRE) vs HEAD over the connector lifecycle keys that
# regressed in the r17 builder mirror, plus non-connector controls.
# Usage: tools/ab_fence.sh <pre_worktree_dir> <out_file>
set -u
PRE=${1:-/tmp/prefence}
OUT=${2:-/tmp/ab_fence_r18.txt}
KEYS="w02_change_feed w04_merge w05_sql_merge w06_sql_delete_update w10_sql_rtas s07_ann_ivfpq d07_dedup_clusters d04_dedup_ngram"
: > "$OUT"
for k in $KEYS; do
  for side in pre head; do
    dir=$([ "$side" = pre ] && echo "$PRE" || echo /root/repo)
    line=$(cd "$dir" && SPARK_GRAFT_CPUS=32 sbt -batch \
      "runMain graft.TimeOne $k /root/testdata/sf0.1 /root/testdata/sf0.001" 2>&1 \
      | grep -oE "TIME[0-9]=[0-9.]+" | tr '\n' ' ')
    echo "$k $side $line" | tee -a "$OUT"
  done
done
echo "done" | tee -a "$OUT"
