#!/bin/bash
# Round-5 queue (g): pair-fold pooler A/B + fused kth-code chain
# attribution.
#  1. FRCNN: fold=pair (14 dynamic band reads/RoI instead of 28) vs
#     the rows default, in-graph (full_pieces vs full_pair). The
#     grouped compute is read-issue-bound (BASELINE.md r4), so the
#     read count is the lever quad/wide never touched.
#  2. filter_topk (fused trip chain default, ddca945) vs
#     filter_topk_perlevel (r4 separate chains) — the fused chain
#     landed without a chip number.
set -u
cd /root/repo
LOG=/tmp/queue_r5g.log
# serialize on the predecessor's done line (pidfile alone can race)
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r5g $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3600 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "frcnn pair fold + fused-chain topk bs16" \
  python -u -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages filter_topk filter_topk_perlevel full_pieces full_pair

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
