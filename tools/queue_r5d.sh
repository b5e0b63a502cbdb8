#!/bin/bash
# Round-5 queue (d): the decision measurements r5a/c left pending.
#  1. FRCNN batched vs per-level filter topk (clean A/B — r5a's full
#     ran +1.7 ms over r4n with batched as default; confirm and pick).
#  2. FRCNN full_nofix: the hybrid's unconditional 16-RoI/img gather
#     fixup repool — prime suspect for in-graph 16.3 vs isolated
#     9.2 ms pooler marginal.
#  3. RetinaNet bs16 vs bs32 on the SERVE pipeline (run_retinanet) —
#     r4f said bs32 wins (395.0), r5a's ablate said it loses (346.4);
#     decide the bench default on the pipeline the bench actually runs.
# Only start on a quiet CPU (no pytest) — CLAUDE.md r3.
set -u
cd /root/repo
LOG=/tmp/queue_r5d.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r5d $(date) ===" >> "$LOG"

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3600 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "frcnn topk A/B + nofix bs16" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages filter_topk_perlevel filter_topk full_pieces full_nofix \
  full_no_pooler

run "retinanet serve pipeline bs16 vs bs32" \
  python - <<'EOF'
import json
import bench
for bs in (16, 32):
    v, m = bench.run_retinanet(bs=bs)
    print(json.dumps({"bs": bs, "img_s": round(v, 1), "mfu": m}))
EOF

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
