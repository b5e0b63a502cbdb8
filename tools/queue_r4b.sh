#!/bin/bash
# Round-4 queue B — decision measurements for the FRCNN detection half:
#  * pooler MARGINAL cost in the full graph (full vs full_no_pooler)
#  * band-kernel budget: step overhead (bands_dma) vs compute
#  * filter after the NMS unroll=2 change
#  * train-step stage budget (VERDICT item 4)
set -u
cd /root/repo
LOG=/tmp/queue_r4b.log
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r4b $(date) ===" >> "$LOG"
bash tools/trainer_pause.sh stop >> "$LOG" 2>&1

run() {
  echo "--- $1 $(date +%H:%M:%S) ---" >> "$LOG"
  shift
  timeout 3000 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

run "roialign band budget" \
  python -m object_detectors_tpu.analysis.roialign_bench \
  --variants noop bands bands_dma bands_compute pallas hybrid_bands

run "rpnfilter unroll2" \
  python -m object_detectors_tpu.analysis.rpnfilter_ablate --bs 16 \
  --stages full_filter

run "frcnn marginal stages bs16" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --stages full full_pieces full_no_pooler full_no_filter

run "train ablate bs16" \
  python -m object_detectors_tpu.analysis.train_ablate --bs 16

run "train ablate bs32" \
  python -m object_detectors_tpu.analysis.train_ablate --bs 32

run "retinanet640 after unroll" python - <<'EOF'
import bench
print("retinanet bs16:", bench.run_retinanet(bs=16))
EOF

run "frcnn640 after unroll+chunk" python - <<'EOF'
import bench
print("frcnn bs16:", bench.run_frcnn(bs=16))
print("frcnn bs32:", bench.run_frcnn(bs=32))
EOF

bash tools/trainer_pause.sh cont >> "$LOG" 2>&1
rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
