#!/bin/bash
# Round-3 session-B queue #2: measure the radix top-k, phase maxpool
# stem, channel-padded fused blocks, and the band pooler.
set -u
cd /root/repo
LOG=/tmp/chip_measure.log
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r3c $(date) ===" >> "$LOG"

run() {
  echo "--- $1 ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

# 1. selection primitives incl. radix
run "topk primitives (radix)" \
  python -m object_detectors_tpu.analysis.topk_bench

# 2. stem sub-stages: conv / bnrelu / reduce_window pool / phase pool
run "backbone stem detail" \
  python -m object_detectors_tpu.analysis.backbone_ablate --bs 16 \
  --stem-detail

# 3. fused bottleneck blocks after the channel-pad fix
run "backbone (fused blocks, chan-pad fix)" \
  python -m object_detectors_tpu.analysis.backbone_ablate --bs 16 --fused

# 4. band pooler vs tiled
run "roialign bands" \
  python -m object_detectors_tpu.analysis.roialign_bench \
  --variants noop tiled tiled_dma bands bands_dma hybrid_bands

# 5. RetinaNet stages after radix postprocess + phase-pool stem
run "retinanet ablate (radix)" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16

# 6. FRCNN stages: band pooler + radix filter
run "frcnn ablate (bands)" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --pooler pallas_bands
run "frcnn ablate (windows, radix filter)" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16

rm -f /tmp/chip_measure.pid
echo "=== queue_r3c done $(date) ===" >> "$LOG"
