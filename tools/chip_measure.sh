#!/bin/bash
# Round-3 chip measurement queue — run when the axon tunnel is back.
# Each step appends to /tmp/chip_measure.log; keep the host otherwise
# idle (1 CPU core: concurrent load skews kernel timings 2x).
set -u
cd /root/repo
LOG=/tmp/chip_measure.log
echo "=== chip_measure $(date) ===" >> "$LOG"

# one CPU core: a concurrent heavy job (artifact training, pytest)
# skews kernel timings 2x — wait for all of them to finish first
wait_heavy() {
  while true; do
    busy=""
    for f in /tmp/frcnn_artifact.pid /tmp/cpu_heavy_*.pid; do
      [ -f "$f" ] || continue
      if kill -0 "$(cat "$f")" 2>/dev/null; then
        busy="$f"
      else
        rm -f "$f"
      fi
    done
    [ -z "$busy" ] && break
    echo "waiting for heavy job $busy (pid $(cat "$busy")) $(date)" >> "$LOG"
    sleep 120
  done
}
wait_heavy

run() {
  echo "--- $1 ---" >> "$LOG"
  shift
  timeout 2400 "$@" 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
  echo "" >> "$LOG"
}

# 1. pooler kernel A/B: per-RoI windows vs tiled, fold variants
run "roialign variants" \
  python -m object_detectors_tpu.analysis.roialign_bench \
  --variants noop pallas pallas_mm2 pallas_compute tiled tiled_mm2 \
  tiled_dma hybrid hybrid_tiled

# 2. backbone: s2d stem + fused blocks A/B
run "backbone (s2d stem, unfused)" \
  python -m object_detectors_tpu.analysis.backbone_ablate --bs 16
run "backbone (s2d stem, fused blocks)" \
  python -m object_detectors_tpu.analysis.backbone_ablate --bs 16 --fused

# 3. FRCNN end-to-end stage ablation, both poolers
run "frcnn ablate (window pooler)" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16
run "frcnn ablate (tiled pooler)" \
  python -m object_detectors_tpu.analysis.frcnn_ablate --bs 16 \
  --pooler pallas_tiled

# 4. RetinaNet stage ablation
run "retinanet ablate" \
  python -m object_detectors_tpu.analysis.retinanet_ablate --bs 16

# 5. Darknet stage ablation (YOLO backbone stem pathology check)
run "darknet ablate" \
  python -m object_detectors_tpu.analysis.darknet_ablate --bs 32

# 6. exact big-k selection primitives (RPN/RetinaNet topk)
run "topk primitives" \
  python -m object_detectors_tpu.analysis.topk_bench

# 6b. serving dispatch-budget decomposition (relay vs kernel bound)
run "serving budget" \
  python -m object_detectors_tpu.analysis.serving_ablate

# 7. the three weak BASELINE configs (quick reads to iterate against)
echo "--- bench weak configs ---" >> "$LOG"
timeout 3500 python bench.py --configs frcnn640 retinanet640 serving \
  2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"

# 8. reference protocol CSV with the trained-YOLO artifact (map > 0)
echo "--- protocol csv ---" >> "$LOG"
timeout 2400 python bench.py --protocol \
  2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"

# 9. full bench (all five configs + train step + NMS distributions)
echo "--- full bench ---" >> "$LOG"
timeout 5400 python bench.py 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"

echo "=== done $(date) ===" >> "$LOG"
