#!/bin/bash
# Round-4: train the Mask R-CNN and Keypoint R-CNN synthetic weight
# artifacts ON THE TPU CHIP. The round-3 CPU attempt burned 4h in the
# XLA:CPU compile of the maskrcnn train step and timed out (rc=124,
# /tmp/artifacts_train.log); the chip compiles the same graph in
# minutes through the relay and the 96px bs4 steps are trivial.
# Registers the chip pidfile so measurement queues serialize behind it.
set -u
cd /root/repo
LOG=/tmp/artifacts_chip.log
echo "=== train_artifacts_chip $(date) ===" >> "$LOG"

while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 60
done
echo $$ > /tmp/chip_measure.pid

chip_train() {
  timeout 3600 python -c "
from object_detectors_tpu.analysis import make_artifacts
make_artifacts.train_$1()
" >> "$LOG" 2>&1
  echo "--- $1 rc=$? $(date) ---" >> "$LOG"
}
chip_train maskrcnn
chip_train keypointrcnn
rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
