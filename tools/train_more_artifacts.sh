#!/bin/bash
# Chain job: wait for the chip measurement queue to finish (its CPU
# dispatch load would skew kernel timings on this 1-core host), then
# train the Mask R-CNN and Keypoint R-CNN synthetic weight artifacts on
# the CPU backend. Registers itself as a cpu_heavy job so any future
# chip run waits for it.
set -u
cd /root/repo
LOG=/tmp/artifacts_train.log
echo "=== train_more_artifacts $(date) ===" >> "$LOG"

while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 120
done

# register only once actually CPU-heavy — registering before the wait
# deadlocks against the chip queue's wait_heavy (mutual wait)
echo $$ > /tmp/cpu_heavy_artifacts.pid

# sitecustomize pins the axon TPU platform and ignores JAX_PLATFORMS;
# jax.config.update is the only reliable CPU pin (see
# tools/train_frcnn_artifact.py)
cpu_train() {
  timeout 14400 python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
from object_detectors_tpu.analysis import make_artifacts
make_artifacts.train_$1()
" >> "$LOG" 2>&1
  echo "--- $1 rc=$? $(date) ---" >> "$LOG"
}
cpu_train maskrcnn
cpu_train keypointrcnn
rm -f /tmp/cpu_heavy_artifacts.pid
echo "=== done $(date) ===" >> "$LOG"
