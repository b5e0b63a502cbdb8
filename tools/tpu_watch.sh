#!/bin/bash
# Probe the axon tunnel until it answers, then run the round-3 chip
# measurement queue (tools/chip_measure.sh). Log: /tmp/tpu_watch.log.
set -u
LOG=/tmp/tpu_watch.log
echo "=== tpu_watch start $(date) ===" >> "$LOG"
while true; do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; print('TPU OK', jax.devices())" >> "$LOG" 2>&1; then
    echo "tunnel up $(date)" >> "$LOG"
    break
  fi
  echo "probe failed $(date); retry in 120s" >> "$LOG"
  sleep 120
done
bash /root/repo/tools/chip_measure.sh
echo "=== chip_measure finished $(date) ===" >> "$LOG"
