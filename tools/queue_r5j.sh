#!/bin/bash
# Round-5 queue (j): retinanet bs32 with the PERLEVEL select — the one
# unmeasured cell: r4f's 395.0@bs32 was perlevel (won), r5d's
# 328.5@bs32 was batched (lost, since reverted). Paired bs16 row same
# session for a clean comparison.
set -u
cd /root/repo
LOG=/tmp/queue_r5j.log
while [ -f /tmp/chip_measure.pid ] && \
      kill -0 "$(cat /tmp/chip_measure.pid)" 2>/dev/null; do
  sleep 45
done
echo $$ > /tmp/chip_measure.pid
echo "=== queue_r5j $(date) ===" >> "$LOG"

echo "--- retinanet bs32 vs bs16 perlevel $(date +%H:%M:%S) ---" >> "$LOG"
timeout 3600 python -u - <<'EOF' 2>&1 | grep -v "WARNING\|cpu_aot" >> "$LOG"
import json
import bench
v32, m32 = bench.run_retinanet(bs=32)
v16, m16 = bench.run_retinanet(bs=16)
print(json.dumps({"retinanet_bs32": round(v32, 1), "mfu32": m32,
                  "retinanet_bs16": round(v16, 1), "mfu16": m16}))
EOF

rm -f /tmp/chip_measure.pid
echo "=== done $(date) ===" >> "$LOG"
