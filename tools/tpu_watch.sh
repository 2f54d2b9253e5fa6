#!/bin/bash
# Poll TPU health; when alive, run the full probe sweep once and exit.
# Results land in /tmp/tpu_sweep_results.txt
cd /root/repo
OUT=/tmp/tpu_sweep_results.txt
: > "$OUT"
for i in $(seq 1 200); do
  if timeout 60 python tools/tpu_probe.py health >> "$OUT" 2>&1; then
    echo "=== TPU ALIVE (attempt $i, $(date)) ===" >> "$OUT"
    echo "--- gather ---" >> "$OUT"
    timeout 400 python tools/tpu_probe.py gather >> "$OUT" 2>&1
    for pb in direct sorted binned pallas; do
      echo "--- wave PHASE_B=$pb ---" >> "$OUT"
      OWLPT_PHASE_B=$pb timeout 400 python tools/tpu_probe.py phaseb >> "$OUT" 2>&1
    done
    echo "--- cluster-size sweep (direct) ---" >> "$OUT"
    timeout 500 python tools/tpu_probe.py sweep >> "$OUT" 2>&1
    echo "--- render ---" >> "$OUT"
    timeout 500 python tools/tpu_probe.py render >> "$OUT" 2>&1
    echo "=== DONE $(date) ===" >> "$OUT"
    exit 0
  fi
  echo "attempt $i: TPU dead $(date)" >> "$OUT"
  sleep 90
done
exit 1
