#!/bin/bash
# Poll TPU health; when alive, run probe stages; exit after one full pass.
cd /root/repo
OUT=/tmp/tpu_sweep_results.txt
echo "=== watcher restart $(date) ===" >> "$OUT"
for i in $(seq 1 200); do
  if timeout 90 python tools/tpu_probe.py health >> "$OUT" 2>&1; then
    echo "=== TPU ALIVE (attempt $i, $(date)) ===" >> "$OUT"
    echo "--- direct no-overflow ---" >> "$OUT"
    OWLPT_EXACT_OVERFLOW=0 OWLPT_PHASE_B=direct timeout 400 python tools/tpu_probe.py phaseb >> "$OUT" 2>&1
    echo "--- pallas no-overflow ---" >> "$OUT"
    OWLPT_EXACT_OVERFLOW=0 OWLPT_PHASE_B=pallas timeout 400 python tools/tpu_probe.py phaseb >> "$OUT" 2>&1
    echo "--- binned no-overflow ---" >> "$OUT"
    OWLPT_EXACT_OVERFLOW=0 OWLPT_PHASE_B=binned timeout 400 python tools/tpu_probe.py phaseb >> "$OUT" 2>&1
    echo "--- render no-overflow direct ---" >> "$OUT"
    OWLPT_EXACT_OVERFLOW=0 timeout 500 python tools/tpu_probe.py render >> "$OUT" 2>&1
    echo "=== DONE $(date) ===" >> "$OUT"
    exit 0
  fi
  echo "attempt $i: TPU dead $(date)" >> "$OUT"
  sleep 60
done
