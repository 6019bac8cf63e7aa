#!/bin/bash
# Round-5 e2e measurement sequence (VERDICT r4 items 1, 2, 8):
#   run A: compile-cache COLD process (populates ~/.cache/dmft_ed_tpu/xla)
#   run B: cache-warm cold process, 3 iterations — the headline artifact
#   run C: cache-warm cold process, 4 iterations — extra steady samples
# Each prints one JSON line (now with iter_s + stages_per_iter).
cd /root/repo || exit 1
OUT=artifacts/r5_e2e_runs.jsonl
: > "$OUT"
for tag in cold warm3 warm4; do
  nloop=3
  [ "$tag" = warm4 ] && nloop=4
  echo "=== run $tag (nloop=$nloop) start $(date +%T) ===" >> artifacts/r5_e2e_driver.log
  { echo -n "{\"run\": \"$tag\", \"line\": "
    timeout 3500 python bench_e2e.py --workload large --nloop $nloop \
      2>> artifacts/r5_e2e_driver.log
    echo "}"
  } | tr -d '\n' >> "$OUT"
  echo >> "$OUT"
  echo "=== run $tag end $(date +%T) ===" >> artifacts/r5_e2e_driver.log
done
echo "ALL DONE $(date +%T)" >> artifacts/r5_e2e_driver.log
