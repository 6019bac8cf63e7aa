#!/bin/bash
# Round-5b e2e measurement: the dim-853k loop with BOTH concat engines
# (whole-sweep lockstep sector Lanczos + wide-concat GF resolvents).
#   run A (concat-cold): new jit keys compile, populating the cache
#   run B (concat-warm5): cache-warm cold process, 5 iterations — the
#     headline artifact (>=4 steady samples)
cd /root/repo || exit 1
OUT=artifacts/r5b_e2e_runs.jsonl
: > "$OUT"
for tag in concat-cold concat-warm5; do
  nloop=3
  [ "$tag" = concat-warm5 ] && nloop=5
  echo "=== run $tag (nloop=$nloop) start $(date +%T) ===" >> artifacts/r5b_e2e_driver.log
  { echo -n "{\"run\": \"$tag\", \"line\": "
    timeout 3500 python bench_e2e.py --workload large --nloop $nloop \
      2>> artifacts/r5b_e2e_driver.log
    echo "}"
  } | tr -d '\n' >> "$OUT"
  echo >> "$OUT"
  echo "=== run $tag end $(date +%T) ===" >> artifacts/r5b_e2e_driver.log
done
echo "ALL DONE $(date +%T)" >> artifacts/r5b_e2e_driver.log
