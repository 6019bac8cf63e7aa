#!/bin/bash
# Round-5c e2e measurement: factored-diagonal transfer (sweep_plain ships
# per-(spin,n) occupation factors; dense diagonals rebuilt on device).
#   run A (fact-cold): new jit keys compile, populating the cache
#   run B (fact-warm5): cache-warm cold process, 5 iterations
cd /root/repo || exit 1
OUT=artifacts/r5c_e2e_runs.jsonl
: > "$OUT"
for tag in fact-cold fact-warm5; do
  nloop=3
  [ "$tag" = fact-warm5 ] && nloop=5
  echo "=== run $tag (nloop=$nloop) start $(date +%T) ===" >> artifacts/r5c_e2e_driver.log
  { echo -n "{\"run\": \"$tag\", \"line\": "
    timeout 3500 python bench_e2e.py --workload large --nloop $nloop \
      2>> artifacts/r5c_e2e_driver.log
    echo "}"
  } | tr -d '\n' >> "$OUT"
  echo >> "$OUT"
  echo "=== run $tag end $(date +%T) ===" >> artifacts/r5c_e2e_driver.log
done
echo "ALL DONE $(date +%T)" >> artifacts/r5c_e2e_driver.log
