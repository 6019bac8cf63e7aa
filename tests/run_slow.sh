#!/bin/bash
# Chunked slow-suite runner: one pytest process per test file.
#
# Motivation (round 5): two full-suite `pytest -m slow` runs segfaulted
# inside XLA:CPU's JIT (`backend_compile_and_load`, LLVM layer) after
# ~20-30 accumulated DMFT-loop compiles in ONE process — at a different
# test each time, every victim test passing in isolation, with 125 GB
# RAM free (so not OOM). Per-file processes bound the in-process compile
# count and make the suite deterministic again. Exit code 5 (= no slow
# tests in that file) is treated as success.
set -u
cd "$(dirname "$0")/.." || exit 1
fail=0
for f in tests/test_*.py; do
  python -m pytest "$f" -q -m slow --no-header 2>&1 | tail -2 \
    | sed "s|^|[$f] |"
  rc=${PIPESTATUS[0]}
  if [ "$rc" != 0 ] && [ "$rc" != 5 ]; then
    fail=1
    echo "[$f] FAILED (exit $rc)"
  fi
done
if [ "$fail" = 0 ]; then echo "SLOW SUITE: all green"; else echo "SLOW SUITE: FAILURES"; fi
exit $fail
