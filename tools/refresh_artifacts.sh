#!/bin/bash
# Regenerate every TPU-measured artifact of record, in dependency order.
# Run from the repo root with the TPU visible (the axon tunnel up).
# Each step logs to /tmp and keeps going on failure so one flaky stage
# doesn't lose the rest; check the summary at the end.
set -u
cd "$(dirname "$0")/.."

declare -A rc
run() {
  local name="$1"; shift
  echo "=== $name: $*"
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "/tmp/refresh_$name.log" 2>&1
  rc[$name]=$?
  tail -2 "/tmp/refresh_$name.log"
}

run bench_headline python bench.py
run bench_all      python bench.py --all
# bench_all prints one JSON line per config; the artifact of record is
# the JSON lines only (warnings go to stderr but stay defensive)
if [ "${rc[bench_all]}" -eq 0 ]; then
  grep '^{' /tmp/refresh_bench_all.log > BENCH_ALL.jsonl
fi
run tpu_parity     python tools/tpu_parity.py
# --blocks must match across runs: SERVING.json merges tiers only when
# the block count agrees with the artifact of record (1600)
run serving        python tools/serving_bench.py --blocks 1600
run serving_f16    python tools/serving_bench.py --blocks 1600 --fdl-dtype float16
run serving_folded python tools/serving_bench.py --blocks 1600 --folded
run serving_f16_folded python tools/serving_bench.py --blocks 1600 --folded --fdl-dtype float16
run profile        python tools/profile_headline.py

echo "=== summary"
for k in bench_headline bench_all tpu_parity serving serving_f16 \
         serving_folded serving_f16_folded profile; do
  echo "$k: rc=${rc[$k]} (log /tmp/refresh_$k.log)"
done
