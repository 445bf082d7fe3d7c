#!/bin/bash
# Round-5 final TPU job: re-measure the AOT cold-start rows now that
# export_artifact ships serving-dtype (bf16) params (VERDICT r4 item 6's
# "cold-start table re-measured" half). Waits for the fuzz sweep so only one
# TPU client talks to the tunnel at a time.
#
#   nohup bash scripts/r5_coldstart_after_fuzz.sh > /tmp/r5_coldstart.log 2>&1 &
set -ux
cd "$(dirname "$0")/.."

while [ ! -f /tmp/r5_fuzz_done ]; do sleep 60; done
sleep 45

python scripts/bench_aot_coldstart.py > /tmp/aot_coldstart_r5.log 2>&1 || true

echo DONE > /tmp/r5_coldstart_done
