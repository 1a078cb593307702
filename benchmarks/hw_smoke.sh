#!/bin/bash
# Per-round hardware smoke: drive the example workloads end-to-end on the
# attached TPU chip and append a round-stamped log (the manual pattern of
# benchmarks/hw_smoke_r02.log / _r03.log, automated).
#
# Usage: bash benchmarks/hw_smoke.sh [round-tag]     (run from /root/repo)
# NOTE: takes the TPU lock -- never run concurrently with bench.py or other
# TPU processes (one process holds the chip at a time).
set -u
cd "$(dirname "$0")/.."
TAG=${1:-manual}
LOG=benchmarks/hw_smoke_${TAG}.log
: > "$LOG"

run() { # name, cmd...
  local name=$1; shift
  echo "--- $name" | tee -a "$LOG"
  timeout 580 "$@" 2>&1 | grep -v -e Warning -e WARNING | tail -12 >> "$LOG"
  # PIPESTATUS[0]: the example's own exit code ($? would report tail's,
  # masking failures -- bit the r5 smoke when examples/gpt.py asserted)
  echo "$name rc=${PIPESTATUS[0]}" | tee -a "$LOG"
}

run gradient_descent python examples/gradient_descent.py
run mlp python examples/mnist.py --steps 200
run cnn python examples/mnist.py --model cnn --steps 120
run bert python examples/bert.py
run gpt_char python examples/gpt.py --steps 120
# default steps (800): 300 under-trains the reversal demo (r5: 0/4 exact)
run t5_seq2seq python examples/t5.py

echo "smoke log written to $LOG"
