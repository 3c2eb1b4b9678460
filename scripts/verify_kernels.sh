#!/usr/bin/env bash
# Kernel-change verify gate (VERDICT r3 item 1): NO kernel change is
# committed without bench.py AND the full Mosaic compile sweep passing
# on the attached TPU.  The sweep includes the exact bench.py step
# functions and the sharded channelized pipeline, so "gate green"
# implies "the driver's bench compiles" and "the sharded path compiles
# under Mosaic".
#
# Usage: scripts/verify_kernels.sh     (~4 min; bench alone ~15 s)
set -e
cd "$(dirname "$0")/.."
echo "== bench.py (headline config, real chip) =="
timeout 600 python bench.py
echo "== compile sweep (every pallas kernel family) =="
timeout 2400 python bench.py --compile-sweep
echo "== verify gate green =="
