#!/bin/bash
# Multi-seed learning validation driver (round-5 verdict item 3):
# n>=3 independent draws per protocol, run sequentially so the single
# tunneled TPU chip is never contended. Logs to /tmp/seeds/.
set -u
mkdir -p /tmp/seeds
cd /root/repo
for s in 1 2 3; do
  echo "=== firenet seed $s start $(date +%T) ==="
  timeout 7200 python benchmarks/validate_learning3.py --motion --seed $s \
    > /tmp/seeds/firenet_s$s.log 2>&1
  echo "=== firenet seed $s done rc=$? $(date +%T) ==="
  echo "=== unet seed $s start $(date +%T) ==="
  timeout 7200 python benchmarks/validate_learning_unet.py 8000 --seed $s \
    > /tmp/seeds/unet_s$s.log 2>&1
  echo "=== unet seed $s done rc=$? $(date +%T) ==="
done
