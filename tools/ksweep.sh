#!/bin/bash
# sweep additive kernel tunables, interleaved-ish (sequential runs)
cd /root/repo
for cfg in "64 32 256" "128 32 256" "64 16 256" "64 64 256" "64 32 128" "32 32 256"; do
  set -- $cfg
  echo "=== U=$1 SUB=$2 TILE=$3 ==="
  OSCEN_ADDITIVE_UNROLL=$1 OSCEN_ADDITIVE_SUB=$2 OSCEN_ADDITIVE_TILE=$3 \
    python tools/kbench.py 2>&1 | grep -E 'best|median'
done
