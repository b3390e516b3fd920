#!/bin/bash
# Round-3 final on-chip queue: everything perf_queue_r3.sh did not finish
# (the session ended mid k=128) plus the r3b follow-ups.  One job on the
# chip at a time (memory/axon-tpu-quirks.md).
set -x
cd /root/repo

echo '=== fused conv+GN+SiLU standalone bf16 (row-chunked kernel) ==='
timeout 2400 python bench.py --iters 8 --fused-conv

echo '=== flash-attention block sweep 4096/16384 ==='
timeout 3600 python benchmarks/attn_bench.py --repeats 3

echo '=== hostops micro-bench (incl. jpeg decode) ==='
timeout 600 python benchmarks/hostops_bench.py

echo '=== training k-curve: k=64 (MFU) and k=128 ==='
timeout 3600 python benchmarks/train_bench.py --steps-per-call 64 --iters 2
timeout 3600 python benchmarks/train_bench.py --steps-per-call 128 --iters 1

echo '=== full BASELINE config matrix -> benchmarks/results.json ==='
timeout 10800 python benchmarks/run_all.py

echo '=== done ==='
