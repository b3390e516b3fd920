#!/bin/bash
# Round-3 follow-up on-chip queue (after perf_queue_r3.sh):
#   - standalone fused-conv ablation: the r3 queue's attempt hit the
#     scoped-vmem stack OOM at 64x64x320 before the row-chunked conv
#     accumulation landed (ops/conv_fused.py); the combined fused+int8 run
#     already validated the fix on-chip (0.83 -> 0.97 img/s over int8 alone).
#   - flash-attention block sweep: the r3 queue's run died on a missing
#     sys.path insert (fixed in benchmarks/attn_bench.py).
#   - hostops micro-bench incl. the new native JPEG decode.
# One job on the chip at a time (memory/axon-tpu-quirks.md).
set -x
cd /root/repo

echo '=== fused conv+GN+SiLU standalone (row-chunked kernel) ==='
timeout 2400 python bench.py --iters 8 --fused-conv

echo '=== flash-attention block sweep 4096/16384 ==='
timeout 3600 python benchmarks/attn_bench.py --repeats 3

echo '=== hostops micro-bench (jpeg decode) ==='
timeout 600 python benchmarks/hostops_bench.py

echo '=== done ==='
