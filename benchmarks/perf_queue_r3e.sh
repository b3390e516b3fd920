#!/bin/bash
# Round-3 queue e — speed benches that depend on the flash-attention block
# table; run AFTER the perf_queue_r3d.sh re-sweep is folded into
# ops/flash_attention._TUNED_BLOCKS.  One job on the chip at a time.
set -x
cd /root/repo

echo '=== attention sweep, adaptive scan lengths (final block-table data) ==='
timeout 7200 python benchmarks/attn_bench.py --seqs 4096,9216,16384 --repeats 3

echo '=== headline iters=12 (final round-3 number) ==='
timeout 2400 python bench.py --iters 12

echo '=== DPM-Solver++ throughput at 20 and 10 steps ==='
timeout 2400 python bench.py --sampler dpmpp --steps 20 --iters 8
timeout 2400 python bench.py --sampler dpmpp --steps 10 --iters 8

echo '=== serving batch sweep (edit_batch) ==='
timeout 2400 python bench.py --batch 2 --iters 4
timeout 2400 python bench.py --batch 4 --iters 4
timeout 3600 python bench.py --batch 8 --iters 4

echo '=== high-res with tuned table + O(bbox) paste ==='
timeout 2400 python bench.py --res 768 --iters 4
timeout 2400 python bench.py --res 1024 --iters 3

echo '=== train bench k=64, fixed MFU + split fwd/bwd block tables ==='
timeout 3600 python benchmarks/train_bench.py --steps-per-call 64 --iters 2

echo '=== done ==='
