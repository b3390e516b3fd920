#!/bin/bash
# Round-4 perf queue. Run with the training chain PAUSED (one job on chip).
# Results land in /tmp/bench_r4_*.json; run_all updates benchmarks/results.json
# (now stamped with measured_at/backend per record).
set -x
cd /root/repo

# 1. canonical headline (sequential, per-iteration list).  bench.py now
# DEFAULTS to --pipelined 2, so every sequential record passes --pipelined 0
# explicitly — the artifact's metric tag is the ground truth either way.
python bench.py --iters 12 --pipelined 0 > /tmp/bench_r4_headline.json 2> /tmp/bench_r4_headline.err

# 2-3. pipelined serving (VERDICT r3 item 4): expect ~1/loop_s
python bench.py --iters 12 --pipelined 2 --no-profile > /tmp/bench_r4_pipe2.json 2> /tmp/bench_r4_pipe2.err
python bench.py --iters 12 --pipelined 4 --no-profile > /tmp/bench_r4_pipe4.json 2> /tmp/bench_r4_pipe4.err

# 4. few-step sampling x pipelining (fixed cost dominates there)
python bench.py --steps 20 --sampler dpmpp --iters 10 --pipelined 2 --no-profile > /tmp/bench_r4_dpmpp20_pipe.json 2> /tmp/bench_r4_dpmpp20_pipe.err
python bench.py --steps 20 --sampler dpmpp --iters 10 --pipelined 0 > /tmp/bench_r4_dpmpp20.json 2> /tmp/bench_r4_dpmpp20.err

# 5. high-res canonical records (768 sequential per-iteration list; the
# 1024 records are pipelined depth 2, matching the BASELINE.md table rows)
python bench.py --res 768 --iters 8 --pipelined 0 > /tmp/bench_r4_768.json 2> /tmp/bench_r4_768.err
python bench.py --res 1024 --iters 6 --pipelined 2 > /tmp/bench_r4_1024.json 2> /tmp/bench_r4_1024.err
# attention share at 16384 tokens (1024^2 MFU attribution, VERDICT item 8)
python bench.py --res 1024 --iters 4 --no-flash --pipelined 2 > /tmp/bench_r4_1024_noflash.json 2> /tmp/bench_r4_1024_noflash.err

# 6. the five BASELINE configs -> benchmarks/results.json (config 4 now runs
# the batched-CFG formulation)
python benchmarks/run_all.py > /tmp/run_all_r4.log 2>&1

echo QUEUE_DONE
