#!/bin/bash
# Round-3 on-chip perf queue (VERDICT r2 next-steps 2,3,4,5,7).
# Run AFTER the convergence chain frees the TPU:
#   bash benchmarks/perf_queue_r3.sh > /tmp/perf_r3.log 2>&1 &
# One job at a time — relay contention distorts every measurement
# (memory/axon-tpu-quirks.md).
set -x
cd /root/repo

echo '=== encoder-reuse QUALITY ablation on the trained checkpoint (VERDICT weak 4) ==='
CK=runs/convergence/unet/checkpoint-12032
if [ -d "$CK" ]; then
  for R in 2 3; do
    timeout 1800 python -m diffute_tpu.eval.run --model_scale small \
      --pretrained "$CK" --tokenizer char --synthetic 16 --max_examples 16 \
      --steps 50 --seed 0 --reuse $R \
      --out runs/convergence/report_trained_reuse$R.json
  done
fi

echo '=== headline, iters=12 (VERDICT weak 1: recover >=1.43 or attribute) ==='
timeout 2400 python bench.py --iters 12

echo '=== fused conv+GN+SiLU ablation (next-step 2) ==='
timeout 2400 python bench.py --iters 6 --fused-conv

echo '=== int8 weight-only serving ablation (next-step 4) ==='
timeout 2400 python bench.py --iters 6 --int8

echo '=== fused-conv + int8 combined ==='
timeout 2400 python bench.py --iters 6 --fused-conv --int8

echo '=== int8 full-size parity error (next-step 4) ==='
timeout 1800 python benchmarks/int8_parity.py

echo '=== flash-attention block sweep 4096/16384 (next-step 7) ==='
timeout 3600 python benchmarks/attn_bench.py --repeats 3

echo '=== 1024^2 edit (results.json 5b target >0.2 img/s) ==='
timeout 2400 python bench.py --res 1024 --iters 3

echo '=== training k-curve beyond 32 (next-step 5) ==='
timeout 3600 python benchmarks/train_bench.py --steps-per-call 64 --iters 2
timeout 3600 python benchmarks/train_bench.py --steps-per-call 128 --iters 1

echo '=== full BASELINE config matrix -> benchmarks/results.json ==='
timeout 10800 python benchmarks/run_all.py

echo '=== done ==='
