#!/bin/bash
# Round-3 queue d: tuned-attn headline, DPM-Solver++ speed + quality on the
# trained convergence checkpoint, serving batch sweep, idle hostops re-run,
# fixed-MFU train bench.  One job on the chip at a time.
set -x
cd /root/repo

echo '=== headline iters=12 with the tuned attention table ==='
timeout 2400 python bench.py --iters 12

echo '=== DPM-Solver++ throughput at 20 and 10 steps ==='
timeout 2400 python bench.py --sampler dpmpp --steps 20 --iters 8
timeout 2400 python bench.py --sampler dpmpp --steps 10 --iters 8

echo '=== DPM-Solver++ QUALITY vs 50-step DDIM on the trained checkpoint ==='
CK=runs/convergence/unet/checkpoint-12032
if [ -d "$CK" ]; then
  for S in 20 10; do
    timeout 1800 python -m diffute_tpu.eval.run --model_scale small \
      --pretrained "$CK" --tokenizer char --synthetic 16 --max_examples 16 \
      --steps $S --sampler dpmpp --seed 0 \
      --out runs/convergence/report_trained_dpmpp$S.json
  done
fi

echo '=== serving batch sweep (edit_batch) ==='
timeout 2400 python bench.py --batch 2 --iters 4
timeout 2400 python bench.py --batch 4 --iters 4
timeout 2400 python bench.py --batch 8 --iters 4

echo '=== hostops micro-bench on an idle host ==='
timeout 600 python benchmarks/hostops_bench.py

echo '=== train bench k=64 with fixed MFU accounting ==='
timeout 3600 python benchmarks/train_bench.py --steps-per-call 64 --iters 2

echo '=== done ==='
