#!/bin/bash
# Round-3 queue d — items that do NOT depend on the flash-attention block
# table: the RTT-cancelling attention re-sweep (the queue-c sweep used
# end-to-end call timing, which is relay-RTT noise at these kernel sizes),
# the DPM-Solver++ quality ablation on the trained checkpoint (numerics are
# block-independent), an idle-host hostops re-run (the queue-c run raced the
# pytest suite), and the fixed-MFU train bench.  perf_queue_r3e.sh holds the
# table-dependent speed benches and runs after the table is finalized.
# One job on the chip at a time.
set -x
cd /root/repo

echo '=== attention re-sweep with RTT-cancelling time_op (incl 768^2 regime) ==='
timeout 5400 python benchmarks/attn_bench.py --seqs 4096,9216,16384 --repeats 3

echo '=== DPM-Solver++ QUALITY vs 50-step DDIM on the trained checkpoint ==='
CK=runs/convergence/unet/checkpoint-12032
if [ -d "$CK" ]; then
  for S in 20 10; do
    timeout 1800 python -m diffute_tpu.eval.run --model_scale small \
      --pretrained "$CK" --tokenizer char --synthetic 16 --max_examples 16 \
      --steps $S --sampler dpmpp --seed 0 \
      --out runs/convergence/report_trained_dpmpp$S.json
  done
  timeout 1800 python -m diffute_tpu.eval.run --model_scale small \
    --pretrained "$CK" --tokenizer char --synthetic 16 --max_examples 16 \
    --steps 20 --seed 0 \
    --out runs/convergence/report_trained_ddim20.json
fi

echo '=== hostops micro-bench on an idle host ==='
timeout 600 python benchmarks/hostops_bench.py

echo '=== train bench k=64 with fixed MFU accounting ==='
timeout 3600 python benchmarks/train_bench.py --steps-per-call 64 --iters 2

echo '=== done ==='
