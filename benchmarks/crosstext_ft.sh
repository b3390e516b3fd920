#!/bin/bash
# Vocabulary-diverse fine-tune for cross-text editing (round 5).
#
# The 36k fixed-vocab convergence model regenerates its 10 training words
# perfectly (eval exact-match 1.0) but writes NOVEL strings at 0.625
# (eval --cross_text, BASELINE.md) — it memorized words instead of learning
# glyph-conditioned generation.  This chain fine-tunes it on the "mixed"
# synthetic vocabulary (50% fixed words / 50% random 3-10 char strings,
# io/dataset.py) and re-runs the cross-text eval per segment.
#
# Segments + retry + resume: the relay can return RESOURCE_EXHAUSTED at any
# step and the axon client leaks host RAM per h2d transfer, so each 2k-step
# segment runs in a fresh process and resumes from the latest checkpoint
# (same pattern as convergence_small.py --unet_segment_steps).
set -u
cd "$(dirname "$0")/.."
OUT=runs/crosstext_ft
BASE=runs/convergence/unet/checkpoint-36000
PRE=runs/convergence/pretrained_for_unet
mkdir -p "$OUT"

for TARGET in 38000 40000 42000; do
  for ATTEMPT in 1 2 3; do
    if ls "$OUT"/checkpoint-* >/dev/null 2>&1; then
      RESUME=(--resume_from_checkpoint latest)
    else
      RESUME=(--resume_from_checkpoint "$BASE")
    fi
    python -m diffute_tpu.train.run_unet --model_scale small \
      --gradient_checkpointing --pretrained "$PRE" \
      --synthetic_vocab mixed \
      --max_train_steps "$TARGET" --train_batch_size 16 \
      --learning_rate 1e-4 --checkpointing_steps 1000 \
      --checkpoints_total_limit 2 --report_to none --seed 1 \
      --steps_per_call 16 --output_dir "$OUT" "${RESUME[@]}" \
      >> "$OUT/train.log" 2>&1 && break
    echo "segment $TARGET attempt $ATTEMPT failed; retrying" >> "$OUT/train.log"
    sleep 30
  done
done

# per-checkpoint cross-text eval (the metric this chain exists to move)
CK=$(ls -d "$OUT"/checkpoint-* | sort -t- -k2 -n | tail -1)
cp -r "$BASE/trocr_decoder" "$CK/trocr_decoder" 2>/dev/null || true
python -m diffute_tpu.eval.run --model_scale small --pretrained "$CK" \
  --tokenizer char --synthetic 16 --max_examples 16 --steps 50 --seed 0 \
  --cross_text \
  --out benchmarks/convergence_results/report_crosstext_ft.json \
  >> "$OUT/eval.log" 2>&1
# regeneration eval too: the fine-tune must not break the original skill
python -m diffute_tpu.eval.run --model_scale small --pretrained "$CK" \
  --tokenizer char --synthetic 16 --max_examples 16 --steps 50 --seed 0 \
  --out benchmarks/convergence_results/report_crosstext_ft_regen.json \
  >> "$OUT/eval.log" 2>&1
echo "done: $CK"
