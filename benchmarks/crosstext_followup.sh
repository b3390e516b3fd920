#!/bin/bash
# Follow-up evals after the crosstext_ft chain (benchmarks/crosstext_ft.sh):
#   1. cross-text learning-curve points at the preserved 38k/40k checkpoints
#   2. out-of-vocabulary (--cross_text_novel) probe on the fine-tuned model
#      and on the 36k fixed-vocab baseline (the comparison the probe exists
#      for)
#   3. fast-serving-point (dpmpp-20 + encoder-reuse k=2) cross-text on the
#      fine-tuned model, refreshing the committed 0.50 row
# One chip job at a time: if $1 is a PID, wait for it to exit first.
set -u
cd "$(dirname "$0")/.."
OUT=runs/crosstext_ft
RES=benchmarks/convergence_results
BASE=runs/convergence/unet/checkpoint-36000

if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

FINAL=$(ls -d "$OUT"/checkpoint-* | sort -t- -k2 -n | tail -1)
EVAL="python -m diffute_tpu.eval.run --model_scale small --tokenizer char \
  --synthetic 16 --max_examples 16 --seed 0"

for CK in "$OUT"/keep/checkpoint-38000 "$OUT"/keep/checkpoint-40000; do
  STEP=$(basename "$CK" | cut -d- -f2)
  cp -r "$BASE/trocr_decoder" "$CK/trocr_decoder" 2>/dev/null || true
  $EVAL --pretrained "$CK" --steps 50 --cross_text \
    --out "$RES/report_crosstext_ft_step${STEP}.json" \
    >> "$OUT/eval.log" 2>&1 && echo "curve point $STEP done"
done

$EVAL --pretrained "$FINAL" --steps 50 --cross_text_novel \
  --out "$RES/report_crosstext_ft_novel.json" \
  >> "$OUT/eval.log" 2>&1 && echo "novel @ ft done"
$EVAL --pretrained "$BASE" --steps 50 --cross_text_novel \
  --out "$RES/report_crosstext_novel_baseline36k.json" \
  >> "$OUT/eval.log" 2>&1 && echo "novel @ 36k baseline done"

$EVAL --pretrained "$FINAL" --steps 20 --sampler dpmpp --reuse 2 --cross_text \
  --out "$RES/report_crosstext_ft_dpmpp20_reuse2.json" \
  >> "$OUT/eval.log" 2>&1 && echo "fast-path cross-text @ ft done"

echo "followup done: $FINAL"
