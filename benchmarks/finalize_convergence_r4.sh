#!/bin/bash
# Round-4 convergence finalization (VERDICT-r3 item 3, second half).
#
# Run AFTER the 36k chain (benchmarks/convergence_small.py) is stopped at
# its last completed curve point: takes the newest stage-2 checkpoint,
# re-runs the sampler (ddim20 / dpmpp20 / dpmpp10) and encoder-reuse
# (k=2,3) QUALITY ablations on it — the round-3 conclusions were admittedly
# ceiling-limited by the weak 12k checkpoint (BASELINE.md) — then refreshes
# the random-unet baseline and rebuilds summary.json, and finally copies
# every artifact into benchmarks/convergence_results/ for commit.
#
# One job on the chip at a time (CLAUDE.md): only run once the chain's
# run_unet/eval processes have exited.
set -x
cd /root/repo

OUT=runs/convergence
CK=$(ls -d $OUT/unet/checkpoint-* | sort -t- -k2 -n | tail -1)
echo "strongest checkpoint: $CK"

# the eval needs the verifier decoder inside the checkpoint dir (the chain's
# attach_decoder does the same copy)
OCR_CK=$(ls -d $OUT/ocr/checkpoint-* | sort -t- -k2 -n | tail -1)
[ -d "$CK/trocr_decoder" ] || cp -r "$OCR_CK/trocr_decoder" "$CK/trocr_decoder"

EVAL="python -m diffute_tpu.eval.run --model_scale small --pretrained $CK \
      --tokenizer char --synthetic 16 --max_examples 16 --seed 0"

# 1. the 50-step trained report IS the last curve point — copy, no chip time
LAST_STEP=$(basename "$CK" | cut -d- -f2)
if [ -f "$OUT/report_step$LAST_STEP.json" ]; then
  cp "$OUT/report_step$LAST_STEP.json" "$OUT/report_trained.json"
else
  timeout 1800 $EVAL --steps 50 --out $OUT/report_trained.json
fi

# 2. sampler ablations (few-step quality vs the 50-step DDIM row)
for S in 20 10; do
  timeout 1800 $EVAL --steps $S --sampler dpmpp \
    --out $OUT/report_trained_dpmpp$S.json
done
timeout 1800 $EVAL --steps 20 --out $OUT/report_trained_ddim20.json

# 3. encoder-reuse quality ablations (the +23% k=2 speed lever)
for R in 2 3; do
  timeout 1800 $EVAL --steps 50 --reuse $R \
    --out $OUT/report_trained_reuse$R.json
done

# 4. random-unet baseline on the SAME verifier (vae/trocr identical to the
# round-3 dirs the chain reused, so this refresh should match round 3's)
timeout 1800 $EVAL --steps 50 --randomize unet --out $OUT/report_random.json

# 5. summary + artifact copy for commit
python - <<'EOF'
import json, shutil, glob, os
out = "runs/convergence"
dst = "benchmarks/convergence_results"
trained = json.load(open(f"{out}/report_trained.json"))
random_ = json.load(open(f"{out}/report_random.json"))
keys = ("ocr_text_match_rate", "ocr_id_match_mean",
        "ssim_background_mean", "region_mean_abs_delta_mean")
summary = {k: {"trained": trained.get(k), "random_unet": random_.get(k)}
           for k in keys}
json.dump(summary, open(f"{out}/summary.json", "w"), indent=2)
print(json.dumps(summary, indent=2))
for f in (glob.glob(f"{out}/report_*.json")
          + [f"{out}/summary.json", f"{out}/learning_curve.json"]):
    shutil.copy(f, os.path.join(dst, os.path.basename(f)))
EOF

echo '=== done ==='
