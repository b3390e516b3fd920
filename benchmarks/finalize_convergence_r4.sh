#!/bin/bash
# Round-4 convergence finalization (VERDICT-r3 item 3, second half).
#
# Run AFTER the 36k chain (benchmarks/convergence_small.py) is stopped at
# its last completed curve point: takes the newest FINALIZED stage-2
# checkpoint, re-runs the sampler (ddim20 / dpmpp20 / dpmpp10) and
# encoder-reuse (k=2,3) QUALITY ablations on it — the round-3 conclusions
# were admittedly ceiling-limited by the weak 12k checkpoint (BASELINE.md) —
# then refreshes the random-unet baseline, rebuilds summary.json, and copies
# every artifact into benchmarks/convergence_results/ for commit.
#
# One job on the chip at a time (CLAUDE.md): only run once the chain's
# run_unet/eval processes have exited.
set -ex
cd /root/repo
START_EPOCH=$(date +%s)

OUT=runs/convergence
# finalized-only selection: a kill mid-async-save leaves a garbage
# checkpoint-N/ behind that a plain `ls | tail -1` would pick
CK=$(python - <<'EOF'
import jax; jax.config.update("jax_platforms", "cpu")
from diffute_tpu.train.checkpoint import latest_checkpoint
print(latest_checkpoint("runs/convergence/unet") or "")
EOF
)
OCR_CK=$(python - <<'EOF'
import jax; jax.config.update("jax_platforms", "cpu")
from diffute_tpu.train.checkpoint import latest_checkpoint
print(latest_checkpoint("runs/convergence/ocr") or "")
EOF
)
[ -n "$CK" ] && [ -n "$OCR_CK" ]
echo "strongest checkpoint: $CK"

# the eval needs the verifier decoder inside the checkpoint dir (the chain's
# attach_decoder does the same copy)
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

# 2. random-unet baseline on the SAME verifier, before the optional
# ablations so a timeout there cannot leave the summary without it
# (vae/trocr are the round-3 dirs the chain reused, so this should match
# round 3's baseline)
timeout 1800 $EVAL --steps 50 --randomize unet --out $OUT/report_random.json

# 3. sampler ablations (few-step quality vs the 50-step DDIM row); one
# failed ablation should not kill the rest — each report is independent,
# and the summary step below verifies freshness before copying
for S in 20 10; do
  timeout 1800 $EVAL --steps $S --sampler dpmpp \
    --out $OUT/report_trained_dpmpp$S.json || echo "WARN: dpmpp$S failed"
done
timeout 1800 $EVAL --steps 20 --out $OUT/report_trained_ddim20.json \
  || echo "WARN: ddim20 failed"

# 4. encoder-reuse quality ablations (the +23% k=2 speed lever)
for R in 2 3; do
  timeout 1800 $EVAL --steps 50 --reuse $R \
    --out $OUT/report_trained_reuse$R.json || echo "WARN: reuse$R failed"
done

# 5. optimization-side curve from the stage-2 trainer log (companion to the
# eval learning curve; the only curve the reference itself shows)
python benchmarks/extract_loss_curve.py $OUT/unet.log \
  --out benchmarks/convergence_results/loss_curve.json

# 6. summary + artifact copy: only files written AFTER this script started
# are copied (a failed eval must not smuggle a stale round-3 report into
# the committed results); curve artifacts predate the script and are
# copied unconditionally
python - "$START_EPOCH" <<'EOF'
import json, shutil, glob, os, sys
start = float(sys.argv[1])
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
copied, skipped = [], []
for f in sorted(glob.glob(f"{out}/report_*.json")
                + [f"{out}/summary.json", f"{out}/learning_curve.json"]):
    if os.path.exists(f) and (os.path.getmtime(f) >= start
                              or "report_step" in f
                              or f.endswith("learning_curve.json")):
        shutil.copy(f, os.path.join(dst, os.path.basename(f)))
        copied.append(os.path.basename(f))
    else:
        skipped.append(os.path.basename(f))
print("copied:", copied)
print("skipped (stale or absent):", skipped)
EOF

echo '=== done ==='
