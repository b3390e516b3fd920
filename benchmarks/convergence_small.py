"""On-chip convergence proof: train the full system at small scale, then
show the train -> edit -> OCR-verify loop works end to end.

Chains the three training stages on synthetic data (the strongest available
substitute for the reference's pretrained weights in a zero-egress image):

  1. OCR verifier  (train/run_ocr.py)   — char-level TrOCR on glyph renders
     (the pretrained-TrOCR analogue, reference train_diffute_v1.py:630-631)
  2. Stage-1 VAE   (train/run_vae.py)   — reconstruction on synthetic scenes
     (reference train_vae.py)
  3. Stage-2 UNet  (train/run_unet.py)  — glyph-conditioned inpainting with
     the frozen trained encoder + VAE (reference train_diffute_v1.py)

then evaluates with diffute_tpu.eval.run twice over the SAME verifier
(the trained OCR encoder+decoder, char tokenizer):

  - trained UNet        -> report_trained.json
  - --randomize unet    -> report_random.json  (ablation baseline)

Done-criterion: trained ocr_text_match_rate / ocr_id_match_mean clearly
separated from the random-init baseline, background SSIM high in both.

Usage:
  python benchmarks/convergence_small.py --out runs/convergence \\
      [--ocr_steps 3000] [--vae_steps 4000] [--unet_steps 12000] \\
      [--skip ocr,vae,...] [--eval_steps 50] [--eval_examples 16]

Stages already completed in --out are reusable via --skip (each stage
writes checkpoints under its own subdirectory).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

# runnable as `python benchmarks/convergence_small.py` from the repo root:
# sys.path[0] is benchmarks/, so add the repo root for diffute_tpu imports
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sh(args_list, log_path):
    print("+", " ".join(args_list), f"(log: {log_path})", flush=True)
    with open(log_path, "a") as log:
        r = subprocess.run(args_list, stdout=log, stderr=subprocess.STDOUT)
    if r.returncode != 0:
        sys.exit(f"stage failed ({r.returncode}): see {log_path}")


def latest_checkpoint(d):
    from diffute_tpu.train.checkpoint import latest_checkpoint as latest

    ck = latest(d)
    if not ck:
        sys.exit(f"no checkpoint under {d}")
    return ck


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/convergence")
    p.add_argument("--ocr_steps", type=int, default=3000)
    p.add_argument("--vae_steps", type=int, default=4000)
    p.add_argument("--unet_steps", type=int, default=12000)
    p.add_argument("--vae_batch", type=int, default=8)
    p.add_argument("--unet_batch", type=int, default=16)
    p.add_argument("--unet_lr", type=float, default=1e-4)
    p.add_argument("--eval_steps", type=int, default=50)
    p.add_argument("--eval_examples", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--unet_segment_steps", type=int, default=3000,
                   help="relaunch the stage-2 trainer in a fresh process "
                        "every N steps: the axon relay client leaks a host "
                        "staging copy of every h2d transfer (~batch bytes "
                        "per step), so a long single-process run grows to "
                        "host-OOM — observed 129 GB RSS at step ~3650 with "
                        "f32 batches; segments bound it")
    p.add_argument("--unet_checkpointing_steps", type=int, default=1000,
                   help="stage-2 save stride; the tunneled chip is shared "
                        "and a tenant's job can OOM ours at any time, so "
                        "save often — the chain resumes from the newest "
                        "finalized checkpoint on relaunch")
    p.add_argument("--steps_per_call", type=int, default=8,
                   help="lax.scan stride forwarded to every trainer; >1 "
                        "amortizes the relay's per-call boundary cost "
                        "(BASELINE.md training table)")
    p.add_argument("--curve_every", type=int, default=0,
                   help="when >0, run the eval after every stage-2 segment "
                        "that crosses a multiple of N steps and append the "
                        "point to learning_curve.json — the committed "
                        "evidence that more steps -> better edits (the "
                        "reference only ever shows a loss curve, "
                        "train_diffute_v1.py:938)")
    p.add_argument("--skip", default="",
                   help="comma list of stages to skip (ocr,vae,unet,eval)")
    args = p.parse_args()
    skip = set(s for s in args.skip.split(",") if s)

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    ocr_dir = os.path.join(out, "ocr")
    vae_dir = os.path.join(out, "vae")
    unet_dir = os.path.join(out, "unet")
    py = [sys.executable, "-m"]
    spc = ["--steps_per_call", str(args.steps_per_call)]

    def resume(d):
        # a killed/restarted chain continues each stage from its newest
        # finalized checkpoint instead of redoing it
        from diffute_tpu.train.checkpoint import latest_checkpoint as latest
        return ["--resume_from_checkpoint", "latest"] if latest(d) else []

    if "ocr" not in skip:
        sh(py + ["diffute_tpu.train.run_ocr", "--model_scale", "small",
                 "--max_train_steps", str(args.ocr_steps),
                 "--train_batch_size", "64", "--checkpointing_steps", "1000",
                 "--checkpoints_total_limit", "2", "--report_to", "none",
                 "--seed", str(args.seed), "--output_dir", ocr_dir] + spc + resume(ocr_dir),
           os.path.join(out, "ocr.log"))

    if "vae" not in skip:
        sh(py + ["diffute_tpu.train.run_vae", "--model_scale", "small",
                 "--max_train_steps", str(args.vae_steps),
                 "--train_batch_size", str(args.vae_batch),
                 "--checkpointing_steps", "1000",
                 "--checkpoints_total_limit", "2", "--report_to", "none",
                 "--seed", str(args.seed), "--output_dir", vae_dir] + spc + resume(vae_dir),
           os.path.join(out, "vae.log"))

    def attach_decoder(ck):
        # eval needs the verifier decoder inside the checkpoint dir
        dec_src = os.path.join(latest_checkpoint(ocr_dir), "trocr_decoder")
        dec_dst = os.path.join(ck, "trocr_decoder")
        if not os.path.isdir(dec_dst):
            shutil.copytree(dec_src, dec_dst)

    def eval_ckpt(ck, out_path, extra=(), log="eval.log"):
        attach_decoder(ck)
        sh(py + ["diffute_tpu.eval.run", "--model_scale", "small",
                 "--pretrained", ck, "--tokenizer", "char",
                 "--synthetic", str(args.eval_examples),
                 "--max_examples", str(args.eval_examples),
                 "--steps", str(args.eval_steps), "--seed", str(args.seed),
                 "--out", out_path] + list(extra),
           os.path.join(out, log))

    def curve_point(_target):
        """Eval the newest checkpoint and append (step -> metrics) to
        learning_curve.json; skips work a killed+resumed chain already did.

        The point is recorded at the checkpoint's ACTUAL step, parsed from
        its directory name — not the segment target: a killed+resumed chain
        can reach this with the newest checkpoint past the target (the true
        target checkpoint already rotated away), and labeling that with the
        target step would plot a wrong learning-curve point."""
        ck = latest_checkpoint(unet_dir)
        step = int(os.path.basename(ck.rstrip("/")).rsplit("-", 1)[1])
        report_path = os.path.join(out, f"report_step{step}.json")
        if not os.path.exists(report_path):
            eval_ckpt(ck, report_path, log="curve_eval.log")
        with open(report_path) as f:
            r = json.load(f)
        curve_path = os.path.join(out, "learning_curve.json")
        curve = []
        if os.path.exists(curve_path):
            with open(curve_path) as f:
                curve = json.load(f)
        curve = [p for p in curve if p["step"] != step]
        curve.append({"step": step,
                      "ocr_text_match_rate": r.get("ocr_text_match_rate"),
                      "ocr_id_match_mean": r["ocr_id_match_mean"],
                      "region_mean_abs_delta_mean":
                          r["region_mean_abs_delta_mean"],
                      "ssim_background_mean": r["ssim_background_mean"]})
        curve.sort(key=lambda p: p["step"])
        with open(curve_path, "w") as f:
            json.dump(curve, f, indent=2)
        print(f"curve @ {step}: id_match {r['ocr_id_match_mean']:.3f} "
              f"exact {r.get('ocr_text_match_rate')}", flush=True)

    # assemble the stage-2 "pretrained" dir: trained VAE + trained OCR
    # encoder (the frozen conditioning roles; reference loads its stage-1
    # output + hub TrOCR the same way, train_diffute_v1.py:630-632)
    pre = os.path.join(out, "pretrained_for_unet")
    if "unet" not in skip:
        shutil.rmtree(pre, ignore_errors=True)
        os.makedirs(pre)
        shutil.copytree(os.path.join(latest_checkpoint(vae_dir), "vae"),
                        os.path.join(pre, "vae"))
        shutil.copytree(os.path.join(latest_checkpoint(ocr_dir), "trocr"),
                        os.path.join(pre, "trocr"))
        # --gradient_checkpointing is required headroom, not an option: the
        # compiled 64-step scan WITHOUT remat peaks at ~15.4 GB (measured
        # memory_analysis: 2.95 args + 0.86 out + 11.55 temp) and the
        # prefetcher's next 2.36 GB batch overlaps execution, so the v5e's
        # 16 GB OOMs whenever the transfer lands mid-step (observed: a run
        # died at step 2048 after 32 lucky calls).  With remat: 6.18 GB temp,
        # ~12 GB peak including prefetch.
        seg = max(1, args.unet_segment_steps)
        targets = set(range(seg, args.unet_steps, seg)) | {args.unet_steps}
        if args.curve_every:
            targets |= set(range(args.curve_every, args.unet_steps,
                                 args.curve_every))
        targets = sorted(targets)
        for target in targets:
            # a segment whose work is already checkpointed exits immediately
            sh(py + ["diffute_tpu.train.run_unet", "--model_scale", "small",
                     "--gradient_checkpointing",
                     "--pretrained", pre,
                     "--max_train_steps", str(target),
                     "--train_batch_size", str(args.unet_batch),
                     "--learning_rate", str(args.unet_lr),
                     "--checkpointing_steps", str(args.unet_checkpointing_steps),
                     "--checkpoints_total_limit", "2", "--report_to", "none",
                     "--seed", str(args.seed), "--output_dir", unet_dir]
               + spc + resume(unet_dir),
               os.path.join(out, "unet.log"))
            if args.curve_every and (target % args.curve_every == 0
                                     or target == args.unet_steps):
                curve_point(target)

    if "eval" not in skip:
        # the final stage-2 checkpoint is a self-contained pipeline dir
        # (unet/ unet_ema/ vae/ trocr/); eval_ckpt adds the verifier decoder
        ck = latest_checkpoint(unet_dir)
        trained_path = os.path.join(out, "report_trained.json")
        step = int(os.path.basename(ck.rstrip("/")).rsplit("-", 1)[1])
        final_curve = os.path.join(out, f"report_step{step}.json")
        if args.curve_every and os.path.exists(final_curve):
            # the last curve point ran the exact same eval (same checkpoint,
            # steps, seed, examples) — copy it instead of paying another
            # ~10 min eval on the contended relay chip
            shutil.copy(final_curve, trained_path)
        else:
            eval_ckpt(ck, trained_path)
        eval_ckpt(ck, os.path.join(out, "report_random.json"),
                  extra=["--randomize", "unet"])

    # summary
    if "eval" in skip:
        return
    with open(os.path.join(out, "report_trained.json")) as f:
        trained = json.load(f)
    with open(os.path.join(out, "report_random.json")) as f:
        random_ = json.load(f)
    keys = ("ocr_text_match_rate", "ocr_id_match_mean",
            "ssim_background_mean", "region_mean_abs_delta_mean")
    summary = {k: {"trained": trained.get(k), "random_unet": random_.get(k)}
               for k in keys}
    print(json.dumps(summary, indent=2))
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
