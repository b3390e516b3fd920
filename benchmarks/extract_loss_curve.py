"""Extract a training loss curve from a trainer log into JSON.

The convergence chain's eval learning curve (learning_curve.json) shows
edit QUALITY vs step; this companion extracts the optimization-side
evidence — train_loss / grad_norm vs step — from the stage-2 trainer log,
the analogue of the only curve the reference itself ever shows (the
accelerate/wandb loss plot around /root/reference/train_diffute_v1.py:938).

A resumed/segmented chain re-logs overlapping steps (every segment restart
replays its first logging window) and duplicates lines through the double
logger handler; the last occurrence of a step wins.

Usage:
  python benchmarks/extract_loss_curve.py runs/convergence/unet.log \
      --out benchmarks/convergence_results/loss_curve.json [--every 64]
"""

from __future__ import annotations

import argparse
import json
import re

# value pattern accepts nan/inf so a diverged segment shows up in the
# committed curve instead of silently disappearing (json.dump emits NaN /
# Infinity literals, which Python's json reads back)
_NUM = r"(?:[0-9.eE+-]+|-?nan|-?inf)"
LINE = re.compile(rf"\[step (\d+)\] train_loss=({_NUM}) "
                  rf"grad_norm=({_NUM})")


def extract(log_path: str, every: int = 1) -> list[dict]:
    points: dict[int, dict] = {}
    with open(log_path) as f:
        for line in f:
            m = LINE.search(line)
            if m:
                step = int(m.group(1))
                points[step] = {"step": step,
                                "train_loss": float(m.group(2)),
                                "grad_norm": float(m.group(3))}
    steps = sorted(points)
    # keep every Nth logged step plus the final one
    kept = [s for i, s in enumerate(steps) if i % every == 0]
    if steps and steps[-1] not in kept:
        kept.append(steps[-1])
    return [points[s] for s in kept]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("log")
    p.add_argument("--out", required=True)
    p.add_argument("--every", type=int, default=4,
                   help="keep every Nth logged point (logs are already "
                        "strided by the trainer's steps_per_call)")
    args = p.parse_args()
    curve = extract(args.log, args.every)
    with open(args.out, "w") as f:
        json.dump(curve, f, indent=2)
    print(f"{len(curve)} points -> {args.out}"
          + (f" (last: step {curve[-1]['step']}, "
             f"loss {curve[-1]['train_loss']:.5f})" if curve else ""))


if __name__ == "__main__":
    main()
