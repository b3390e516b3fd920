"""Training-throughput benchmark: full-size stage-2 step on one chip.

Trains the real 866M-param SD2-inpaint UNet (frozen VAE + TrOCR in the same
jit step) with bf16 compute, remat, flash attention, and bf16 Adam moments —
the configuration that fits one 16GB v5e chip.

Run: python benchmarks/train_bench.py [--batch 4] [--res 512] [--no-remat]
Prints one JSON line: {"metric": ..., "value": imgs/sec/chip, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffute_tpu.config import (  # noqa: E402
    DiffUTEConfig, OptimizerConfig, TrainConfig, TrOCRConfig, UNetConfig,
    VAEConfig,
)
from diffute_tpu.train import UNetTrainer  # noqa: E402
from diffute_tpu.utils import init_pipeline_params  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="K optimizer steps per lax.scan executable "
                        "(TrainConfig.steps_per_call)")
    p.add_argument("--optimizer", default="adafactor",
                   choices=["adamw", "adafactor", "adamw8bit"],
                   help="adafactor fits the 866M UNet on one 16GB chip; "
                        "adamw (reference parity) needs more HBM; adamw8bit "
                        "= int8 moments (bnb analogue)")
    args = p.parse_args()

    cfg = DiffUTEConfig(
        vae=VAEConfig(dtype=jnp.bfloat16),
        unet=UNetConfig(dtype=jnp.bfloat16, use_flash_attention=True,
                        remat=not args.no_remat),
        trocr=TrOCRConfig(dtype=jnp.bfloat16),
        train=TrainConfig(train_batch_size=args.batch, mixed_precision="bf16",
                          steps_per_call=args.steps_per_call,
                          optimizer=OptimizerConfig(name=args.optimizer,
                                                    low_memory_adam=True)),
    )
    params = init_pipeline_params(cfg)
    jax.block_until_ready(params)
    trainer = UNetTrainer(cfg, params["unet"],
                          {"vae": params["vae"], "trocr": params["trocr"]},
                          total_steps=100)
    del params  # free the original f32 trees (~5 GB); trainer holds copies
    rng = np.random.RandomState(0)
    B, res, g = args.batch, args.res, cfg.trocr.image_size
    # compact uint8 layout — what the product datasets ship since the
    # on-device-normalize change (io/dataset.py)
    batch = {
        "pixel_values": rng.randint(0, 256, (B, res, res, 3), dtype=np.uint8),
        "masks": (rng.rand(B, res, res) > 0.9).astype(np.uint8),
        "masked_images": rng.randint(0, 256, (B, res, res, 3), dtype=np.uint8),
        "glyph_pixels": rng.randint(0, 255, (B, g, g, 3), dtype=np.uint8),
    }
    # pre-place the batch like parallel.DevicePrefetcher delivers it in the
    # real loop, so the number reflects the training step, not per-call
    # host->device upload (which the prefetcher overlaps with compute)
    from diffute_tpu.parallel import shard_batch

    k = args.steps_per_call
    keys = [jax.random.PRNGKey(i) for i in range(args.iters + 1)]
    if k > 1:
        batches = shard_batch(
            trainer.mesh,
            {kk: np.broadcast_to(v, (k,) + v.shape).copy()
             for kk, v in batch.items()}, batch_axis=1)
        m = trainer.run_steps(batches, keys[0])
        float(jax.device_get(m["loss"][-1]))  # compile + first call
        t0 = time.time()
        for i in range(args.iters):
            m = trainer.run_steps(batches, keys[i + 1])
        float(jax.device_get(m["loss"][-1]))
        dt = (time.time() - t0) / (args.iters * k)
    else:
        batch = shard_batch(trainer.mesh, batch)
        m = trainer.step(batch, keys[0])
        float(jax.device_get(m["loss"]))  # force first (compile) step
        t0 = time.time()
        for i in range(args.iters):
            m = trainer.step(batch, keys[i + 1])
        float(jax.device_get(m["loss"]))
        dt = (time.time() - t0) / args.iters
    out = {
        "metric": f"train images/sec/chip (stage-2, {res}^2, bf16, "
                  f"{args.optimizer}, remat={not args.no_remat}, batch {B}"
                  + (f", scan k={k}" if k > 1 else "") + ")",
        "value": round(B / dt, 3),
        "unit": "images/sec/chip",
        "step_seconds": round(dt, 4),
        "loss": round(float(np.mean(jax.device_get(m["loss"]))), 4),
    }
    # training-step MFU from XLA HLO cost analysis of the compiled step
    # (counts EXECUTED flops, i.e. includes remat recompute — an honest
    # hardware-utilization number, slightly above model-flops MFU).
    # HLO cost analysis visits a lax.scan body ONCE regardless of trip
    # count (verified empirically), so for the k-step scan executable the
    # reported flops ARE (one step + small prologue), no division needed.
    try:
        if k > 1:
            low = trainer._multi.lower(trainer.state, trainer.frozen,
                                       batches, keys[0])
        else:
            low = trainer._step.lower(trainer.state, trainer.frozen,
                                      batch, keys[0])
        ca = low.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if not ca or "flops" not in ca:
            # the axon client's Lowered.cost_analysis() returns None; the
            # compiled executable's analysis works (and hits the compile
            # cache — the timing loop above already built this executable)
            ca = low.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
        step_flops = float(ca["flops"])
        out["hlo_tflops_per_step"] = round(step_flops / 1e12, 2)
        out["mfu"] = round(step_flops / dt / 197e12, 4)
    except Exception as e:
        out["mfu_error"] = str(e)[:120]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
