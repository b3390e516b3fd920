"""Full-size int8-weight UNet parity vs bf16 — the BASELINE.md error bound.

VERDICT r2 next-step 4 asks for "measured img/s AND max-abs-error vs bf16";
bench.py --int8 supplies the speed, this supplies the error at the real
866M SD2-inpaint width on the attached backend (analogue of the reference's
memory-lean serving opt-ins, train_diffute_v1.py:244-248).

  python benchmarks/int8_parity.py [--res 64] [--cpu]

Prints one JSON line with max/mean abs error of eps-prediction (the
quantity the sampler consumes) between the bf16 UNet and the int8-weight
UNet on identical inputs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# runnable as `python benchmarks/int8_parity.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=64, help="latent resolution")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "rbg")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from diffute_tpu.config import DiffUTEConfig
    from diffute_tpu.models import UNet2DCondition
    from diffute_tpu.ops.quant import convert_dense_params_to_int8
    from diffute_tpu.utils.params import init_unet_params

    cfg = DiffUTEConfig()
    params = init_unet_params(cfg, jax.random.PRNGKey(0))
    r = args.res
    kx, kc = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (1, r, r, cfg.unet.in_channels), jnp.bfloat16)
    t = jnp.asarray([500], jnp.int32)
    ctx = jax.random.normal(
        kc, (1, cfg.trocr.seq_len, cfg.trocr.hidden_size), jnp.bfloat16)

    unet_f = UNet2DCondition(cfg.unet)
    ref = np.asarray(jax.device_get(
        jax.jit(unet_f.apply)({"params": params}, x, t, ctx)), np.float32)

    qcfg = dataclasses.replace(cfg.unet, use_int8_weights=True)
    unet_q = UNet2DCondition(qcfg)
    target = jax.eval_shape(unet_q.init, jax.random.PRNGKey(0), x, t,
                            ctx)["params"]
    qparams = convert_dense_params_to_int8(params, target)
    del params
    out = np.asarray(jax.device_get(
        jax.jit(unet_q.apply)({"params": qparams}, x, t, ctx)), np.float32)

    err = np.abs(out - ref)
    print(json.dumps({
        "metric": "int8-weight UNet eps error vs bf16 (866M, latent "
                  f"{r}x{r})",
        "max_abs_err": round(float(err.max()), 5),
        "mean_abs_err": round(float(err.mean()), 6),
        "ref_abs_mean": round(float(np.abs(ref).mean()), 5),
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
