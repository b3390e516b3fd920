"""RTT-cancelled device timing for VAE encode/decode (roadmap perf item 1).

The edit pipeline's fixed cost (prep ~114 ms + decode ~85 ms at 512 squared)
bounds few-step serving (BASELINE.md round-3 table); those stage numbers
include relay round-trips, so this bench measures the true device time of
the VAE halves with ``utils.benchmark.time_op`` (scan-chained differencing).

The scan body threads a tiny data dependency from each output back into the
next input so XLA can neither hoist the invariant computation out of the
loop nor dead-code it.

Usage: python benchmarks/vae_bench.py [--res 512] [--dtype bf16]
(reference hot path: train_vae.py:721-722, app.ipynb:781-783,818-819)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diffute_tpu.config import VAEConfig
from diffute_tpu.models.vae import AutoencoderKL
from diffute_tpu.utils.benchmark import time_op


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--short", type=int, default=4)
    p.add_argument("--long", type=int, default=12)
    p.add_argument("--flash", action="store_true",
                   help="route the mid-block attention through the Pallas "
                        "flash kernel")
    args = p.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = VAEConfig(dtype=dtype, use_flash_attention=args.flash)
    vae = AutoencoderKL(cfg)
    res, lat = args.res, args.res // cfg.scale_factor

    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, res, res, 3), dtype)
    z = jnp.zeros((1, lat, lat, 4), dtype)
    params = jax.jit(vae.init)(rng, img, rng)["params"]
    # one jitted program for the whole-tree cast: an un-jitted tree_map
    # casts ~250 leaves EAGERLY, and every eager op is a network round-trip
    # on the relay backend (ADVICE r3)
    params = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, p))(params)

    def dec_step(zc, p):
        out = vae.apply({"params": p}, zc, method=vae.decode)
        # feed a scalar of the output back into the next input: keeps the
        # decode live and loop-variant without changing its cost profile
        return zc + (jnp.mean(out) * 1e-12).astype(zc.dtype)

    def enc_step(xc, p):
        mean, logvar = vae.apply({"params": p}, xc, method=vae.encode)
        s = (jnp.mean(mean) + jnp.mean(logvar)) * 1e-12
        return xc + s.astype(xc.dtype)

    t_dec = time_op(dec_step, z, params, short=args.short, long=args.long)
    t_enc = time_op(enc_step, img, params, short=args.short, long=args.long)

    def flops(fn, *xs):
        c = jax.jit(fn).lower(*xs).compile().cost_analysis()
        c = c[0] if isinstance(c, (list, tuple)) else c
        return float(c.get("flops", 0.0)) if c else 0.0

    f_dec = flops(lambda zz: vae.apply({"params": params}, zz,
                                       method=vae.decode), z)
    f_enc = flops(lambda xx: vae.apply({"params": params}, xx,
                                       method=vae.encode), img)

    print(json.dumps({
        "res": res, "dtype": args.dtype, "flash": args.flash,
        "decode_ms": round(t_dec * 1e3, 2),
        "encode_ms": round(t_enc * 1e3, 2),
        "decode_tflops_s": round(f_dec / t_dec / 1e12, 1) if t_dec > 0 else None,
        "encode_tflops_s": round(f_enc / t_enc / 1e12, 1) if t_enc > 0 else None,
        "decode_gflops": round(f_dec / 1e9, 1),
        "encode_gflops": round(f_enc / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
