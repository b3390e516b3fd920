"""Flash-attention block-size sweep at the SD self-attention shapes.

VERDICT r2 next-step 7: tune the 16384-token regime (1024^2 edits) where
round-1 data showed the flash advantage shrinking (2.9x vs 5.4x at 4096).
At long T the forward's HBM traffic is dominated by re-streaming K/V once
per q-block (n_q * T * D bytes); doubling block_q halves it, bounded by the
VMEM footprint of the (block_q, block_kv) f32 score tile.

Usage (on the TPU):
  python benchmarks/attn_bench.py [--seqs 4096,16384] [--heads 5] [--dim 64]

Prints a JSON table: per (seq, block_q, block_kv) seconds/call + TF/s, plus
the XLA fused-softmax baseline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

# runnable as `python benchmarks/attn_bench.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seqs", default="4096,16384")
    p.add_argument("--heads", type=int, default=5)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    jax.config.update("jax_default_prng_impl", "rbg")
    from diffute_tpu.ops.attention import _xla_attention
    from diffute_tpu.ops.flash_attention import flash_attention
    from diffute_tpu.utils.benchmark import time_op

    # time_op, NOT time_fn: a single attention call at these shapes is
    # ~0.3-6 ms while a relay round-trip is ~100+ ms, so end-to-end call
    # timing is pure RTT noise.  time_op chains the kernel on its q operand
    # inside two scan lengths and differences them, cancelling dispatch and
    # transfer entirely (utils/benchmark.py).
    results = []
    for s_len in (int(s) for s in args.seqs.split(",")):
        shape = (args.batch, s_len, args.heads, args.dim)
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, shape, jnp.bfloat16)
        k = jax.random.normal(kk, shape, jnp.bfloat16)
        v = jax.random.normal(kv, shape, jnp.bfloat16)
        scale = args.dim ** -0.5
        flops = 4 * args.batch * args.heads * s_len * s_len * args.dim

        t = time_op(lambda x, k, v: _xla_attention(x, k, v, scale),
                    q, k, v, repeats=args.repeats)
        row = {"seq": s_len, "impl": "xla", "s": round(t, 6),
               "tf_s": round(flops / t / 1e12, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

        for bq in (256, 512, 1024, 2048):
            for bkv in (512, 1024, 2048):
                if bq > s_len or bkv > s_len:
                    continue
                # f32 score tile must fit VMEM next to q/kv/acc tiles
                if bq * bkv * 4 > 8 * 1024 * 1024:
                    continue
                op = (lambda x, k, v, bq=bq, bkv=bkv:
                      flash_attention(x, k, v, scale, bq, bkv))
                try:
                    t = time_op(op, q, k, v, repeats=args.repeats)
                except Exception as e:
                    print(json.dumps({"seq": s_len, "block_q": bq,
                                      "block_kv": bkv,
                                      "error": str(e)[:120]}), flush=True)
                    continue
                row = {"seq": s_len, "impl": "flash", "block_q": bq,
                       "block_kv": bkv, "s": round(t, 6),
                       "tf_s": round(flops / t / 1e12, 1)}
                results.append(row)
                print(json.dumps(row), flush=True)

    best = {}
    for r in results:
        if r["impl"] == "flash":
            cur = best.get(r["seq"])
            if cur is None or r["s"] < cur["s"]:
                best[r["seq"]] = r
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
