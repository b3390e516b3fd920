"""Command-line edit: one image in, one edited image out.

Example:
  python -m diffute_tpu.serve.cli --image in.png --box 40,50,200,90 \\
      --text "NEW TEXT" --steps 50 --out edited.png \\
      [--checkpoint <diffusers-layout dir>]
"""

from __future__ import annotations

import argparse

import cv2
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--box", required=True, help="x1,y1,x2,y2")
    p.add_argument("--text", required=True)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--sampler", default="ddim", choices=["ddim", "ddpm", "dpmpp"])
    p.add_argument("--guidance_scale", type=float, default=1.0,
                   help="classifier-free guidance (<=1 reproduces reference)")
    p.add_argument("--blend", action="store_true",
                   help="masked-latent blending each step (opt-in)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="edited.png")
    p.add_argument("--mask-out", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--scale", default=None, choices=["full", "small", "tiny"],
                   help="model topology (small = the on-chip convergence "
                        "scale; its checkpoints load via --checkpoint)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random model (smoke testing; alias of "
                        "--scale tiny)")
    args = p.parse_args()

    import jax

    from diffute_tpu.utils.platform import apply_platform_override

    apply_platform_override()  # DIFFUTE_PLATFORM=cpu runs off-chip
    jax.config.update("jax_default_prng_impl", "rbg")
    import dataclasses

    from diffute_tpu.config import (DiffUTEConfig, small_config,
                                    tiny_test_config)
    from diffute_tpu.pipeline import DiffUTEPipeline
    from diffute_tpu.utils import init_pipeline_params

    scale = args.scale or ("tiny" if args.tiny else "full")
    config = {"full": DiffUTEConfig, "small": small_config,
              "tiny": tiny_test_config}[scale]()
    config = dataclasses.replace(
        config, edit=dataclasses.replace(
            config.edit, sampler=args.sampler,
            guidance_scale=args.guidance_scale,
            masked_latent_blend=args.blend))
    if args.checkpoint:
        from diffute_tpu.serve.loading import load_diffusers_layout

        params = load_diffusers_layout(args.checkpoint, config)
    else:
        params = init_pipeline_params(config)
    pipe = DiffUTEPipeline(config, params)

    raw = cv2.imread(args.image)
    if raw is None:
        raise SystemExit(f"could not read image: {args.image}")
    img = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
    box = tuple(int(v) for v in args.box.split(","))
    out, mask = pipe.edit(np.asarray(img), box, args.text,
                          num_inference_steps=args.steps, seed=args.seed)
    cv2.imwrite(args.out, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    if args.mask_out:
        cv2.imwrite(args.mask_out, mask)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
