"""Weight-day acceptance: one command that certifies imported weights.

The reference *is* its trained weights (train_diffute_v1.py:628-635 loads
SD2-inpaint UNet + fine-tuned VAE + TrOCR-large), and this environment has
zero egress — so the final fidelity check (SSIM >= 0.99 vs reference
outputs, per-step latent parity) can only run on the day real weights and
reference-side outputs are available.  This script chains every check so
that day is one command:

  1. layout      — the diffusers-layout dir resolves REAL weight files for
                   all three components (unet[_ema]/ vae/ trocr/ safetensors;
                   reference loading semantics) — a bare subdir that the
                   loader would random-initialize fails here
  2. param_pins  — imported trees match the pinned SD2-inpaint counts
                   (UNet 865,925,124 / VAE 83,653,863 at --model_scale full)
  3. goldens     — per-module forwards (TrOCR ctx, VAE encode/decode,
                   UNet eps) vs saved arrays
  4. latents     — the composed edit program's per-step latents vs saved
                   trajectory (task-1 parity, fp32 tolerance)
  5. image       — final uint8 edit: SSIM >= --ssim_threshold (0.99,
                   BASELINE.json north star) + max-LSB report

Checks 3-5 compare against a *reference bundle* directory (saved .npy
arrays).  ``--make_reference`` writes such a bundle from the CURRENT stack
— used by the self-test at tiny scale, and as the format spec: on weight
day, produce the same files from the reference torch stack (diffusers
UNet/VAE + TrOCR, the loop at app.ipynb:796-824) and point
``--reference_outputs`` at them.  Without a bundle, stages 3-5 are
recorded as "skipped" and the command still certifies layout + pins.

Usage:
  python -m diffute_tpu.eval.acceptance --pretrained <dir> \\
      [--reference_outputs <bundle>] [--out report.json]
  python -m diffute_tpu.eval.acceptance --pretrained <dir> \\
      --make_reference <bundle>        # write the bundle from this stack

Exit code 0 iff every non-skipped stage passes.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
from typing import Dict

import numpy as np

# pins for --model_scale full (SD2-inpainting + SD2 VAE); see
# tests/test_full_topology_parity.py
PARAM_PINS = {"full": {"unet": 865_925_124, "vae": 83_653_863}}

GOLDEN_FILES = {
    "trocr_ctx": "golden_trocr_ctx.npy",
    "vae_mean": "golden_vae_mean.npy",
    "vae_logvar": "golden_vae_logvar.npy",
    "vae_dec": "golden_vae_dec.npy",
    "unet_eps": "golden_unet_eps.npy",
}
LATENTS_FILE = "latents_steps.npy"
IMAGE_FILE = "edited_uint8.npy"
MANIFEST_FILE = "manifest.json"


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pretrained", required=True,
                   help="diffusers-layout dir (vae/ unet/ [trocr/])")
    p.add_argument("--reference_outputs", default=None,
                   help="bundle dir with golden arrays (see module doc)")
    p.add_argument("--make_reference", default=None,
                   help="write a bundle from THIS stack instead of checking")
    p.add_argument("--model_scale", default="full",
                   choices=["full", "small", "tiny"])
    p.add_argument("--steps", type=int, default=10,
                   help="denoise steps for the latent-parity stage")
    p.add_argument("--sampler", default="ddim", choices=["ddim", "ddpm"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scene_seed", type=int, default=11)
    p.add_argument("--text", default="Hi")
    p.add_argument("--ssim_threshold", type=float, default=0.99)
    p.add_argument("--out", default=None, help="report JSON path")
    return p.parse_args(argv)


def _config(scale):
    from diffute_tpu.config import (DiffUTEConfig, small_config,
                                    tiny_test_config)

    return {"full": DiffUTEConfig, "small": small_config,
            "tiny": tiny_test_config}[scale]()


def _scene(cfg, scene_seed, text):
    """Deterministic device-seam inputs (the 512^2-analog crop triple +
    glyph), reproducible from the manifest on either stack."""
    from diffute_tpu.pipeline.regions import generate_mask, make_masked_image
    from diffute_tpu.text import render_glyph, trocr_preprocess_host

    res = cfg.edit.resolution
    rng = np.random.RandomState(scene_seed)
    image = rng.randint(0, 256, (res, res, 3)).astype(np.uint8)
    q = max(1, res // 4)
    box = np.int32([q, q, 3 * q, 2 * q])
    mask = generate_mask((res, res), box)
    masked = make_masked_image(image, mask)
    glyph = trocr_preprocess_host([render_glyph(text, cfg.glyph)], cfg.trocr)
    return image, mask, masked, glyph


def _compute_outputs(cfg, params, args) -> Dict[str, np.ndarray]:
    """Module goldens + composed trajectory + final image from this stack."""
    import jax
    import jax.numpy as jnp

    from diffute_tpu.pipeline import DiffUTEPipeline
    from diffute_tpu.pipeline.edit import _seed32, trocr_normalize

    pipe = DiffUTEPipeline(cfg, params)
    image, mask, masked, glyph = _scene(cfg, args.scene_seed, args.text)
    out: Dict[str, np.ndarray] = {}

    # per-module goldens on deterministic inputs
    ctx = jax.jit(lambda p, g: pipe.trocr.apply(
        {"params": p}, trocr_normalize(g)))(pipe.params["trocr"],
                                            jnp.asarray(glyph))
    out["trocr_ctx"] = np.asarray(ctx)
    norm = (jnp.asarray(masked[None]).astype(jnp.float32) / 255.0 - 0.5) / 0.5
    mean, logvar = jax.jit(lambda p, x: pipe.vae.apply(
        {"params": p}, x, method=pipe.vae.encode))(pipe.params["vae"], norm)
    out["vae_mean"], out["vae_logvar"] = np.asarray(mean), np.asarray(logvar)
    dec = jax.jit(lambda p, z: pipe.vae.apply(
        {"params": p}, z, method=pipe.vae.decode))(pipe.params["vae"], mean)
    out["vae_dec"] = np.asarray(dec)
    rngs = np.random.RandomState(args.scene_seed + 1)
    x9 = rngs.randn(1, mean.shape[1], mean.shape[2],
                    cfg.unet.in_channels).astype(np.float32)
    t = np.array([517 % cfg.scheduler.num_train_timesteps], np.int32)
    eps = jax.jit(lambda p, x, tt, c: pipe.unet.apply(
        {"params": p}, x, tt, c))(pipe.params["unet"], x9, t, ctx)
    out["unet_eps"] = np.asarray(eps)

    # composed program: per-step latents + final uint8 (the REAL staged
    # programs edit() chains; trajectory mode pinned identical to the
    # production chain in tests/test_composed_parity.py)
    dummy = jnp.zeros((1, 1, 1, 3), jnp.uint8)
    inputs = (dummy, jnp.asarray(mask[None]), jnp.asarray(masked[None]),
              jnp.asarray(glyph))
    pipe._get_compiled(args.steps, args.sampler, 1.0, False, 1)
    prep, _, _ = pipe._stages[(args.steps, args.sampler, 1.0, False, 1)]
    *prepped, k_loop = prep(pipe.params, *inputs, dummy, _seed32(args.seed))
    latents, traj = jax.jit(functools.partial(
        pipe._device_loop, args.steps, args.sampler, 1.0, False, 1,
        return_trajectory=True))(pipe.params["unet"], *prepped, k_loop)
    out["latents_steps"] = np.asarray(traj)
    out["edited_uint8"] = np.asarray(
        pipe._decode(pipe.params["vae"], latents))
    return out


def run_acceptance(args) -> dict:
    from diffute_tpu.models.unet import count_params
    from diffute_tpu.serve.loading import load_diffusers_layout

    report = {"pretrained": args.pretrained, "model_scale": args.model_scale,
              "stages": {}}
    stages = report["stages"]

    def stage(name, status, **details):
        stages[name] = {"status": status, **details}
        print(f"[{status:>7}] {name}"
              + (f" — {details}" if details else ""), flush=True)

    # 1. layout loads — resolve the weight FILES the loader will read, not
    # just subdirectories: load_diffusers_layout silently random-initializes
    # any component whose safetensors file is absent, and the param pins
    # then pass by construction (they count topology, not values), so a
    # bare/interrupted export must fail HERE, not exit 0 "accepted".
    from diffute_tpu.serve.loading import resolve_diffusers_layout

    cfg = _config(args.model_scale)
    sources = resolve_diffusers_layout(args.pretrained)
    missing = [k for k, v in sources.items() if not v]
    if missing:
        stage("layout", "fail", missing_weight_files=missing,
              resolved=sources)
        return report
    params = load_diffusers_layout(args.pretrained, cfg)
    stage("layout", "pass", resolved=sources)

    # 2. param pins
    counts = {k: count_params(params[k]) for k in ("unet", "vae", "trocr")}
    pins = PARAM_PINS.get(args.model_scale)
    if pins:
        ok = all(counts[k] == v for k, v in pins.items())
        stage("param_pins", "pass" if ok else "fail",
              counts=counts, expected=pins)
        if not ok:
            return report
    else:
        stage("param_pins", "skipped", counts=counts,
              note="pins exist only for --model_scale full")

    def _arg_key(a):
        return (a.steps, a.sampler, a.seed, a.scene_seed, a.text)

    computed = None  # (arg_key, outputs) — reused when the manifest matches
    if args.make_reference:
        out = _compute_outputs(cfg, params, args)
        computed = (_arg_key(args), out)
        os.makedirs(args.make_reference, exist_ok=True)
        for key, fname in {**GOLDEN_FILES,
                           "latents_steps": LATENTS_FILE,
                           "edited_uint8": IMAGE_FILE}.items():
            np.save(os.path.join(args.make_reference, fname), out[key])
        with open(os.path.join(args.make_reference, MANIFEST_FILE), "w") as f:
            json.dump({"model_scale": args.model_scale, "steps": args.steps,
                       "sampler": args.sampler, "seed": args.seed,
                       "scene_seed": args.scene_seed, "text": args.text},
                      f, indent=2)
        stage("make_reference", "pass", path=args.make_reference)
        if not args.reference_outputs:
            return report
        # both flags: the operator wants our bundle WRITTEN and the
        # provided one COMPARED — returning here would certify with zero
        # numeric checks run (and without even "skipped" stages for the
        # vacuity guard to catch); fall through to the comparison, which
        # recomputes outputs under the bundle's manifest-pinned args

    if not args.reference_outputs:
        for name in ("goldens", "latents", "image"):
            stage(name, "skipped", note="no --reference_outputs bundle")
        return report

    bundle = args.reference_outputs
    man_path = os.path.join(bundle, MANIFEST_FILE)
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if man.get("model_scale", args.model_scale) != args.model_scale:
            # comparing across scales would crash mid-broadcast later;
            # fail cleanly with the mismatch on the report instead
            stage("manifest", "fail", bundle_scale=man["model_scale"],
                  run_scale=args.model_scale,
                  note="re-run with --model_scale matching the bundle")
            return report
        for k in ("steps", "sampler", "seed", "scene_seed", "text"):
            if k in man:
                setattr(args, k, man[k])
    # fail fast on a bundle with no comparable arrays: at full scale
    # _compute_outputs pays several multi-minute compiles plus chip runs,
    # and a mistyped/empty bundle dir must not cost that before the
    # vacuity guard below would reject it anyway
    if not any(os.path.exists(os.path.join(bundle, f))
               for f in (*GOLDEN_FILES.values(), LATENTS_FILE, IMAGE_FILE)):
        stage("bundle", "fail",
              note="--reference_outputs contains no comparable arrays "
                   "(expected the make_reference file set)")
        return report
    if computed is not None and computed[0] == _arg_key(args):
        # both-flags invocation whose bundle manifest pins the same args:
        # the outputs just written are the outputs to compare — don't pay
        # the multi-minute full-scale compute twice
        out = computed[1]
    else:
        out = _compute_outputs(cfg, params, args)

    # 3. per-module goldens (fp32 cross-stack tolerance).  An absent file in
    # a provided bundle is a spec violation (make_reference always writes
    # all five): partial bundles FAIL rather than pass on whatever remains;
    # a bundle with none of them (e.g. filenames mismatched) is "skipped",
    # and the vacuity guard below refuses to accept on that.
    ok, details = True, {}
    compared = 0
    for key, fname in GOLDEN_FILES.items():
        path = os.path.join(bundle, fname)
        if not os.path.exists(path):
            details[key] = "absent"
            continue
        compared += 1
        ref = np.load(path)
        scale = max(1.0, float(np.abs(ref).max()))
        err = float(np.abs(out[key] - ref).max())
        details[key] = {"max_err": err, "scale": scale}
        ok &= err <= 2e-3 * scale
    if compared == 0:
        stage("goldens", "skipped", note="no golden arrays in bundle")
    elif compared < len(GOLDEN_FILES):
        stage("goldens", "fail", **details)
    else:
        stage("goldens", "pass" if ok else "fail", **details)

    # 4. per-step latent parity
    lat_path = os.path.join(bundle, LATENTS_FILE)
    if os.path.exists(lat_path):
        ref = np.load(lat_path)
        per_step, ok = [], True
        for i in range(min(len(ref), len(out["latents_steps"]))):
            scale = max(1.0, float(np.abs(ref[i]).max()))
            err = float(np.abs(out["latents_steps"][i] - ref[i]).max())
            per_step.append(err)
            ok &= err <= 5e-3 * scale
        ok &= len(ref) == len(out["latents_steps"])
        stage("latents", "pass" if ok else "fail",
              steps=len(per_step), max_err_per_step=per_step)
    else:
        stage("latents", "skipped", note=f"{LATENTS_FILE} absent")

    # 5. final image SSIM + LSB
    img_path = os.path.join(bundle, IMAGE_FILE)
    if os.path.exists(img_path):
        from diffute_tpu.eval import ssim

        ref = np.load(img_path)
        got = out["edited_uint8"]
        s = float(ssim(ref[0], got[0]))
        lsb = int(np.abs(got.astype(np.int32) - ref.astype(np.int32)).max())
        stage("image", "pass" if s >= args.ssim_threshold else "fail",
              ssim=s, threshold=args.ssim_threshold, max_lsb=lsb)
    else:
        stage("image", "skipped", note=f"{IMAGE_FILE} absent")

    # vacuity guard: the operator pointed at a bundle, so at least one
    # numeric comparison must actually have run for "accepted" to mean
    # anything — a manifest-only directory must not certify the weights
    if all(stages[s]["status"] == "skipped"
           for s in ("goldens", "latents", "image")):
        stage("bundle", "fail",
              note="--reference_outputs contains no comparable arrays "
                   "(expected the make_reference file set)")

    return report


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax

    from diffute_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    jax.config.update("jax_default_prng_impl", "rbg")

    report = run_acceptance(args)
    failed = [k for k, v in report["stages"].items()
              if v["status"] == "fail"]
    report["accepted"] = not failed
    text = json.dumps(report, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
