"""DiffUTEPipeline — end-to-end text editing, jit-compiled on device.

Functional equivalent of the reference's ``text_editing`` (app.ipynb:653-854)
with a TPU-first execution split:

host (numpy/PIL/cv2):  box extension, mask raster, crop-window selection,
                       glyph raster, 512^2 / 384^2 resizes, paste-back —
                       cheap uint8 ops on small buffers;
device (ONE jit program): normalize -> TrOCR encode -> VAE encodes -> full
                       denoise loop as ``lax.scan`` -> VAE decode -> uint8.

The reference re-enters Python every denoising step (app.ipynb:806-816,
one CUDA launch sequence per iteration); here the entire sampler runs inside
a single XLA executable per (steps, sampler, flags) signature — no host
round-trips (BASELINE.json north star).

Reference-parity notes: no classifier-free guidance by default (the
reference defines --guidance_scale but never applies it,
train_diffute_v1.py:915-917) and no masked-latent blending (the inpaint
constraint rides the 9-channel input only); both are opt-in via EditConfig —
CFG conditions on the empty-string glyph as the null embedding.  The default
SAMPLER is the north-star 50-step DDIM (BASELINE.json config 3); the
reference's demo samples DDPM-ancestral at 150 steps — use
``EditConfig(sampler="ddpm", num_inference_steps=150)`` for
reference-faithful sampling.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffute_tpu.config import DiffUTEConfig, EditConfig
from diffute_tpu.diffusion import (
    add_noise,
    ddim_step,
    ddim_timesteps,
    ddpm_step,
    ddpm_timesteps,
    dpmpp_2m_step,
    make_schedule,
)
from diffute_tpu.io import hostops
from diffute_tpu.models import AutoencoderKL, TrOCREncoder, UNet2DCondition
from diffute_tpu.models.vae import sample_latent
from diffute_tpu.pipeline.crop import infer_crop_params, paste_back
from diffute_tpu.pipeline.regions import generate_mask, make_masked_image
from diffute_tpu.text import render_glyph, trocr_normalize, trocr_preprocess_host


def normalize_image(x_uint8: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float [-1,1] (albumentations Normalize(0.5, 0.5),
    reference train_diffute_v1.py:336-340)."""
    return (x_uint8.astype(jnp.float32) / 255.0 - 0.5) / 0.5


def _has_quant_leaves(tree) -> bool:
    if isinstance(tree, dict):
        return "kernel_q" in tree or any(_has_quant_leaves(v)
                                         for v in tree.values())
    return False


def _cast_floating(tree, dtype):
    """Cast floating-point leaves of a param tree to ``dtype`` (no-op for
    f32 configs, e.g. the numeric-parity tests)."""
    if dtype == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def _seed32(seed) -> np.uint32:
    """Narrow a user seed to the uint32 the device program consumes.

    ``PRNGKey`` historically folded the high word of >=2**32 seeds into the
    key; masking keeps any Python int valid at the API boundary (np.int32
    would raise OverflowError for seeds >= 2**31 under numpy 2.x)."""
    return np.uint32(int(seed) & 0xFFFFFFFF)


def _validate_box(box, image_hw) -> Tuple[int, int, int, int]:
    """Clip the region box to the image; reject degenerate boxes with a clear
    error (the reference crashes deep inside the crop policy instead)."""
    h, w = image_hw
    if len(box) != 4:
        raise ValueError(f"box must be (x1, y1, x2, y2); got {box!r}")
    x1, y1, x2, y2 = (int(v) for v in box)
    if x1 > x2:
        x1, x2 = x2, x1
    if y1 > y2:
        y1, y2 = y2, y1
    x1, x2 = max(0, x1), min(w, x2)
    y1, y2 = max(0, y1), min(h, y2)
    if x2 - x1 < 1 or y2 - y1 < 1:
        raise ValueError(
            f"box {box!r} has no area inside the {w}x{h} image after clipping")
    return x1, y1, x2, y2


class DiffUTEPipeline:
    """Holds frozen model params and compiles the device edit program.

    Params is a dict with keys ``vae``, ``unet``, ``trocr`` (each a flax
    params tree, importable from HF checkpoints via diffute_tpu.compat).
    """

    def __init__(self, config: DiffUTEConfig, params: Dict[str, dict],
                 mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis for
        data-parallel batched inference — params are replicated, device batch
        dims shard across the axis, and XLA derives the rest (BASELINE
        config 5)."""
        self.config = config
        self.vae = AutoencoderKL(config.vae)
        self.unet = UNet2DCondition(config.unet)
        self.trocr = TrOCREncoder(config.trocr)
        self.schedule = make_schedule(config.scheduler)
        self.mesh = mesh
        # Serving params are stored in each model's COMPUTE dtype.  Flax
        # modules cast f32 params to `dtype` at every use anyway, so this is
        # numerically identical — but casting once here halves the weight
        # bytes the UNet reads from HBM per denoise step (~1.7 GB vs 3.4 GB
        # for the 866M-param UNet in bf16) and halves upload/residency.
        unet_params = params["unet"]
        if config.unet.use_int8_weights and not _has_quant_leaves(unet_params):
            # rewrite float transformer kernels -> int8 + per-channel scales
            # matching the use_int8 module structure (checkpoints stay float)
            from diffute_tpu.ops.quant import convert_dense_params_to_int8

            res = config.edit.resolution // config.vae.scale_factor
            target = jax.eval_shape(
                self.unet.init, jax.random.PRNGKey(0),
                jnp.zeros((1, res, res, config.unet.in_channels)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, config.trocr.seq_len,
                           config.unet.cross_attention_dim)))["params"]
            unet_params = convert_dense_params_to_int8(unet_params, target)
        params = {
            "vae": _cast_floating(params["vae"], config.vae.dtype),
            "unet": _cast_floating(unet_params, config.unet.dtype),
            "trocr": _cast_floating(params["trocr"], config.trocr.dtype),
        }
        if mesh is not None:
            # multi-process safe: on a pod mesh device_put cannot target
            # non-addressable devices (tests/test_multihost.py)
            from diffute_tpu.parallel import replicate_tree

            params = replicate_tree(mesh, params)
        else:
            # checkpoint loaders return numpy trees; place them on device ONCE
            # (numpy args to a jitted fn re-upload every call)
            params = jax.device_put(params)
        self.params = params
        # stage caches: prep keyed by (blend, use_cfg), decode shared, loop by
        # the full signature — only the loop recompiles for a new step count
        self._prep_cache = {}
        self._decode = jax.jit(self._device_decode)
        self._compiled = {}
        self._stages = {}  # sig -> (prep, loop, decode) jits, for profiling

    # ------------------------------------------------------------------
    # Device programs
    #
    # The device work is split into THREE jit stages — prep (TrOCR + VAE
    # encodes), the denoise loop (one lax.scan module: still zero host
    # round-trips between steps), and decode.  A single fused module is
    # functionally identical but triggers superlinear XLA compile times
    # (~40s on CPU, 80-400s via the axon remote-compile service, vs a few
    # seconds per stage); the stage boundaries carry only KB-sized latents,
    # so the split costs ~nothing at runtime and recompiling for a new step
    # count rebuilds only the loop module.
    # ------------------------------------------------------------------

    def _device_prep(
        self,
        blend: bool,
        use_cfg: bool,
        params: Dict[str, dict],
        crop_u8: jax.Array,      # (B, R, R, 3) uint8 (used only when blend)
        mask_u8: jax.Array,      # (B, R, R) uint8 {0,1}
        masked_u8: jax.Array,    # (B, R, R, 3) uint8
        glyph_u8: jax.Array,     # (B, 384, 384, 3) uint8
        null_glyph_u8: jax.Array,  # (1, 384, 384, 3) uint8 (CFG only)
        seed: jax.Array,         # () int32
    ):
        cfg = self.config
        sf = cfg.vae.scaling_factor
        f = cfg.vae.scale_factor
        B, R = mask_u8.shape[0], mask_u8.shape[1]
        r = R // f

        # ALL key derivation happens inside this jit: on the relay backend
        # every eager op (PRNGKey / split at the call site) costs a network
        # round-trip per edit.  The loop stage's key is returned as an extra
        # output so the chained program stays a pure jit->jit->jit pipeline.
        k_prep, k_loop = jax.random.split(jax.random.PRNGKey(seed))
        k_init, k_mask_lat, k_crop_lat = jax.random.split(k_prep, 3)

        # Conditioning: TrOCR encode of the glyph render (reference
        # train_diffute_v1.py:868-871).
        ctx = self.trocr.apply({"params": params["trocr"]},
                               trocr_normalize(glyph_u8))
        null_ctx = jnp.zeros_like(ctx)
        if use_cfg:
            null_ctx = jnp.broadcast_to(
                self.trocr.apply({"params": params["trocr"]},
                                 trocr_normalize(null_glyph_u8)), ctx.shape)

        # Mask to latent resolution — torch F.interpolate 'nearest' semantics
        # (reference train_diffute_v1.py:881-883, app.ipynb:787-790; see
        # diffute_tpu.ops.interpolate for why jax.image.resize differs).
        from diffute_tpu.ops.interpolate import nearest_resize_2d

        mask_lat = nearest_resize_2d(mask_u8.astype(jnp.float32), r, r)[..., None]

        # Masked-image latents (sampled, like latent_dist.sample(); reference
        # app.ipynb:793-794).
        mean, logvar = self.vae.apply({"params": params["vae"]},
                                      normalize_image(masked_u8),
                                      method=self.vae.encode)
        masked_latents = sample_latent(mean, logvar, k_mask_lat) * sf

        crop_latents = jnp.zeros_like(masked_latents)
        if blend:
            cmean, clogvar = self.vae.apply({"params": params["vae"]},
                                            normalize_image(crop_u8),
                                            method=self.vae.encode)
            crop_latents = sample_latent(cmean, clogvar, k_crop_lat) * sf

        # Initial noise (reference seeds torch.manual_seed(0) and scales by
        # init_noise_sigma=1, app.ipynb:796-801).
        latents = jax.random.normal(k_init, (B, r, r, cfg.vae.latent_channels),
                                    jnp.float32)
        return (ctx, null_ctx, mask_lat, masked_latents, crop_latents, latents,
                k_loop)

    def _device_loop(
        self,
        num_steps: int,
        sampler: str,
        guidance_scale: float,
        blend: bool,
        reuse_interval: int,
        unet_params,
        ctx, null_ctx, mask_lat, masked_latents, crop_latents, latents,
        key: jax.Array,
        return_trajectory: bool = False,
    ) -> jax.Array:
        use_cfg = guidance_scale > 1.0
        if sampler == "ddpm":
            ts = ddpm_timesteps(self.schedule, num_steps)
        else:
            ts = ddim_timesteps(self.schedule, num_steps)
        ts_arr = jnp.asarray(ts)
        prev_arr = jnp.concatenate([ts_arr[1:], jnp.array([-1], jnp.int32)])

        # All RNG happens OUTSIDE the loop and streams in as scan xs:
        # threefry keygen inside a scan body that also contains the UNet
        # triggers pathological XLA compile times (200s+ observed on TPU vs
        # <15s without in-body RNG) and is pure overhead per step.
        k_blend, k_steps = jax.random.split(key)
        if sampler == "ddpm":
            step_noise = jax.random.normal(
                k_steps, (num_steps,) + latents.shape, latents.dtype)
        else:
            step_noise = jnp.zeros((num_steps,) + (1,) * latents.ndim,
                                   latents.dtype)  # unused by ddim
        blend_noise = (jax.random.normal(k_blend, latents.shape, latents.dtype)
                       if blend else jnp.zeros((1,) * latents.ndim, latents.dtype))

        variables = {"params": unet_params}

        # Cross-attention K/V over the (constant) TrOCR conditioning are
        # loop-invariant: project them ONCE here instead of inside every step.
        ctx_kv = self.unet.apply(variables, ctx,
                                 method=self.unet.cross_attention_kv)
        if use_cfg:
            # CFG runs the [cond; uncond] pair as ONE batch-2B UNet apply per
            # step (the standard trick the reference's commented-out CFG also
            # sketches via latent duplication, train_diffute_v1.py:915-917):
            # one kernel launch sequence, better MXU utilization than two
            # sequential B-sized applies.  Every per-sample op (conv, GN,
            # attention) is batch-independent, so the halves equal the two
            # separate applies (pinned by tests/test_composed_parity.py).
            # Tradeoff: peak activation memory is that of a 2B-sized apply
            # (the round-3 sequential pair peaked at B).  The BASELINE
            # config-4 workload (32 regions -> 64 batched, 512^2) fits the
            # 16 GB chip (measured, benchmarks/results.json); a CFG edit
            # that RESOURCE_EXHAUSTs at high res should halve the caller's
            # batch — each batch element is independent.
            null_kv = self.unet.apply(variables, null_ctx,
                                      method=self.unet.cross_attention_kv)
            ctx_all = jnp.concatenate([ctx, null_ctx], axis=0)
            kv_all = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0), ctx_kv, null_kv)
            mask_all = jnp.concatenate([mask_lat, mask_lat], axis=0)
            masked_all = jnp.concatenate([masked_latents, masked_latents],
                                         axis=0)
        else:
            ctx_all, kv_all = ctx, ctx_kv
            mask_all, masked_all = mask_lat, masked_latents

        def temb_of(t, n):
            return self.unet.apply(variables, t, n, method=self.unet.time_embed)

        def unet_full(x, t):
            """Full forward; also returns the encoder-feature cache."""
            temb = temb_of(t, x.shape[0])
            x_in = jnp.concatenate([x, mask_all, masked_all], axis=-1)
            bottom, skips = self.unet.apply(variables, x_in, temb, ctx_all,
                                            kv_all, method=self.unet.encode)
            eps = self.unet.apply(variables, bottom, skips, temb, ctx_all,
                                  kv_all, method=self.unet.decode)
            return eps, (bottom, tuple(skips))

        def unet_reuse(cache, t):
            """Decoder-only forward over propagated encoder features
            (Faster Diffusion, arXiv:2312.09608)."""
            bottom, skips = cache
            temb = temb_of(t, bottom.shape[0])
            return self.unet.apply(variables, bottom, list(skips), temb,
                                   ctx_all, kv_all, method=self.unet.decode)

        def predict(latents, t, cache):
            """-> (eps, new_cache); cache=None forces a full forward."""
            x = jnp.concatenate([latents, latents], axis=0) if use_cfg \
                else latents
            if cache is None:
                eps, cache = unet_full(x, t)
            else:
                eps = unet_reuse(cache, t)
            if use_cfg:
                eps_c, eps_u = jnp.split(eps, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
            return eps, cache

        def advance(latents, aux, eps, t, prev_t, noise_t):
            if sampler == "ddpm":
                latents = ddpm_step(self.schedule, eps, t, latents, noise_t,
                                    num_inference_steps=num_steps)
            elif sampler == "dpmpp":
                prev_x0, t_last = aux
                latents, x0 = dpmpp_2m_step(self.schedule, eps, t, prev_t,
                                            t_last, latents, prev_x0)
                aux = (x0, t)
            else:
                latents = ddim_step(self.schedule, eps, t, prev_t, latents)
            if blend:
                noised = jnp.where(
                    prev_t >= 0,
                    add_noise(self.schedule, crop_latents, blend_noise,
                              jnp.clip(prev_t, 0)),
                    crop_latents,
                )
                latents = mask_lat * latents + (1.0 - mask_lat) * noised
            return latents, aux

        k = max(1, reuse_interval)
        n_super, rem = divmod(num_steps, k)

        # DPM-Solver++(2M) is multistep: the previous step's x0 prediction
        # and timestep ride the scan carry (single-step samplers carry ()).
        aux0 = ((jnp.zeros_like(latents), jnp.asarray(-1, jnp.int32))
                if sampler == "dpmpp" else ())

        def super_body(carry, scan_x):
            latents, aux = carry
            ts_g, prevs_g, noise_g = scan_x  # leading dim k
            cache = None
            lat_steps = []
            for j in range(k):  # statically unrolled
                eps, cache = predict(latents, ts_g[j],
                                     cache if j > 0 else None)
                latents, aux = advance(latents, aux, eps, ts_g[j],
                                       prevs_g[j], noise_g[j])
                if return_trajectory:
                    lat_steps.append(latents)
            ys = jnp.stack(lat_steps) if return_trajectory else None
            return (latents, aux), ys

        def group(x, n, size):
            return x[: n * size].reshape((n, size) + x.shape[1:])

        aux = aux0
        traj = []
        if n_super:
            (latents, aux), ys = jax.lax.scan(
                super_body, (latents, aux0),
                (group(ts_arr, n_super, k), group(prev_arr, n_super, k),
                 group(step_noise, n_super, k)))
            if return_trajectory:
                traj.append(ys.reshape((n_super * k,) + latents.shape))
        for j in range(num_steps - rem, num_steps):  # remainder: full steps
            eps, _ = predict(latents, ts_arr[j], None)
            latents, aux = advance(latents, aux, eps, ts_arr[j], prev_arr[j],
                                   step_noise[j])
            if return_trajectory:
                traj.append(latents[None])
        if return_trajectory:
            # (num_steps, B, r, r, C): the latent after every sampler step —
            # the per-step parity surface (tests/test_composed_parity.py)
            return latents, jnp.concatenate(traj, axis=0)
        return latents

    def _device_decode(self, vae_params, latents: jax.Array) -> jax.Array:
        # Decode and convert to uint8 (reference app.ipynb:818-824).
        sf = self.config.vae.scaling_factor
        image = self.vae.apply({"params": vae_params}, latents / sf,
                               method=self.vae.decode)
        image = (image / 2 + 0.5) * 255.0
        return jnp.clip(jnp.round(image), 0, 255).astype(jnp.uint8)

    def _get_compiled(self, num_steps: int, sampler: str,
                      guidance_scale: float, blend: bool,
                      reuse_interval: int = 1):
        """Compile (or fetch) the staged programs for this signature; returns
        a callable with the original single-program interface."""
        use_cfg = guidance_scale > 1.0
        sig = (num_steps, sampler, guidance_scale, blend, reuse_interval)
        if sig not in self._compiled:
            prep_sig = (blend, use_cfg)
            if prep_sig not in self._prep_cache:
                self._prep_cache[prep_sig] = jax.jit(
                    functools.partial(self._device_prep, blend, use_cfg))
            prep = self._prep_cache[prep_sig]
            loop = jax.jit(functools.partial(
                self._device_loop, num_steps, sampler, guidance_scale, blend,
                reuse_interval))
            decode = self._decode

            def run(params, crop_u8, mask_u8, masked_u8, glyph_u8,
                    null_glyph_u8, seed):
                *prepped, k_loop = prep(params, crop_u8, mask_u8, masked_u8,
                                        glyph_u8, null_glyph_u8, seed)
                latents = loop(params["unet"], *prepped, k_loop)
                return decode(params["vae"], latents)

            self._compiled[sig] = run
            self._stages[sig] = (prep, loop, decode)
        return self._compiled[sig]

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------

    def edit(
        self,
        image: np.ndarray,            # uint8 HWC RGB
        box: Tuple[int, int, int, int],
        text: str,
        num_inference_steps: Optional[int] = None,
        seed: Optional[int] = None,
        edit_config: Optional[EditConfig] = None,
        rng: Optional[np.random.Generator] = None,
        return_crop: bool = False,
    ):
        """Edit one text region.  Returns (edited uint8 image, full-size mask).

        API mirror of the reference's
        ``text_editing(text, image, steps, x0, y0, x1, y1) -> (PIL, mask*255)``
        (app.ipynb:653,854).

        With ``return_crop=True`` a third element is returned: the pre-paste
        crop-window artifacts ``{"edited_crop", "source_crop", "crop_mask"}``
        (all at the edit resolution).  Paste-back writes ONLY the bbox pixels
        into the original (app.ipynb:827-840), so seam/boundary artifacts the
        model produces around the bbox are invisible in the pasted result —
        eval reads them from here (eval/run.py ssim_window_background).
        """
        ec = edit_config or self.config.edit
        steps = num_inference_steps or ec.num_inference_steps
        seed = ec.seed if seed is None else seed
        res = ec.resolution

        image = np.asarray(image, dtype=np.uint8)
        box = _validate_box(box, image.shape[:2])
        region, mask = self._prepare_region(image, box, text, res, rng)
        edited = self._run_device([region], steps, ec, seed)[0]
        result = paste_back(image, edited, region["x_s"], region["y_s"],
                            region["crop_scale"], region["location"])
        if return_crop:
            return result, mask * 255, {"edited_crop": edited,
                                        "source_crop": region["crop512"],
                                        "crop_mask": region["mask512"]}
        return result, mask * 255

    def edit_profiled(
        self,
        image: np.ndarray,
        box: Tuple[int, int, int, int],
        text: str,
        num_inference_steps: Optional[int] = None,
        seed: Optional[int] = None,
        edit_config: Optional[EditConfig] = None,
        rng: Optional[np.random.Generator] = None,
    ):
        """``edit()`` with a per-stage attribution: returns
        ``(edited, mask*255, stats)`` where ``stats`` carries seconds per
        stage (host_prep, prep, loop, decode, paste) and, best-effort, the
        XLA-reported FLOPs of each device stage (HLO cost analysis on the
        lowered modules — no extra compile).

        Each stage boundary is synced with a full ``jax.device_get`` (the
        only true sync on the relay backend — utils/benchmark.py), which
        adds host round-trips the chained ``edit()`` path does not pay; use
        these numbers to ATTRIBUTE latency, and un-instrumented ``edit()``
        timings for throughput.
        """
        import time

        ec = edit_config or self.config.edit
        steps = num_inference_steps or ec.num_inference_steps
        seed = ec.seed if seed is None else seed
        res = ec.resolution
        use_cfg = ec.guidance_scale > 1.0
        blend = ec.masked_latent_blend

        stats: Dict[str, float] = {}
        t0 = time.perf_counter()
        image = np.asarray(image, dtype=np.uint8)
        box = _validate_box(box, image.shape[:2])
        region, mask = self._prepare_region(image, box, text, res, rng)
        glyph384 = trocr_preprocess_host([region["glyph"]], self.config.trocr)
        dummy = np.zeros((1, 1, 1, 3), np.uint8)
        null384 = (trocr_preprocess_host([render_glyph("", self.config.glyph)],
                                         self.config.trocr)
                   if use_cfg else dummy)
        inputs = (region["crop512"][None] if blend else dummy,
                  region["mask512"][None], region["masked512"][None], glyph384)
        inputs = tuple(jnp.asarray(x) for x in inputs)
        null384 = jnp.asarray(null384)
        stats["host_prep_s"] = time.perf_counter() - t0

        # make sure the compiled stages exist (and warm them) before timing
        self._get_compiled(steps, ec.sampler, ec.guidance_scale, blend,
                           ec.encoder_reuse_interval)
        sig = (steps, ec.sampler, ec.guidance_scale, blend,
               ec.encoder_reuse_interval)
        prep, loop, decode = self._stages[sig]

        t0 = time.perf_counter()
        prepped = jax.device_get(prep(self.params, *inputs, null384,
                                      _seed32(seed)))
        stats["prep_s"] = time.perf_counter() - t0
        *prepped, k_loop = (jnp.asarray(x) for x in prepped)
        t0 = time.perf_counter()
        latents = jax.device_get(loop(self.params["unet"], *prepped, k_loop))
        stats["loop_s"] = time.perf_counter() - t0
        latents = jnp.asarray(latents)
        t0 = time.perf_counter()
        out = np.asarray(jax.device_get(decode(self.params["vae"], latents)))
        stats["decode_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        result = paste_back(image, out[0], region["x_s"], region["y_s"],
                            region["crop_scale"], region["location"])
        stats["paste_s"] = time.perf_counter() - t0

        stats["flops"] = self._stage_flops(sig, inputs, null384)
        return result, mask * 255, stats

    def _stage_flops(self, sig, inputs, null384) -> Optional[Dict[str, float]]:
        """XLA HLO-cost-analysis FLOPs per device stage for a batch-1 edit
        (best-effort: None when the backend's lowering can't report it)."""
        prep, loop, decode = self._stages[sig]
        # must match the runtime seed dtype (_seed32 -> uint32): a different
        # scalar dtype is a different jit signature, and on the axon backend
        # flops_of falls through to lowered.compile() — a signature miss
        # would pay a fresh remote compile instead of hitting the cache
        seed0 = _seed32(0)
        try:
            def flops_of(lowered):
                ca = lowered.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                if not ca or "flops" not in ca:
                    # the axon client's Lowered.cost_analysis() returns
                    # None; the compiled executable's works (and hits the
                    # compile cache — these stages already ran)
                    ca = lowered.compile().cost_analysis()
                    if isinstance(ca, (list, tuple)):
                        ca = ca[0]
                return float(ca["flops"])

            prep_f = flops_of(prep.lower(self.params, *inputs, null384, seed0))
            prepped = jax.eval_shape(prep, self.params, *inputs, null384,
                                     seed0)
            *prepped, key = tuple(jnp.zeros(x.shape, x.dtype)
                                  for x in prepped)
            loop_f = flops_of(loop.lower(self.params["unet"], *prepped, key))
            # HLO cost analysis counts the denoise lax.scan body ONCE
            # (verified empirically); the body holds one reuse-group of
            # steps, so scale by the trip count to get executed flops.
            num_steps, reuse = sig[0], max(1, sig[4])
            loop_f *= max(1, num_steps // reuse)
            lat = jax.eval_shape(loop, self.params["unet"], *prepped, key)
            decode_f = flops_of(decode.lower(
                self.params["vae"], jnp.zeros(lat.shape, lat.dtype)))
            return {"prep": prep_f, "loop": loop_f, "decode": decode_f,
                    "total": prep_f + loop_f + decode_f}
        except Exception:
            return None

    def edit_multi(
        self,
        image: np.ndarray,
        regions,                       # iterable of (box, text)
        num_inference_steps: Optional[int] = None,
        seed: Optional[int] = None,
        edit_config: Optional[EditConfig] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> np.ndarray:
        """Edit several (disjoint) text regions of one image in ONE batched
        device pass — the multi-region mode of BASELINE config 4."""
        ec = edit_config or self.config.edit
        steps = num_inference_steps or ec.num_inference_steps
        seed = ec.seed if seed is None else seed
        res = ec.resolution

        image = np.asarray(image, dtype=np.uint8)
        prepped = [self._prepare_region(
                       image, _validate_box(box, image.shape[:2]), text, res,
                       rng)[0]
                   for box, text in regions]
        edited = self._run_device(prepped, steps, ec, seed)
        result = image
        for r, e in zip(prepped, edited):
            result = paste_back(result, e, r["x_s"], r["y_s"],
                                r["crop_scale"], r["location"])
        return result

    def edit_batch(
        self,
        items,                         # iterable of (image, box, text)
        num_inference_steps: Optional[int] = None,
        seed: Optional[int] = None,
        edit_config: Optional[EditConfig] = None,
        rng: Optional[np.random.Generator] = None,
    ):
        """Batch independent edits (one region each) through one device pass.
        Returns a list of edited images."""
        ec = edit_config or self.config.edit
        steps = num_inference_steps or ec.num_inference_steps
        seed = ec.seed if seed is None else seed
        res = ec.resolution

        prepped = []
        images = []
        for image, box, text in items:
            image = np.asarray(image, dtype=np.uint8)
            images.append(image)
            prepped.append(self._prepare_region(
                image, _validate_box(box, image.shape[:2]), text, res, rng)[0])
        edited = self._run_device(prepped, steps, ec, seed)
        return [paste_back(img, e, r["x_s"], r["y_s"], r["crop_scale"],
                           r["location"])
                for img, e, r in zip(images, edited, prepped)]

    def edit_stream(
        self,
        items,                         # iterable of (image, box, text)
        num_inference_steps: Optional[int] = None,
        seed: Optional[int] = None,
        edit_config: Optional[EditConfig] = None,
        rng: Optional[np.random.Generator] = None,
        depth: int = 2,
    ):
        """Pipelined serving over a stream of independent edits: keep up to
        ``depth`` device programs in flight so host work (region prep, glyph
        raster, paste-back) and the per-edit fixed cost (input upload,
        prep/decode dispatch boundaries) overlap the denoise loop of the
        edits already running.  Yields edited images in submission order.

        jit dispatch is asynchronous — each submitted prep->loop->decode
        chain queues on the device immediately and only the final
        ``device_get`` blocks — so with depth >= 2 the device starts edit
        N+1's program while the host is still fetching/pasting edit N:
        steady-state throughput approaches 1/loop_s instead of
        1/(fixed + loop_s).  Outputs are bit-identical to sequential
        :meth:`edit` calls (same program, same per-edit seed; pinned by
        tests/test_pipeline_stream.py).
        """
        ec = edit_config or self.config.edit
        steps = num_inference_steps or ec.num_inference_steps
        seed = ec.seed if seed is None else seed
        res = ec.resolution
        use_cfg = ec.guidance_scale > 1.0
        blend = ec.masked_latent_blend
        depth = max(1, depth)

        fn = self._get_compiled(steps, ec.sampler, ec.guidance_scale, blend,
                                ec.encoder_reuse_interval)
        dummy = np.zeros((1, 1, 1, 3), np.uint8)
        null384, = self._place_inputs((
            trocr_preprocess_host([render_glyph("", self.config.glyph)],
                                  self.config.trocr)
            if use_cfg else dummy,))

        def submit(item):
            image, box, text = item
            image = np.asarray(image, dtype=np.uint8)
            region, _ = self._prepare_region(
                image, _validate_box(box, image.shape[:2]), text, res, rng)
            glyph384 = trocr_preprocess_host([region["glyph"]],
                                             self.config.trocr)
            inputs = self._place_inputs((
                region["crop512"][None] if blend else dummy,
                region["mask512"][None],
                region["masked512"][None],
                glyph384,
            ))
            seed_p, = self._place_inputs((_seed32(seed),))
            out = fn(self.params, *inputs, null384, seed_p)
            return image, region, out

        def finish(entry):
            image, region, out = entry
            edited = np.asarray(jax.device_get(out))[0]
            return paste_back(image, edited, region["x_s"], region["y_s"],
                              region["crop_scale"], region["location"])

        from collections import deque

        inflight = deque()
        for item in items:
            inflight.append(submit(item))
            # drain once `depth` programs are submitted: at most `depth`
            # in flight, so depth=1 really is sequential (callers use it to
            # bound device-side buffering on the 16 GB chip) and depth=2 is
            # the documented one-ahead overlap
            if len(inflight) >= depth:
                yield finish(inflight.popleft())
        while inflight:
            yield finish(inflight.popleft())

    # ------------------------------------------------------------------
    # Host helpers
    # ------------------------------------------------------------------

    def _prepare_region(self, image, box, text, res, rng):
        # NOTE: the reference defines process_location (the +10% box
        # extension) but only CALLS it in training (train_diffute_v1.py:454);
        # text_editing uses the raw box (app.ipynb:663-665).  We match that:
        # no extension at inference.
        h, w = image.shape[:2]
        location = np.int32(box)
        mask = generate_mask((h, w), location)
        masked = make_masked_image(image, mask)

        x_s, y_s, crop_scale = infer_crop_params((h, w), location, rng)
        crop = image[y_s : y_s + crop_scale, x_s : x_s + crop_scale]
        mask_crop = mask[y_s : y_s + crop_scale, x_s : x_s + crop_scale]
        masked_crop = masked[y_s : y_s + crop_scale, x_s : x_s + crop_scale]

        # albumentations Resize(512,512) == cv2 INTER_LINEAR (reference
        # train_diffute_v1.py:336-345); the 0/1 mask is resized the same way.
        # hostops dispatches to the fastest host backend (cv2 SIMD here,
        # native when cv2 is absent); normalization happens on-device.
        region = {
            "crop512": hostops.resize_bilinear_u8(crop, res, res),
            "mask512": hostops.resize_bilinear_u8(mask_crop, res, res),
            "masked512": hostops.resize_bilinear_u8(masked_crop, res, res),
            "glyph": render_glyph(text, self.config.glyph),
            "x_s": x_s, "y_s": y_s, "crop_scale": crop_scale,
            "location": location,
        }
        return region, mask

    def _run_device(self, regions, steps, ec, seed) -> np.ndarray:
        glyph384 = trocr_preprocess_host([r["glyph"] for r in regions],
                                         self.config.trocr)
        use_cfg = ec.guidance_scale > 1.0
        blend = ec.masked_latent_blend
        # Inputs that the (blend/cfg)-specialized program never reads are
        # replaced by 1-pixel dummies — no point shipping them over the wire.
        dummy = np.zeros((1, 1, 1, 3), np.uint8)
        null384 = (trocr_preprocess_host([render_glyph("", self.config.glyph)],
                                         self.config.trocr)
                   if use_cfg else dummy)
        fn = self._get_compiled(steps, ec.sampler, ec.guidance_scale, blend,
                                ec.encoder_reuse_interval)
        inputs = (
            np.stack([r["crop512"] for r in regions]) if blend else dummy,
            np.stack([r["mask512"] for r in regions]),
            np.stack([r["masked512"] for r in regions]),
            glyph384,
        )
        # null/seed ride the same placement: a multi-process jit rejects
        # local-device arrays mixed with mesh-global ones
        null_p, seed_p = self._place_inputs((null384, _seed32(seed)))
        out = fn(self.params, *self._place_inputs(inputs), null_p, seed_p)
        return np.asarray(jax.device_get(out))

    def _place_inputs(self, inputs) -> tuple:
        """Device placement shared by the batched and streaming paths: on a
        mesh, batch-divisible inputs shard over the data axis and the rest
        replicate (matching the compiled program's input shardings, so a
        stream submit never re-lowers the shared executable); otherwise a
        plain transfer to the default device."""
        if self.mesh is None:
            return tuple(jnp.asarray(x) for x in inputs)
        from jax.sharding import PartitionSpec as P

        from diffute_tpu.parallel import place_global

        n_dev = self.mesh.devices.size

        def put(x):
            x = np.asarray(x)
            spec = P("data") if x.ndim and x.shape[0] % n_dev == 0 else P()
            return place_global(self.mesh, x, spec)

        return tuple(put(x) for x in inputs)


def text_editing(pipe: DiffUTEPipeline, text: str, instance_image: np.ndarray,
                 slider_step: int, x0: int, y0: int, x1: int, y1: int):
    """Signature-compatible wrapper of the reference's
    ``text_editing(text, instance_image, slider_step, x0, y0, x1, y1)
    -> (PIL.Image, mask*255)`` (app.ipynb:653,854), for drop-in callers."""
    from PIL import Image

    out, mask = pipe.edit(instance_image, (x0, y0, x1, y1), text,
                          num_inference_steps=int(slider_step))
    return Image.fromarray(out).convert("RGB"), mask
