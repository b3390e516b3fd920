"""Composed-pipeline numeric parity: the full device edit program vs an
independent torch transcription of the reference denoise loop.

Model *forwards* are pinned in tests/test_full_topology_parity.py and the
scheduler math in tests/test_schedulers.py, but neither can see a silent
divergence in the COMPOSED program — the seam the reference defines at
app.ipynb:796-824:

  masked crop -> VAE encode -> sample -> x 0.18215          (app.ipynb:793-794)
  mask -> F.interpolate nearest to latent res               (app.ipynb:787-790)
  latents = seeded randn x init_noise_sigma                 (app.ipynb:796-801)
  for t in set_timesteps(N):                                (app.ipynb:803-816)
      x = scale_model_input(latents, t)
      x_in = cat([x, mask, masked_latents], dim=1)  # 9ch order
      eps = unet(x_in, t, ocr_embeddings)
      latents = scheduler.step(eps, t, latents).prev_sample
  image = vae.decode(latents / 0.18215); uint8              (app.ipynb:818-824)

This file transcribes that loop in torch (diffusers DDPM/DDIM step + timestep
spacing semantics re-derived here, NOT imported from diffute_tpu — an
independent mirror), runs the REAL pipeline stages (DiffUTEPipeline._device_
prep/loop/decode, the exact compiled programs `edit()` chains) at tiny scale
with identical imported weights and identical pre-sampled noise, and asserts

  - per-step latent parity (fp32 tolerance) for >= 10 DDPM and DDIM steps,
  - the final uint8 image within 1 LSB.

Concat order, x0.18215 placement, timestep spacing off-by-ones and the
init-noise convention all fail loudly here.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

from diffute_tpu.compat.hf_import import (
    import_unet_state_dict,
    import_vae_state_dict,
)
from diffute_tpu.config import tiny_test_config
from diffute_tpu.pipeline import DiffUTEPipeline
from diffute_tpu.pipeline.regions import generate_mask, make_masked_image
from diffute_tpu.text import render_glyph, trocr_normalize, trocr_preprocess_host
from diffute_tpu.utils import init_pipeline_params

# pytest puts tests/ itself on sys.path (conftest.py, prepend import mode)
from test_full_topology_parity import TUNet, TVAE, _state_dict_np


# ---------------------------------------------------------------------------
# Independent torch mirror of the reference inference program
# ---------------------------------------------------------------------------


def _scheduler_tables(cfg):
    """SD2 scaled_linear betas -> cumulative alpha table (float64 like
    diffusers' numpy construction)."""
    sc = cfg.scheduler
    betas = np.linspace(sc.beta_start ** 0.5, sc.beta_end ** 0.5,
                        sc.num_train_timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas).astype(np.float32)


def _leading_timesteps(T, n, offset=0):
    """diffusers default "leading" spacing: floor-strided arange, reversed."""
    ratio = T // n
    ts = (np.arange(0, n) * ratio).round()[::-1].astype(np.int64) + offset
    return np.clip(ts, 0, T - 1)


def _to_nchw(a_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.ascontiguousarray(
        a_nhwc.transpose(0, 3, 1, 2)))


def torch_reference_edit(tvae, tunet, cfg, mask_u8, masked_u8, ctx,
                         n_init, n_mask, step_noise, num_steps, sampler,
                         guidance=1.0, null_ctx=None, blend=False,
                         crop_u8=None, n_crop=None, blend_noise=None):
    """The reference text_editing device semantics (app.ipynb:787-824),
    transcribed in torch with injected noise (NHWC arrays, converted here).
    CFG (when guidance > 1) runs cond and uncond as TWO SEQUENTIAL unet
    applies — the formulation the pipeline's batch-2B apply must equal —
    and ``blend`` applies the opt-in masked-latent blend each step.
    Returns (per-step NHWC latent list, final uint8 HWC image)."""
    sf = cfg.vae.scaling_factor
    T = cfg.scheduler.num_train_timesteps
    ac = torch.from_numpy(_scheduler_tables(cfg))
    final_alpha = (torch.tensor(1.0) if cfg.scheduler.set_alpha_to_one
                   else ac[0])
    ratio = T // num_steps

    def norm(u8_hwc):
        x = torch.from_numpy(u8_hwc.astype(np.float32)).permute(2, 0, 1)[None]
        return (x / 255.0 - 0.5) / 0.5

    # mask to latent resolution: torch F.interpolate nearest
    # (app.ipynb:787-790)
    r = mask_u8.shape[0] // cfg.vae.scale_factor
    mask = torch.from_numpy(mask_u8.astype(np.float32))[None, None]
    mask_lat = F.interpolate(mask, size=(r, r), mode="nearest")

    # masked-image latents: encode -> DiagonalGaussian sample -> x sf
    # (app.ipynb:793-794); diffusers clamps logvar to [-30, 20]
    with torch.no_grad():
        moments = tvae.quant_conv(tvae.encoder(norm(masked_u8)))
    mean, logvar = moments.chunk(2, dim=1)
    logvar = logvar.clamp(-30.0, 20.0)
    masked_lat = (mean + torch.exp(0.5 * logvar) * _to_nchw(n_mask)) * sf

    # opt-in blend: the crop's own (sampled) latents, re-noised to each
    # step's level and pasted outside the mask
    if blend:
        with torch.no_grad():
            cmo = tvae.quant_conv(tvae.encoder(norm(crop_u8)))
        cmean, clogvar = cmo.chunk(2, dim=1)
        clogvar = clogvar.clamp(-30.0, 20.0)
        crop_lat = (cmean + torch.exp(0.5 * clogvar) * _to_nchw(n_crop)) * sf
        bnoise = _to_nchw(blend_noise)

    # init noise x init_noise_sigma (=1 for DDPM/DDIM; app.ipynb:796-801)
    latents = _to_nchw(n_init) * 1.0

    offset = cfg.scheduler.steps_offset if sampler in ("ddim", "dpmpp") else 0
    ts = _leading_timesteps(T, num_steps, offset)
    # DPM-Solver++(2M) multistep carry: previous step's x0 prediction and
    # timestep (first step falls back to first order)
    dpm_prev_x0, dpm_t_last = None, -1
    traj = []
    for i, t in enumerate(ts):
        t = int(t)
        x = latents  # scale_model_input is identity (app.ipynb:810)
        x_in = torch.cat([x, mask_lat, masked_lat], dim=1)  # 9-ch order
        with torch.no_grad():
            eps = tunet(x_in, torch.tensor([t]), ctx)
            if guidance > 1.0:
                eps_u = tunet(x_in, torch.tensor([t]), null_ctx)
                eps = eps_u + guidance * (eps - eps_u)

        # diffusers step(): prev_timestep = t - T // num_inference_steps
        prev_t = t - ratio
        a_t = ac[t]
        b_t = 1.0 - a_t
        x0 = (latents - torch.sqrt(b_t) * eps) / torch.sqrt(a_t)
        if sampler == "ddpm":
            # DDPMScheduler: alpha_prod_prev falls back to ONE below t=0
            a_prev = ac[prev_t] if prev_t >= 0 else torch.tensor(1.0)
            b_prev = 1.0 - a_prev
            cur_a = a_t / a_prev
            cur_b = 1.0 - cur_a
            mean_prev = (torch.sqrt(a_prev) * cur_b / b_t) * x0 \
                + (torch.sqrt(cur_a) * b_prev / b_t) * latents
            var = torch.clamp(b_prev / b_t * cur_b, min=1e-20)
            latents = mean_prev
            if t > 0:
                latents = latents + torch.sqrt(var) \
                    * _to_nchw(step_noise[i])
        elif sampler == "dpmpp":
            # DPM-Solver++(2M), data prediction, re-derived from Lu et al.
            # 2022 (arXiv:2211.01095 eq. 4.4) in half-log-SNR notation:
            #   lambda = 0.5*log(ac/(1-ac)); h = lam_prev - lam_t
            #   x_prev = (sig_prev/sig_t) x - alpha_prev*expm1(-h) * D
            # where D is x0 (first order) or the 2M extrapolation of the
            # last two x0 predictions. prev_t follows the timestep SEQUENCE
            # (diffusers DPMSolverMultistep convention), with the final
            # boundary at final_alpha_cumprod and, like lower_order_final,
            # first order on the last step.
            prev_t = int(ts[i + 1]) if i + 1 < len(ts) else -1
            a_prev = ac[prev_t] if prev_t >= 0 else final_alpha
            alpha_s, sigma_s = torch.sqrt(a_prev), torch.sqrt(1.0 - a_prev)
            sigma_t = torch.sqrt(b_t)
            lam_t = 0.5 * (torch.log(a_t) - torch.log1p(-a_t))
            lam_s = 0.5 * (torch.log(a_prev) - torch.log1p(-a_prev))
            h = lam_s - lam_t
            if dpm_t_last >= 0 and prev_t >= 0:
                a_last = ac[dpm_t_last]
                lam_l = 0.5 * (torch.log(a_last) - torch.log1p(-a_last))
                r = (lam_t - lam_l) / h
                d = (1.0 + 1.0 / (2.0 * r)) * x0 \
                    - 1.0 / (2.0 * r) * dpm_prev_x0
            else:
                d = x0
            latents = (sigma_s / sigma_t) * latents \
                - alpha_s * torch.expm1(-h) * d
            dpm_prev_x0, dpm_t_last = x0, t
        else:  # ddim, eta=0; boundary uses final_alpha_cumprod
            a_prev = ac[prev_t] if prev_t >= 0 else final_alpha
            latents = torch.sqrt(a_prev) * x0 \
                + torch.sqrt(1.0 - a_prev) * eps
        if blend:
            if prev_t >= 0:
                noised = torch.sqrt(ac[prev_t]) * crop_lat \
                    + torch.sqrt(1.0 - ac[prev_t]) * bnoise
            else:
                noised = crop_lat
            latents = mask_lat * latents + (1.0 - mask_lat) * noised
        traj.append(latents.numpy().transpose(0, 2, 3, 1).copy())

    with torch.no_grad():
        img = tvae.decoder(tvae.post_quant_conv(latents / sf))
    img = ((img / 2 + 0.5).clamp(0, 1) * 255.0).round()
    return traj, img[0].permute(1, 2, 0).numpy().astype(np.uint8)


# ---------------------------------------------------------------------------
# Shared fixtures: torch mirrors + pipeline with the SAME imported weights
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(7)
    cfg = tiny_test_config()
    tunet = TUNet(cfg.unet).eval()
    tvae = TVAE(cfg.vae).eval()

    params = init_pipeline_params(cfg, seed=3)  # trocr init; vae/unet replaced
    params["unet"] = import_unet_state_dict(_state_dict_np(tunet))
    params["vae"] = import_vae_state_dict(_state_dict_np(tvae))
    pipe = DiffUTEPipeline(cfg, params)

    # a deterministic scene at the device seam: the 512^2-analog crop inputs
    rng = np.random.RandomState(11)
    res = cfg.edit.resolution
    image = rng.randint(0, 256, (res, res, 3), np.uint8)
    box = np.int32([8, 12, 24, 20])
    mask = generate_mask((res, res), box)
    masked = make_masked_image(image, mask)
    glyph = trocr_preprocess_host([render_glyph("Hi", cfg.glyph)], cfg.trocr)

    # conditioning: OUR TrOCR's features, fed to both sides (the encoder
    # itself is pinned exactly vs HF torch in tests/test_torch_parity.py)
    ctx = np.asarray(
        jax.jit(lambda p, g: pipe.trocr.apply({"params": p},
                                              trocr_normalize(g)))(
            pipe.params["trocr"], jnp.asarray(glyph)))
    return dict(cfg=cfg, pipe=pipe, tunet=tunet, tvae=tvae, image=image,
                mask=mask, masked=masked, glyph=glyph, ctx=ctx)


def _pipeline_noise(cfg, seed, num_steps, sampler, lat_shape):
    """Replicate the pipeline's key-derivation tree (_device_prep /
    _device_loop) so the torch mirror consumes the exact same draws."""
    k_prep, k_loop = jax.random.split(jax.random.PRNGKey(seed))
    k_init, k_mask_lat, k_crop_lat = jax.random.split(k_prep, 3)
    n_init = np.asarray(jax.random.normal(k_init, lat_shape, jnp.float32))
    n_mask = np.asarray(jax.random.normal(k_mask_lat, lat_shape, jnp.float32))
    n_crop = np.asarray(jax.random.normal(k_crop_lat, lat_shape, jnp.float32))
    k_blend, k_steps = jax.random.split(k_loop)
    blend_noise = np.asarray(jax.random.normal(k_blend, lat_shape,
                                               jnp.float32))
    if sampler == "ddpm":
        step_noise = np.asarray(jax.random.normal(
            k_steps, (num_steps,) + lat_shape, jnp.float32))
    else:
        step_noise = np.zeros((num_steps,) + lat_shape, np.float32)
    return n_init, n_mask, n_crop, blend_noise, step_noise


@pytest.mark.parametrize("sampler,num_steps,guidance,blend", [
    ("ddpm", 12, 1.0, False),
    ("ddim", 10, 1.0, False),
    # the two opt-ins together (BASELINE config 4): CFG — which the pipeline
    # runs as ONE batch-2B apply — against the sequential two-apply torch
    # formulation, plus the per-step masked-latent blend
    ("ddim", 10, 3.0, True),
    # the fast-serving default: DPM-Solver++(2M) multistep carry
    # (prev_x0/t_last threading) against the independent torch mirror,
    # plain and with CFG+blend
    ("dpmpp", 12, 1.0, False),
    ("dpmpp", 10, 3.0, True),
])
def test_composed_denoise_parity(setup, sampler, num_steps, guidance, blend):
    cfg, pipe = setup["cfg"], setup["pipe"]
    seed = 0
    r = cfg.edit.resolution // cfg.vae.scale_factor
    lat_shape = (1, r, r, cfg.vae.latent_channels)
    use_cfg = guidance > 1.0

    n_init, n_mask, n_crop, blend_noise, step_noise = _pipeline_noise(
        cfg, seed, num_steps, sampler, lat_shape)
    null_t = None
    if use_cfg:
        null_glyph = trocr_preprocess_host(
            [render_glyph("", cfg.glyph)], cfg.trocr)
        null_ctx = np.asarray(
            jax.jit(lambda p, g: pipe.trocr.apply(
                {"params": p}, trocr_normalize(g)))(
                pipe.params["trocr"], jnp.asarray(null_glyph)))
        null_t = torch.from_numpy(null_ctx.copy())
    ref_traj, ref_img = torch_reference_edit(
        setup["tvae"], setup["tunet"], cfg, setup["mask"], setup["masked"],
        torch.from_numpy(setup["ctx"].copy()), n_init, n_mask, step_noise,
        num_steps, sampler, guidance=guidance, null_ctx=null_t, blend=blend,
        crop_u8=setup["image"], n_crop=n_crop, blend_noise=blend_noise)

    # our side: the REAL staged programs edit() chains (prep -> loop ->
    # decode), with the loop additionally emitting its per-step latents
    dummy = jnp.zeros((1, 1, 1, 3), jnp.uint8)
    crop_in = jnp.asarray(setup["image"][None]) if blend else dummy
    null_in = jnp.asarray(null_glyph) if use_cfg else dummy
    inputs = (crop_in, jnp.asarray(setup["mask"][None]),
              jnp.asarray(setup["masked"][None]), jnp.asarray(setup["glyph"]))
    fn = pipe._get_compiled(num_steps, sampler, guidance, blend, 1)
    prep, _, _ = pipe._stages[(num_steps, sampler, guidance, blend, 1)]
    *prepped, k_loop = prep(pipe.params, *inputs, null_in, np.int32(seed))
    loop_traj = jax.jit(functools.partial(
        pipe._device_loop, num_steps, sampler, guidance, blend, 1,
        return_trajectory=True))
    latents, traj = loop_traj(pipe.params["unet"], *prepped, k_loop)
    traj = np.asarray(traj)
    out = np.asarray(pipe._decode(pipe.params["vae"], latents))

    # per-step latent parity within fp32 tolerance: both sides run ~10 torch
    # vs XLA fp32 UNet applies whose op-order differs, and early steps divide
    # by sqrt(alpha_bar) ~ 0.07, so errors compound multiplicatively — 5e-3
    # of the running latent scale catches any structural divergence (wrong
    # concat order or scaling shifts latents by O(1)).
    assert traj.shape[0] == num_steps
    for i, ref_step in enumerate(ref_traj):
        scale = max(1.0, float(np.abs(ref_step).max()))
        err = float(np.abs(traj[i] - ref_step).max())
        assert err <= 5e-3 * scale, (
            f"{sampler} step {i}: max|err| {err:.2e} vs scale {scale:.2f}")

    # final uint8 image within 1 LSB
    diff = np.abs(out[0].astype(np.int32) - ref_img.astype(np.int32))
    assert diff.max() <= 1, f"uint8 image differs by {diff.max()} LSB"

    # and the production (non-trajectory) chain produces the SAME image —
    # proves the instrumented loop is the deployed program
    out_prod = np.asarray(fn(pipe.params, *inputs, null_in, np.int32(seed)))
    np.testing.assert_array_equal(out_prod, out)
