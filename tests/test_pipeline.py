"""End-to-end pipeline tests on the tiny config (CPU): the full
host-crop -> device(jit: trocr -> vae -> scan denoise -> decode) -> paste-back
path of DiffUTEPipeline, the framework's equivalent of the reference's
``text_editing`` (app.ipynb:653-854)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffute_tpu.config import tiny_test_config
from diffute_tpu.models import AutoencoderKL, TrOCREncoder, UNet2DCondition
from diffute_tpu.pipeline import DiffUTEPipeline


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_test_config()
    vae = AutoencoderKL(cfg.vae)
    unet = UNet2DCondition(cfg.unet)
    trocr = TrOCREncoder(cfg.trocr)
    res = cfg.edit.resolution
    lat = res // cfg.vae.scale_factor
    params = {
        "vae": vae.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)),
                        jax.random.PRNGKey(1))["params"],
        "unet": unet.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, lat, lat, 9)), jnp.array(0),
                          jnp.zeros((1, cfg.trocr.seq_len, cfg.trocr.hidden_size)))["params"],
        "trocr": trocr.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, cfg.trocr.image_size,
                                       cfg.trocr.image_size, 3)))["params"],
    }
    return DiffUTEPipeline(cfg, params)


@pytest.fixture()
def scene():
    img = np.random.RandomState(0).randint(0, 255, (120, 160, 3), np.uint8)
    box = (40, 50, 100, 70)
    return img, box


def test_edit_runs_and_changes_only_bbox(pipe, scene):
    img, box = scene
    out, mask = pipe.edit(img, box, "NEW", num_inference_steps=3)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert mask.shape == img.shape[:2] and mask.max() == 255
    changed = (out != img).any(axis=-1)
    ys, xs = np.where(changed)
    assert len(ys) > 0  # something was edited
    x1, y1, x2, y2 = box
    # the raw box bounds all changes (the reference applies its +10% box
    # extension only in training, never in text_editing)
    assert xs.min() >= x1 and xs.max() < x2
    assert ys.min() >= y1 and ys.max() < y2


def test_edit_deterministic_for_seed(pipe, scene):
    img, box = scene
    a, _ = pipe.edit(img, box, "abc", num_inference_steps=2, seed=7)
    b, _ = pipe.edit(img, box, "abc", num_inference_steps=2, seed=7)
    np.testing.assert_array_equal(a, b)
    c, _ = pipe.edit(img, box, "abc", num_inference_steps=2, seed=8)
    assert (a != c).any()


def test_edit_ddim_sampler(pipe, scene):
    img, box = scene
    ec = dataclasses.replace(pipe.config.edit, sampler="ddim")
    out, _ = pipe.edit(img, box, "xy", num_inference_steps=2, edit_config=ec)
    assert out.shape == img.shape


def test_edit_dpmpp_sampler(pipe, scene):
    """DPM-Solver++(2M) through the full pipeline: runs at few steps (its
    use case), output confined to the bbox, finite, and distinct across
    step counts (the multistep carry is live)."""
    img, box = scene
    ec = dataclasses.replace(pipe.config.edit, sampler="dpmpp")
    out, _ = pipe.edit(img, box, "xy", num_inference_steps=4, edit_config=ec)
    assert out.shape == img.shape and out.dtype == np.uint8
    changed = (out.astype(int) != img.astype(int)).any(axis=-1)
    ys, xs = np.where(changed)
    assert xs.min() >= box[0] and xs.max() < box[2]
    assert ys.min() >= box[1] and ys.max() < box[3]
    # also exercises the scan super-step path (reuse groups steps)
    ec2 = dataclasses.replace(ec, encoder_reuse_interval=2)
    out2, _ = pipe.edit(img, box, "xy", num_inference_steps=4,
                        edit_config=ec2)
    assert out2.shape == img.shape


def test_edit_cfg_and_blend_opt_in(pipe, scene):
    img, box = scene
    ec = dataclasses.replace(pipe.config.edit, guidance_scale=3.0,
                             masked_latent_blend=True)
    out, _ = pipe.edit(img, box, "xy", num_inference_steps=2, edit_config=ec)
    assert out.shape == img.shape
    changed = (out != img).any(axis=-1)
    assert changed.any()


def test_edit_box_edge_cases(pipe):
    img = np.random.RandomState(3).randint(0, 255, (120, 160, 3), np.uint8)
    # partially out-of-bounds box gets clipped and works
    out, _ = pipe.edit(img, (-20, 100, 60, 300), "x", num_inference_steps=2)
    assert out.shape == img.shape
    # swapped corners are normalized (two-click UIs produce these)
    out, _ = pipe.edit(img, (100, 70, 40, 50), "x", num_inference_steps=2)
    assert out.shape == img.shape
    # whole-image box
    out, _ = pipe.edit(img, (0, 0, 160, 120), "x", num_inference_steps=2)
    assert out.shape == img.shape
    # degenerate boxes raise clearly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pipe.edit(img, (50, 50, 50, 60), "x", num_inference_steps=2)
    with _pytest.raises(ValueError):
        pipe.edit(img, (500, 500, 600, 600), "x", num_inference_steps=2)
    with _pytest.raises(ValueError):
        pipe.edit(img, (1, 2, 3), "x", num_inference_steps=2)


def test_edit_unicode_text(pipe, scene):
    img, box = scene
    # text outside the fallback font's coverage must not crash the pipeline
    out, _ = pipe.edit(img, box, "héllo • 123", num_inference_steps=2)
    assert out.shape == img.shape


def test_encoder_reuse_matches_baseline_at_k1(pipe, scene):
    img, box = scene
    base, _ = pipe.edit(img, box, "abc", num_inference_steps=4, seed=3)
    ec = dataclasses.replace(pipe.config.edit, encoder_reuse_interval=1)
    same, _ = pipe.edit(img, box, "abc", num_inference_steps=4, seed=3,
                        edit_config=ec)
    np.testing.assert_array_equal(base, same)


def test_encoder_reuse_k2_runs(pipe, scene):
    img, box = scene
    # 5 steps with k=2: 2 super-steps + 1 remainder full step
    ec = dataclasses.replace(pipe.config.edit, encoder_reuse_interval=2)
    out, _ = pipe.edit(img, box, "abc", num_inference_steps=5, seed=3,
                       edit_config=ec)
    assert out.shape == img.shape
    changed = (out != img).any(axis=-1)
    assert changed.any()
    # still constrained to the bbox
    x1, y1, x2, y2 = box
    ys, xs = np.where(changed)
    assert xs.min() >= x1 and xs.max() < x2


def test_encoder_reuse_with_cfg(pipe, scene):
    img, box = scene
    ec = dataclasses.replace(pipe.config.edit, encoder_reuse_interval=2,
                             guidance_scale=2.5)
    out, _ = pipe.edit(img, box, "abc", num_inference_steps=4, seed=3,
                       edit_config=ec)
    assert out.shape == img.shape


def test_compiled_cache_reused(pipe, scene):
    img, box = scene
    pipe.edit(img, box, "one", num_inference_steps=2)
    n = len(pipe._compiled)
    pipe.edit(img, box, "two", num_inference_steps=2)
    assert len(pipe._compiled) == n


# ---------------------------------------------------------------------------
# Encoder-reuse grouping: eager-Python mirror of the scan super-body
# ---------------------------------------------------------------------------


def _eager_reuse_mirror(pipe, num_steps, sampler, guidance, k,
                        ctx, null_ctx, mask_lat, masked_latents, latents):
    """Plain Python re-implementation of _device_loop's encoder-reuse
    structure — full forward at group heads, decoder-only over the cached
    (bottom, skips) inside a group, full forwards for the remainder steps —
    with NO lax.scan and NO grouped arrays.  The sampler step fns are the
    already-pinned primitives (tests/test_schedulers.py,
    tests/test_composed_parity.py); what this mirror checks is the
    scan-super-body CONTROL FLOW: grouping, cache threading, and the
    dpmpp multistep carry across group boundaries."""
    from diffute_tpu.diffusion.schedules import (
        ddim_step,
        ddim_timesteps,
        dpmpp_2m_step,
    )

    unet, variables = pipe.unet, {"params": pipe.params["unet"]}
    use_cfg = guidance > 1.0
    ts = ddim_timesteps(pipe.schedule, num_steps)
    prevs = list(ts[1:]) + [-1]

    ctx_kv = unet.apply(variables, ctx, method=unet.cross_attention_kv)
    if use_cfg:
        null_kv = unet.apply(variables, null_ctx,
                             method=unet.cross_attention_kv)
        ctx_all = jnp.concatenate([ctx, null_ctx], axis=0)
        kv_all = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), ctx_kv, null_kv)
        mask_all = jnp.concatenate([mask_lat, mask_lat], axis=0)
        masked_all = jnp.concatenate([masked_latents, masked_latents], axis=0)
    else:
        ctx_all, kv_all = ctx, ctx_kv
        mask_all, masked_all = mask_lat, masked_latents

    n_super = num_steps // k
    prev_x0, t_last = jnp.zeros_like(latents), jnp.asarray(-1, jnp.int32)
    cache = None
    for i in range(num_steps):
        t = jnp.asarray(int(ts[i]))
        prev_t = jnp.asarray(int(prevs[i]))
        in_scan = i < n_super * k
        full = (not in_scan) or (i % k == 0)
        x = jnp.concatenate([latents, latents], axis=0) if use_cfg else latents
        if full:
            temb = unet.apply(variables, t, x.shape[0],
                              method=unet.time_embed)
            x_in = jnp.concatenate([x, mask_all, masked_all], axis=-1)
            bottom, skips = unet.apply(variables, x_in, temb, ctx_all, kv_all,
                                       method=unet.encode)
            cache = (bottom, tuple(skips)) if in_scan else None
            eps = unet.apply(variables, bottom, skips, temb, ctx_all, kv_all,
                             method=unet.decode)
        else:
            bottom, skips = cache
            temb = unet.apply(variables, t, bottom.shape[0],
                              method=unet.time_embed)
            eps = unet.apply(variables, bottom, list(skips), temb, ctx_all,
                             kv_all, method=unet.decode)
        if use_cfg:
            eps_c, eps_u = jnp.split(eps, 2, axis=0)
            eps = eps_u + guidance * (eps_c - eps_u)
        if sampler == "dpmpp":
            latents, x0 = dpmpp_2m_step(pipe.schedule, eps, t, prev_t, t_last,
                                        latents, prev_x0)
            prev_x0, t_last = x0, t
        else:
            latents = ddim_step(pipe.schedule, eps, t, prev_t, latents)
    return latents


@pytest.mark.parametrize("sampler,num_steps,k,guidance", [
    ("ddim", 7, 2, 1.0),    # 3 super-steps + 1 remainder full step
    ("ddim", 7, 3, 1.0),    # 2 super-steps + 1 remainder
    ("dpmpp", 7, 2, 1.0),   # multistep carry crosses group boundaries
    ("dpmpp", 7, 3, 1.0),
    ("dpmpp", 6, 2, 2.5),   # reuse + CFG batch-2B, no remainder
])
def test_encoder_reuse_scan_matches_eager_mirror(pipe, sampler, num_steps, k,
                                                 guidance):
    import functools

    from diffute_tpu.text import (
        render_glyph,
        trocr_preprocess_host,
    )

    cfg = pipe.config
    res = cfg.edit.resolution
    rng = np.random.RandomState(5)
    image = rng.randint(0, 256, (res, res, 3), np.uint8)
    from diffute_tpu.pipeline.regions import generate_mask, make_masked_image

    mask = generate_mask((res, res), np.int32([8, 12, 24, 20]))
    masked = make_masked_image(image, mask)
    glyph = trocr_preprocess_host([render_glyph("Hi", cfg.glyph)], cfg.trocr)
    null_in = (jnp.asarray(trocr_preprocess_host(
        [render_glyph("", cfg.glyph)], cfg.trocr)) if guidance > 1.0
        else jnp.zeros((1, 1, 1, 3), jnp.uint8))

    pipe._get_compiled(num_steps, sampler, guidance, False, k)
    prep, loop, _ = pipe._stages[(num_steps, sampler, guidance, False, k)]
    *prepped, k_loop = prep(pipe.params, jnp.zeros((1, 1, 1, 3), jnp.uint8),
                            jnp.asarray(mask[None]), jnp.asarray(masked[None]),
                            jnp.asarray(glyph), null_in, np.int32(0))
    lat_scan = np.asarray(loop(pipe.params["unet"], *prepped, k_loop))

    ctx, null_ctx, mask_lat, masked_latents, _, latents = prepped
    lat_eager = np.asarray(_eager_reuse_mirror(
        pipe, num_steps, sampler, guidance, k,
        ctx, null_ctx, mask_lat, masked_latents, latents))

    scale = max(1.0, float(np.abs(lat_eager).max()))
    err = float(np.abs(lat_scan - lat_eager).max())
    assert err <= 1e-4 * scale, f"max|err| {err:.2e} vs scale {scale:.2f}"
