"""Int8 weight-only serving quantization (ops/quant.py, models QuantDense).

Parity target: the quantized UNet must track the float model within
per-channel-int8 tolerance end to end (the analogue of the reference's
opt-in 8-bit memory levers, train_diffute_v1.py:244-248)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffute_tpu.config import tiny_test_config
from diffute_tpu.ops.quant import (
    convert_dense_params_to_int8,
    dequantize,
    quant_matmul,
    quantize_per_channel,
)


def test_quantize_round_trip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(96, 128)).astype(np.float32)
    q, s = quantize_per_channel(jnp.asarray(w))
    assert q.dtype == jnp.int8 and s.shape == (128,)
    w2 = dequantize(q, s)
    # symmetric per-channel RTN: |err| <= scale/2 per element
    err = np.abs(np.asarray(w2) - w)
    assert (err <= np.asarray(s)[None, :] / 2 + 1e-7).all()


def test_quant_matmul_matches_dequant_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, 7, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 128)).astype(np.float32))
    q, s = quantize_per_channel(w)
    ref = x @ dequantize(q, s)
    out = quant_matmul(x, q, s)
    assert out.shape == (5, 7, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_zero_column_weights_quantize_safely():
    w = jnp.zeros((32, 128), jnp.float32)
    q, s = quantize_per_channel(w)
    assert np.asarray(s).all() > 0  # no div-by-zero scales
    np.testing.assert_array_equal(np.asarray(dequantize(q, s)), 0.0)


def _unet_inputs(cfg, key):
    lat = cfg.edit.resolution // cfg.vae.scale_factor
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, lat, lat, cfg.unet.in_channels))
    t = jnp.array([3, 500], jnp.int32)
    ctx = jax.random.normal(k2, (2, cfg.trocr.seq_len,
                                 cfg.unet.cross_attention_dim))
    return x, t, ctx


def test_blockwise_quant_round_trip():
    from diffute_tpu.ops.quant import dequantize_blockwise, quantize_blockwise

    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 5, 7)).astype(np.float32)  # 105 elems, pads to 256
    q, s = quantize_blockwise(jnp.asarray(x), block=256)
    assert q.shape == (1, 256) and q.dtype == jnp.int8
    back = np.asarray(dequantize_blockwise(q, s, x.shape))
    assert back.shape == x.shape
    assert np.abs(back - x).max() <= np.abs(x).max() / 127.0 * 0.51 + 1e-7


def test_adam_int8_tracks_adam():
    """The int8-state Adam must optimize a toy problem essentially as well
    as float Adam (the bnb AdamW8bit analogue, reference
    train_diffute_v1.py:244-248)."""
    import optax

    from diffute_tpu.train.optim import scale_by_adam_int8

    def loss_fn(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    def run(tx):
        params = {"w": jnp.zeros((17, 9)), "b": jnp.zeros((5,))}
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            g = jax.grad(loss_fn)(params)
            upd, state = tx.update(g, state, params)
            return optax.apply_updates(params, upd), state

        for _ in range(200):
            params, state = step(params, state)
        return params, state

    lr = optax.scale(-0.05)
    p8, s8 = run(optax.chain(scale_by_adam_int8(), lr))
    pf, _ = run(optax.chain(optax.scale_by_adam(), lr))
    assert float(loss_fn(p8)) < 1e-2, f"int8 adam failed: {float(loss_fn(p8))}"
    # close to the float-Adam trajectory endpoint
    assert abs(float(loss_fn(p8)) - float(loss_fn(pf))) < 1e-2
    # and the moments really are int8
    leaves = jax.tree_util.tree_leaves(s8[0]["mu"])
    assert any(x.dtype == jnp.int8 for x in leaves)


def test_build_optimizer_adamw8bit():
    from diffute_tpu.config import OptimizerConfig
    from diffute_tpu.train.optim import build_optimizer

    tx = build_optimizer(OptimizerConfig(name="adamw8bit"), total_steps=100)
    params = {"k": jnp.ones((8, 8))}
    state = tx.init(params)
    g = {"k": jnp.full((8, 8), 0.1)}
    upd, _ = tx.update(g, state, params)
    assert jnp.isfinite(upd["k"]).all()


def test_int8_unet_parity():
    """Quantized UNet output tracks float within int8-weight tolerance."""
    from diffute_tpu.models import UNet2DCondition
    from diffute_tpu.utils.params import init_unet_params

    cfg = tiny_test_config()
    params = init_unet_params(cfg, jax.random.PRNGKey(0))
    x, t, ctx = _unet_inputs(cfg, jax.random.PRNGKey(1))

    unet_f = UNet2DCondition(cfg.unet)
    ref = unet_f.apply({"params": params}, x, t, ctx)

    qcfg = dataclasses.replace(cfg.unet, use_int8_weights=True)
    unet_q = UNet2DCondition(qcfg)
    target = jax.eval_shape(unet_q.init, jax.random.PRNGKey(0), x, t,
                            ctx)["params"]
    qparams = convert_dense_params_to_int8(params, target)
    # structure matches the quantized module exactly
    assert (jax.tree_util.tree_structure(qparams)
            == jax.tree_util.tree_structure(
                jax.tree_util.tree_map(lambda s: 0, target)))
    out = unet_q.apply({"params": qparams}, x, t, ctx)

    ref_n, out_n = np.asarray(ref), np.asarray(out)
    denom = np.abs(ref_n).mean()
    rel = np.abs(out_n - ref_n).mean() / denom
    assert rel < 0.05, f"int8 UNet mean relative error {rel:.4f}"
    cos = (ref_n * out_n).sum() / (np.linalg.norm(ref_n)
                                   * np.linalg.norm(out_n))
    assert cos > 0.999, f"cosine {cos}"


def test_int8_pipeline_edit_runs_and_matches():
    """End-to-end: the pipeline converts float params on load and the int8
    edit stays close to the float edit (uint8 image space)."""
    from diffute_tpu.pipeline import DiffUTEPipeline
    from diffute_tpu.utils import init_pipeline_params

    cfg = tiny_test_config()
    params = init_pipeline_params(cfg)
    img = np.random.RandomState(0).randint(0, 255, (48, 64, 3), np.uint8)
    box = (10, 10, 30, 20)

    ref, _ = DiffUTEPipeline(cfg, params).edit(img, box, "Hi",
                                               num_inference_steps=3)
    qcfg = dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, use_int8_weights=True))
    out, _ = DiffUTEPipeline(qcfg, params).edit(img, box, "Hi",
                                                num_inference_steps=3)
    assert out.shape == ref.shape and out.dtype == np.uint8
    # identical outside the crop window; close inside
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.mean() < 8.0, f"int8 edit diverged: mean abs {diff.mean()}"
