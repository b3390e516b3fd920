"""Trainer tests on the 8-device virtual CPU mesh: data-parallel UNet/VAE
steps, gradient accumulation, EMA, checkpoint save/restore/export."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffute_tpu.config import tiny_test_config
from diffute_tpu.train import UNetTrainer, VAETrainer
from diffute_tpu.train.checkpoint import (
    export_diffusers_layout,
    diffusers_unet_config_json,
    diffusers_vae_config_json,
    latest_checkpoint,
    resolve_resume,
    restore_checkpoint,
    save_checkpoint,
)
from diffute_tpu.utils import init_pipeline_params


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture(scope="module")
def params(cfg):
    return init_pipeline_params(cfg)


def _unet_batch(cfg, n, accum=None):
    res = cfg.edit.resolution
    g = cfg.trocr.image_size
    rng = np.random.RandomState(0)
    shape = lambda *s: ((accum, n // accum) + s) if accum else ((n,) + s)
    return {
        "pixel_values": rng.randn(*shape(res, res, 3)).astype(np.float32).clip(-1, 1),
        "masks": (rng.rand(*shape(res, res)) > 0.8).astype(np.float32),
        "masked_images": rng.randn(*shape(res, res, 3)).astype(np.float32).clip(-1, 1),
        "glyph_pixels": rng.randint(0, 255, shape(g, g, 3), dtype=np.uint8),
    }


def test_unet_trainer_dp8(cfg, params):
    assert len(jax.devices()) == 8
    tc = dataclasses.replace(cfg.train, use_ema=True)
    c = dataclasses.replace(cfg, train=tc)
    trainer = UNetTrainer(c, params["unet"],
                          {"vae": params["vae"], "trocr": params["trocr"]},
                          total_steps=10)
    losses = []
    for i in range(2):
        m = trainer.step(_unet_batch(cfg, 8), jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
        assert np.isfinite(float(m["grad_norm"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(trainer.state.step) == 2
    assert int(trainer.state.ema.step) == 2
    # EMA params differ from live params but stay close
    lp = jax.tree_util.tree_leaves(trainer.state.params)[0]
    ep = jax.tree_util.tree_leaves(trainer.state.ema.params)[0]
    assert not np.allclose(np.asarray(lp), np.asarray(ep))


def test_unet_trainer_grad_accum(cfg, params):
    tc = dataclasses.replace(cfg.train, gradient_accumulation_steps=2)
    c = dataclasses.replace(cfg, train=tc)
    trainer = UNetTrainer(c, params["unet"],
                          {"vae": params["vae"], "trocr": params["trocr"]},
                          total_steps=10)
    # (accum=2, micro=8): micro batch must divide the 8-device mesh
    m = trainer.step(_unet_batch(cfg, 16, accum=2), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_unet_trainer_bf16(cfg, params):
    tc = dataclasses.replace(cfg.train, mixed_precision="bf16")
    c = dataclasses.replace(cfg, train=tc)
    trainer = UNetTrainer(c, params["unet"],
                          {"vae": params["vae"], "trocr": params["trocr"]},
                          total_steps=10)
    m = trainer.step(_unet_batch(cfg, 8), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # master params stay fp32
    assert jax.tree_util.tree_leaves(trainer.state.params)[0].dtype == jnp.float32


def _device0_resident_bytes(tree):
    """Bytes of ``tree`` actually resident on device 0 (per-device memory)."""
    dev0 = jax.devices()[0]
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        for sh in getattr(leaf, "addressable_shards", []):
            if sh.device == dev0:
                total += sh.data.nbytes
    return total


@pytest.mark.slow
def test_unet_trainer_zero1_sharded_opt_state(cfg, params):
    tc = dataclasses.replace(cfg.train, shard_optimizer_states=True)
    c = dataclasses.replace(cfg, train=tc)
    trainer = UNetTrainer(c, params["unet"],
                          {"vae": params["vae"], "trocr": params["trocr"]},
                          total_steps=10)
    baseline = UNetTrainer(cfg, params["unet"],
                           {"vae": params["vae"], "trocr": params["trocr"]},
                           total_steps=10)
    batch = _unet_batch(cfg, 8)
    m = trainer.step(batch, jax.random.PRNGKey(0))
    mb = baseline.step(batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # 1) metadata: some adam moment leaf is sharded over the data axis
    specs = [x.sharding.spec for x in
             jax.tree_util.tree_leaves(trainer.state.opt_state)
             if hasattr(x, "sharding")]
    assert any("data" in str(s) for s in specs), specs
    # 2) memory: per-device optimizer state actually shrinks (8-way mesh;
    #    most moment bytes shard 1/8, a few small leaves stay replicated)
    z1 = _device0_resident_bytes(trainer.state.opt_state)
    rep = _device0_resident_bytes(baseline.state.opt_state)
    assert z1 < 0.5 * rep, (z1, rep)
    # 3) math: the partitioned update computes the SAME step as the
    #    replicated one
    assert np.isclose(float(m["loss"]), float(mb["loss"]), rtol=1e-5)
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(baseline.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6)


def test_vae_trainer_loss_decreases(cfg, params):
    trainer = VAETrainer(cfg, params["vae"], total_steps=50)
    res = cfg.edit.resolution
    batch = {"pixel_values": np.random.RandomState(0)
             .randn(8, res, res, 3).astype(np.float32).clip(-1, 1)}
    first = None
    for i in range(5):
        m = trainer.step(batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first  # same batch -> recon improves


def test_unet_trainer_adafactor(cfg, params):
    oc = dataclasses.replace(cfg.train.optimizer, name="adafactor")
    c = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, optimizer=oc))
    trainer = UNetTrainer(c, params["unet"],
                          {"vae": params["vae"], "trocr": params["trocr"]},
                          total_steps=10)
    m = trainer.step(_unet_batch(cfg, 8), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # factored stats: total opt-state size far below a full second moment
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(trainer.state.params))
    n_opt = sum(x.size for x in jax.tree_util.tree_leaves(trainer.state.opt_state)
                if hasattr(x, "size"))
    assert n_opt < 1.2 * n_params, (n_opt, n_params)


def test_unet_learning_signal(cfg, params):
    # Overfit one fixed batch with fixed noise RNG: loss must drop clearly,
    # proving gradients flow through the 9-channel conditioning path.
    tc = dataclasses.replace(cfg.train)
    oc = dataclasses.replace(tc.optimizer, learning_rate=1e-3)
    c = dataclasses.replace(cfg, train=dataclasses.replace(tc, optimizer=oc))
    trainer = UNetTrainer(c, params["unet"],
                          {"vae": params["vae"], "trocr": params["trocr"]},
                          total_steps=60)
    batch = _unet_batch(cfg, 8)
    losses = []
    for i in range(30):
        m = trainer.step(batch, jax.random.PRNGKey(0))  # same noise each step
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.5 * losses[0], losses[::10]


def test_checkpoint_roundtrip(tmp_path, cfg, params):
    trainer = VAETrainer(cfg, params["vae"], total_steps=10)
    res = cfg.edit.resolution
    batch = {"pixel_values": np.zeros((8, res, res, 3), np.float32)}
    trainer.step(batch, jax.random.PRNGKey(0))
    out = str(tmp_path / "ckpts")
    save_checkpoint(out, 1, trainer.state)
    save_checkpoint(out, 2, trainer.state, total_limit=1)
    assert latest_checkpoint(out).endswith("checkpoint-2")
    assert resolve_resume(out, "latest").endswith("checkpoint-2")
    restored = restore_checkpoint(latest_checkpoint(out), trainer.state)
    a = jax.tree_util.tree_leaves(trainer.state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1


def test_diffusers_layout_export(tmp_path, cfg, params):
    path = str(tmp_path / "export")
    export_diffusers_layout(
        path,
        unet_params=params["unet"],
        vae_params=params["vae"],
        unet_config=diffusers_unet_config_json(cfg.unet),
        vae_config=diffusers_vae_config_json(cfg.vae),
    )
    for sub in ("unet", "vae"):
        assert os.path.exists(os.path.join(path, sub,
                                           "diffusion_pytorch_model.safetensors"))
        assert os.path.exists(os.path.join(path, sub, "config.json"))
    from safetensors.numpy import load_file
    sd = load_file(os.path.join(path, "unet",
                                "diffusion_pytorch_model.safetensors"))
    assert "conv_in.weight" in sd
    assert sd["conv_in.weight"].shape[1] == 9  # OIHW, inpaint channels


def test_async_checkpoint_manager(tmp_path, cfg, params):
    """Async save survives state donation (the next trainer.step invalidates
    the saved buffers), rotates, exports in the background, and restores."""
    from diffute_tpu.train.checkpoint import AsyncCheckpointManager

    trainer = VAETrainer(cfg, params["vae"], total_steps=10)
    res = cfg.edit.resolution
    batch = {"pixel_values": np.zeros((8, res, res, 3), np.float32)}
    trainer.step(batch, jax.random.PRNGKey(0))
    out = str(tmp_path / "ckpts")
    mgr = AsyncCheckpointManager(out, total_limit=1)
    exports = []

    def export(path, host_params):
        # runs on a background thread with HOST arrays
        leaf = jax.tree_util.tree_leaves(host_params)[0]
        assert isinstance(leaf, np.ndarray)
        exports.append(path)

    state1 = trainer.state
    snap = np.asarray(jax.tree_util.tree_leaves(state1.params)[0]).copy()
    mgr.save(1, state1, export_fn=export, export_args=state1.params)
    # donate state1's buffers while the save may still be in flight
    trainer.step(batch, jax.random.PRNGKey(1))
    mgr.save(2, trainer.state, export_fn=export,
             export_args=trainer.state.params)
    mgr.close()
    assert len(exports) == 2
    assert latest_checkpoint(out).endswith("checkpoint-2")
    # rotation kept only the newest
    from diffute_tpu.train.checkpoint import list_checkpoints

    assert list_checkpoints(out) == ["checkpoint-2"]
    restored = restore_checkpoint(latest_checkpoint(out), trainer.state)
    assert int(restored.step) == 2
    # step-2 params differ from the step-1 snapshot (training moved on)
    b = np.asarray(jax.tree_util.tree_leaves(restored.params)[0])
    assert b.shape == snap.shape


def test_rotation_never_deletes_the_only_finalized_checkpoint(tmp_path, cfg,
                                                                params):
    """With total_limit=1 the previous finalized checkpoint must survive
    until the NEXT save is durable (ADVICE r2): a crash during the async
    save window must always leave one restorable checkpoint."""
    from diffute_tpu.train.checkpoint import (AsyncCheckpointManager,
                                              list_checkpoints)

    trainer = VAETrainer(cfg, params["vae"], total_steps=10)
    out = str(tmp_path / "ckpts")
    mgr = AsyncCheckpointManager(out, total_limit=1)
    mgr.save(1, trainer.state)
    mgr._ckptr.wait_until_finished()
    assert list_checkpoints(out) == ["checkpoint-1"]
    # second save: rotation runs synchronously inside save() BEFORE the new
    # async write -- checkpoint-1 must still be on disk at that point
    mgr.save(2, trainer.state)
    assert "checkpoint-1" in list_checkpoints(out)
    mgr.close()  # final trim once checkpoint-2 is durable
    assert list_checkpoints(out) == ["checkpoint-2"]


def test_crash_leftover_checkpoint_is_not_latest(tmp_path, cfg, params):
    """A kill during an async save leaves checkpoint-N with only
    ``state.orbax-checkpoint-tmp``.  latest/resolve_resume must skip it,
    rotation must sweep it without counting it toward the keep budget, and
    a re-save at the same step must succeed (observed in the round-3
    convergence chain restart)."""
    from diffute_tpu.train.checkpoint import (AsyncCheckpointManager,
                                              list_checkpoints)

    trainer = VAETrainer(cfg, params["vae"], total_steps=10)
    out = str(tmp_path / "ckpts")
    mgr = AsyncCheckpointManager(out, total_limit=1)
    mgr.save(1, trainer.state)
    mgr.wait()
    # simulate a crash mid-save at step 2: tmp dir only, no finalized state
    crash = os.path.join(out, "checkpoint-2", "state.orbax-checkpoint-tmp")
    os.makedirs(crash)
    assert latest_checkpoint(out).endswith("checkpoint-1")
    assert resolve_resume(out, "latest").endswith("checkpoint-1")
    assert list_checkpoints(out, finalized_only=True) == ["checkpoint-1"]
    # a fresh save at the SAME step replaces the garbage...
    mgr.save(2, trainer.state)
    mgr.close()
    # ...and rotation kept the newest finalized checkpoint, not the leftover
    assert list_checkpoints(out) == ["checkpoint-2"]
    assert latest_checkpoint(out).endswith("checkpoint-2")
    restored = restore_checkpoint(latest_checkpoint(out), trainer.state)
    assert int(restored.step) == 0  # same state saved twice in this test


@pytest.mark.slow
def test_multi_step_scan_matches_sequential(cfg, params):
    """steps_per_call=K in one lax.scan executable must produce the same
    final params as K sequential step() calls with the same batches/keys."""
    from diffute_tpu.train.unet_train import make_multi_step  # noqa: F401

    K = 3
    tc = dataclasses.replace(cfg.train, steps_per_call=K)
    c = dataclasses.replace(cfg, train=tc)
    multi = UNetTrainer(c, params["unet"],
                        {"vae": params["vae"], "trocr": params["trocr"]},
                        total_steps=10)
    seq = UNetTrainer(cfg, params["unet"],
                      {"vae": params["vae"], "trocr": params["trocr"]},
                      total_steps=10)
    batches = [_unet_batch(cfg, 8) for _ in range(K)]
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    rng = jax.random.PRNGKey(42)
    m = multi.run_steps(stacked, rng)
    assert m["loss"].shape == (K,)
    keys = jax.random.split(rng, K)
    for b, k in zip(batches, keys):
        ms = seq.step(b, k)
    assert int(multi.state.step) == K == int(seq.state.step)
    np.testing.assert_allclose(float(m["loss"][-1]), float(ms["loss"]),
                               rtol=1e-5)
    a = jax.tree_util.tree_leaves(multi.state.params)
    b = jax.tree_util.tree_leaves(seq.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-4,
                                   atol=2e-6)


def test_vae_multi_step_scan(cfg, params):
    K = 2
    tc = dataclasses.replace(cfg.train, steps_per_call=K)
    c = dataclasses.replace(cfg, train=tc)
    trainer = VAETrainer(c, params["vae"], total_steps=10)
    res = cfg.edit.resolution
    batches = {"pixel_values": np.random.RandomState(0)
               .randn(K, 8, res, res, 3).astype(np.float32).clip(-1, 1)}
    m = trainer.run_steps(batches, jax.random.PRNGKey(0))
    assert m["loss"].shape == (K,)
    assert np.isfinite(np.asarray(m["loss"])).all()
    assert int(trainer.state.step) == K
