"""OCR verifier trainer: TrOCR encoder + char-level decoder, supervised.

The reference relies on a PRETRAINED TrOCR for both the glyph-conditioning
encoder (train_diffute_v1.py:631) and the sketched OCR verification of edited
regions (app.ipynb:843-847).  In the zero-egress environment those weights do
not exist, so this trainer produces the equivalent: a seq2seq
(ViT encoder -> causal char decoder) trained on rendered glyphs
(io.dataset.SyntheticGlyphOCRDataset) with teacher-forcing cross-entropy.
The trained encoder then plays TrOCR's conditioning role in stage-2 UNet
training, and encoder+decoder together are the eval CLI's verifier — making
``ocr_text_match`` a real read-the-edited-text accuracy instead of a
random-feature proxy.

Same mesh/jit/scan structure as the other trainers (unet_train.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffute_tpu.config import DiffUTEConfig
from diffute_tpu.models import TrOCREncoder
from diffute_tpu.models.trocr_decoder import TrOCRDecoder, TrOCRDecoderConfig
from diffute_tpu.parallel import make_mesh, shard_batch
from diffute_tpu.text import trocr_normalize
from diffute_tpu.train.optim import build_optimizer
from diffute_tpu.train.state import TrainState
from diffute_tpu.train.unet_train import make_multi_step, resolve_donation


def make_ocr_train_step(config: DiffUTEConfig, dcfg: TrOCRDecoderConfig, tx):
    """Batch layout: glyph_pixels (B, S, S, 3) uint8, target_ids (B, L) int32
    (char ids + EOS + PAD padding, diffute_tpu.text.CharTokenizer)."""
    encoder = TrOCREncoder(config.trocr)
    decoder = TrOCRDecoder(dcfg)

    def loss_fn(params, batch):
        enc = encoder.apply({"params": params["encoder"]},
                            trocr_normalize(batch["glyph_pixels"]))
        ids = batch["target_ids"]
        # teacher forcing: [start] + ids[:-1] -> predict ids
        inputs = jnp.concatenate(
            [jnp.full((ids.shape[0], 1), dcfg.decoder_start_token_id,
                      jnp.int32), ids[:, :-1]], axis=1)
        logits = decoder.apply({"params": params["decoder"]}, inputs, enc)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(logp, ids[..., None], axis=-1)[..., 0]
        mask = (ids != dcfg.pad_token_id).astype(jnp.float32)
        loss = -(picked * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        acc = ((jnp.argmax(logits, -1) == ids) * mask).sum() / jnp.maximum(
            mask.sum(), 1.0)
        return loss, acc

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, frozen, batch, rng):
        del frozen, rng  # signature-compatible with make_multi_step users
        (loss, acc), grads = grad_fn(state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1, ema=None)
        return new_state, {"loss": loss, "token_accuracy": acc,
                           "grad_norm": optax.global_norm(grads)}

    return train_step


class OCRTrainer:
    """Host-side orchestration mirroring UNetTrainer/VAETrainer."""

    def __init__(self, config: DiffUTEConfig, dcfg: TrOCRDecoderConfig,
                 params: Dict, mesh=None, total_steps: Optional[int] = None):
        self.config = config
        self.dcfg = dcfg
        self.mesh = mesh or make_mesh(config.train.dp_size)
        total = total_steps or config.train.max_train_steps or 10_000
        tbs = config.train.train_batch_size * self.mesh.devices.size
        self.tx = build_optimizer(config.train.optimizer, total, tbs)
        self.state = TrainState.create(params, self.tx)
        donate = (0,) if resolve_donation(config) else ()
        step_fn = make_ocr_train_step(config, dcfg, self.tx)
        self._step = jax.jit(step_fn, donate_argnums=donate)
        self.steps_per_call = config.train.steps_per_call
        if self.steps_per_call > 1:
            self._multi = jax.jit(
                make_multi_step(step_fn, self.steps_per_call),
                donate_argnums=donate)

    def step(self, batch, rng=None) -> Dict[str, float]:
        if not all(isinstance(x, jax.Array)
                   for x in jax.tree_util.tree_leaves(batch)):
            batch = shard_batch(self.mesh, batch)
        self.state, metrics = self._step(self.state, None, batch, rng)
        return metrics

    def run_steps(self, batches, rng=None) -> Dict[str, np.ndarray]:
        if not all(isinstance(x, jax.Array)
                   for x in jax.tree_util.tree_leaves(batches)):
            batches = shard_batch(self.mesh, batches, batch_axis=1)
        self.state, metrics = self._multi(self.state, None, batches, rng)
        return metrics
