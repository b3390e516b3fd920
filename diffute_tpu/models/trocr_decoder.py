"""TrOCR text decoder + greedy decoding (eval-time OCR verification).

The reference loads the FULL TrOCR model alongside the encoder and sketches
an OCR round-trip check on the edited region, left commented out
(app.ipynb:548, 843-847).  Here it is a working evaluation utility: decode
the edited region back to text and compare with the requested string.

Architecture: the TrOCR causal decoder (BART-style post-LN), matching HF's
``TrOCRForCausalLM``: scaled word embeddings + learned positional embeddings
with offset 2, optional embedding LayerNorm, N layers of
[causal self-attn -> LN -> cross-attn over the 577 encoder tokens -> LN ->
gelu FFN -> LN], and a bias-free output projection.  Numeric parity vs the
torch implementation is pinned in tests/test_trocr_decoder.py.

Greedy decoding runs as ONE jit'd ``lax.scan`` over the output positions,
re-running the (causal) decoder on the fixed-length buffer each step — an
O(L^2) eval-only scheme that avoids KV-cache plumbing and host round-trips
for the short (<=32 token) strings DiffUTE edits.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffute_tpu.config import TrOCRConfig


@dataclasses.dataclass(frozen=True)
class TrOCRDecoderConfig:
    """Defaults = microsoft/trocr-large-printed decoder."""

    vocab_size: int = 50265
    hidden_size: int = 1024
    decoder_layers: int = 12
    decoder_attention_heads: int = 16
    decoder_ffn_dim: int = 4096
    max_position_embeddings: int = 512
    scale_embedding: bool = True
    layernorm_embedding: bool = True
    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2
    decoder_start_token_id: int = 2
    dtype: jnp.dtype = jnp.float32


class _DecAttention(nn.Module):
    config: TrOCRDecoderConfig
    causal: bool

    @nn.compact
    def __call__(self, x, kv, mask=None):
        cfg = self.config
        heads = cfg.decoder_attention_heads
        d = cfg.hidden_size // heads
        q = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="k_proj")(kv)
        v = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="v_proj")(kv)
        b, s, _ = q.shape
        t = k.shape[1]
        q = q.reshape(b, s, heads, d)
        k = k.reshape(b, t, heads, d)
        v = v.reshape(b, t, heads, d)
        logits = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        if self.causal:
            causal = jnp.tril(jnp.ones((s, t), bool))
            logits = jnp.where(causal[None, None], logits, -1e30)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhst,bthd->bshd", w, v).reshape(b, s, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="out_proj")(out)


class _DecoderLayer(nn.Module):
    config: TrOCRDecoderConfig

    @nn.compact
    def __call__(self, x, enc):
        cfg = self.config
        x = x + _DecAttention(cfg, causal=True, name="self_attn")(x, x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="self_attn_layer_norm")(x)
        x = x + _DecAttention(cfg, causal=False, name="encoder_attn")(x, enc)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="encoder_attn_layer_norm")(x)
        h = nn.Dense(cfg.decoder_ffn_dim, dtype=cfg.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(h)
        x = x + h
        return nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="final_layer_norm")(x)


class TrOCRDecoder(nn.Module):
    config: TrOCRDecoderConfig = TrOCRDecoderConfig()

    @nn.compact
    def __call__(self, input_ids: jax.Array, encoder_hidden_states: jax.Array
                 ) -> jax.Array:
        """(B, L) int32 tokens + (B, 577, H) encoder states -> (B, L, vocab)."""
        cfg = self.config
        embed = self.param("embed_tokens", nn.initializers.normal(0.02),
                           (cfg.vocab_size, cfg.hidden_size), cfg.dtype)
        scale = math.sqrt(cfg.hidden_size) if cfg.scale_embedding else 1.0
        x = jnp.take(embed, input_ids, axis=0) * scale
        # learned positions with TrOCR's +2 offset
        pos_table = self.param("embed_positions",
                               nn.initializers.normal(0.02),
                               (cfg.max_position_embeddings + 2,
                                cfg.hidden_size), cfg.dtype)
        L = input_ids.shape[1]
        x = x + pos_table[2 : 2 + L][None]
        if cfg.layernorm_embedding:
            x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layernorm_embedding")(x)
        for i in range(cfg.decoder_layers):
            x = _DecoderLayer(cfg, name=f"layers_{i}")(x, encoder_hidden_states)
        logits = jnp.einsum("blh,vh->blv", x, embed.astype(x.dtype))
        return logits


def greedy_decode(
    decoder: TrOCRDecoder,
    params,
    encoder_hidden_states: jax.Array,   # (B, 577, H)
    max_len: int = 32,
) -> jax.Array:
    """Greedy generation -> (B, max_len) int32 token ids (pad-filled after
    EOS).  Tied output projection (HF ties output_projection to
    embed_tokens)."""
    cfg = decoder.config
    B = encoder_hidden_states.shape[0]
    ids0 = jnp.full((B, max_len + 1), cfg.pad_token_id, jnp.int32)
    ids0 = ids0.at[:, 0].set(cfg.decoder_start_token_id)
    done0 = jnp.zeros((B,), bool)

    def body(carry, i):
        ids, done = carry
        logits = decoder.apply({"params": params}, ids[:, :-1],
                               encoder_hidden_states)
        nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        ids = ids.at[:, i + 1].set(nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (ids, done), None

    (ids, _), _ = jax.lax.scan(body, (ids0, done0), jnp.arange(max_len))
    return ids[:, 1:]


def import_trocr_decoder_state_dict(state_dict) -> dict:
    """HF TrOCRForCausalLM state_dict (numpy) -> flax params tree."""
    import re

    import numpy as np

    from diffute_tpu.compat.hf_import import _convert_tensor, _set_path

    params: dict = {}
    for key, value in state_dict.items():
        k = key
        for prefix in ("decoder.model.decoder.", "model.decoder.", "decoder."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        if k.startswith("output_projection"):
            continue  # tied to embed_tokens
        value = np.asarray(value)
        if k == "embed_tokens.weight":
            _set_path(params, ("embed_tokens",), value)
            continue
        if k == "embed_positions.weight":
            _set_path(params, ("embed_positions",), value)
            continue
        k = re.sub(r"^layers\.(\d+)\.", r"layers_\1.", k)
        leaf, arr = _convert_tensor(key, value)
        parts = k.split(".")
        if parts[-1] in ("weight", "bias"):
            parts[-1] = leaf
        _set_path(params, tuple(parts), arr)
    return params
