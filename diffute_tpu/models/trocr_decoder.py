"""TrOCR text decoder + greedy decoding (eval-time OCR verification).

The reference loads the FULL TrOCR model alongside the encoder and sketches
an OCR round-trip check on the edited region, left commented out
(app.ipynb:548, 843-847).  Here it is a working evaluation utility: decode
the edited region back to text and compare with the requested string.

Architecture: the TrOCR causal decoder (BART-style post-LN), matching HF's
``TrOCRForCausalLM``: scaled word embeddings + learned positional embeddings
with offset 2, optional embedding LayerNorm, N layers of
[causal self-attn -> LN -> cross-attn over the 577 encoder tokens -> LN ->
gelu FFN -> LN], and a bias-free output projection tied to the embeddings.
Numeric parity vs the torch implementation is pinned in
tests/test_trocr_decoder.py.

Two generation paths, both single jit'd ``lax.scan`` programs:
- :func:`greedy_decode` — re-runs the causal decoder over the fixed-length
  buffer each step (O(L^2), no cache state; simplest correct reference).
- :func:`greedy_decode_cached` — per-layer self-attention KV caches updated
  with one-token decoder steps and precomputed cross-attention K/V (O(L));
  verified token-identical to the uncached path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


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


def small_decoder_config() -> TrOCRDecoderConfig:
    """Char-level decoder matching ``config.small_config()``'s encoder and
    ``text.CharTokenizer``'s vocabulary — the OCR-verifier scale used by the
    on-chip convergence experiments (train/run_ocr.py, eval --model_scale
    small)."""
    from diffute_tpu.text.char_tokenizer import VOCAB_SIZE

    return TrOCRDecoderConfig(
        vocab_size=VOCAB_SIZE, hidden_size=256, decoder_layers=2,
        decoder_attention_heads=4, decoder_ffn_dim=1024,
        max_position_embeddings=128)


class _DecAttention(nn.Module):
    config: TrOCRDecoderConfig
    causal: bool

    def setup(self):
        cfg = self.config
        self.q_proj = nn.Dense(cfg.hidden_size, dtype=cfg.dtype)
        self.k_proj = nn.Dense(cfg.hidden_size, dtype=cfg.dtype)
        self.v_proj = nn.Dense(cfg.hidden_size, dtype=cfg.dtype)
        self.out_proj = nn.Dense(cfg.hidden_size, dtype=cfg.dtype)

    def _split(self, x):
        cfg = self.config
        heads = cfg.decoder_attention_heads
        b, t, _ = x.shape
        return x.reshape(b, t, heads, cfg.hidden_size // heads)

    def kv(self, context):
        """Project (B, T, H*D) context -> cached (k, v) of (B, T, H, D)."""
        return self._split(self.k_proj(context)), self._split(self.v_proj(context))

    def attend(self, q, k, v, mask=None, causal_len: Optional[int] = None):
        d = q.shape[-1]
        logits = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        if causal_len is not None:
            s, t = q.shape[1], k.shape[1]
            causal = jnp.tril(jnp.ones((s, t), bool))
            logits = jnp.where(causal[None, None], logits, -1e30)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhst,bthd->bshd", w, v)
        b, s = out.shape[0], out.shape[1]
        return self.out_proj(out.reshape(b, s, self.config.hidden_size))

    def __call__(self, x, kv_input, mask=None):
        q = self._split(self.q_proj(x))
        k, v = self.kv(kv_input)
        return self.attend(q, k, v, mask=mask,
                           causal_len=x.shape[1] if self.causal else None)

    def step(self, x1, cache, pos):
        """One-token cached self-attention: x1 (B, 1, H*D), cache (k, v) of
        (B, L, H, D) updated at ``pos``; attends over positions <= pos."""
        k_buf, v_buf = cache
        q = self._split(self.q_proj(x1))                     # (B, 1, H, D)
        k1, v1 = self.kv(x1)
        k_buf = jax.lax.dynamic_update_slice_in_dim(k_buf, k1, pos, axis=1)
        v_buf = jax.lax.dynamic_update_slice_in_dim(v_buf, v1, pos, axis=1)
        valid = (jnp.arange(k_buf.shape[1]) <= pos)[None]    # (1, L)
        valid = jnp.broadcast_to(valid, (x1.shape[0], k_buf.shape[1]))
        out = self.attend(q, k_buf, v_buf, mask=valid)
        return out, (k_buf, v_buf)


class _DecoderLayer(nn.Module):
    config: TrOCRDecoderConfig

    def setup(self):
        cfg = self.config
        self.self_attn = _DecAttention(cfg, causal=True)
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype)
        self.encoder_attn = _DecAttention(cfg, causal=False)
        self.encoder_attn_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype)
        self.fc1 = nn.Dense(cfg.decoder_ffn_dim, dtype=cfg.dtype)
        self.fc2 = nn.Dense(cfg.hidden_size, dtype=cfg.dtype)
        self.final_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype)

    def _tail(self, x, attn_out_cross):
        x = self.encoder_attn_layer_norm(x + attn_out_cross)
        h = self.fc2(nn.gelu(self.fc1(x), approximate=False))
        return self.final_layer_norm(x + h)

    def __call__(self, x, enc):
        x = self.self_attn_layer_norm(x + self.self_attn(x, x))
        return self._tail(x, self.encoder_attn(x, enc))

    def cross_kv(self, enc):
        return self.encoder_attn.kv(enc)

    def step(self, x1, self_cache, enc_kv, pos):
        attn, self_cache = self.self_attn.step(x1, self_cache, pos)
        x1 = self.self_attn_layer_norm(x1 + attn)
        q = self.encoder_attn._split(self.encoder_attn.q_proj(x1))
        cross = self.encoder_attn.attend(q, *enc_kv)
        return self._tail(x1, cross), self_cache


class TrOCRDecoder(nn.Module):
    config: TrOCRDecoderConfig = TrOCRDecoderConfig()

    def setup(self):
        cfg = self.config
        self.embed_tokens = self.param("embed_tokens",
                                       nn.initializers.normal(0.02),
                                       (cfg.vocab_size, cfg.hidden_size),
                                       cfg.dtype)
        self.embed_positions = self.param("embed_positions",
                                          nn.initializers.normal(0.02),
                                          (cfg.max_position_embeddings + 2,
                                           cfg.hidden_size), cfg.dtype)
        if cfg.layernorm_embedding:
            self.layernorm_embedding = nn.LayerNorm(epsilon=1e-5,
                                                    dtype=cfg.dtype)
        self.layers = [_DecoderLayer(cfg, name=f"layers_{i}")
                       for i in range(cfg.decoder_layers)]

    def _embed(self, input_ids, pos_offset=0):
        cfg = self.config
        scale = math.sqrt(cfg.hidden_size) if cfg.scale_embedding else 1.0
        x = jnp.take(self.embed_tokens, input_ids, axis=0) * scale
        L = input_ids.shape[1]
        # learned positions with TrOCR's +2 offset
        pos = jax.lax.dynamic_slice_in_dim(self.embed_positions,
                                           2 + pos_offset, L, axis=0)
        x = x + pos[None]
        if cfg.layernorm_embedding:
            x = self.layernorm_embedding(x)
        return x

    def _logits(self, x):
        return jnp.einsum("blh,vh->blv", x, self.embed_tokens.astype(x.dtype))

    def __call__(self, input_ids: jax.Array, encoder_hidden_states: jax.Array
                 ) -> jax.Array:
        """(B, L) int32 tokens + (B, 577, H) encoder states -> (B, L, vocab)."""
        x = self._embed(input_ids)
        for layer in self.layers:
            x = layer(x, encoder_hidden_states)
        return self._logits(x)

    # -- cached decoding ---------------------------------------------------

    def cross_kvs(self, encoder_hidden_states):
        return tuple(l.cross_kv(encoder_hidden_states) for l in self.layers)

    def decode_step(self, token, caches, enc_kvs, pos):
        """token (B, 1) at position ``pos`` -> (logits (B, vocab), caches)."""
        x1 = self._embed(token, pos_offset=pos)
        new_caches = []
        for layer, cache, enc_kv in zip(self.layers, caches, enc_kvs):
            x1, cache = layer.step(x1, cache, enc_kv, pos)
            new_caches.append(cache)
        return self._logits(x1)[:, 0], tuple(new_caches)


def greedy_decode(
    decoder: TrOCRDecoder,
    params,
    encoder_hidden_states: jax.Array,   # (B, 577, H)
    max_len: int = 32,
) -> jax.Array:
    """Greedy generation (uncached reference path) -> (B, max_len) int32
    token ids (pad-filled after EOS)."""
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


def greedy_decode_cached(
    decoder: TrOCRDecoder,
    params,
    encoder_hidden_states: jax.Array,   # (B, 577, H)
    max_len: int = 32,
) -> jax.Array:
    """KV-cached greedy generation — one single-token decoder pass per output
    position (O(L) vs the uncached O(L^2)); token-identical to
    :func:`greedy_decode`."""
    cfg = decoder.config
    B = encoder_hidden_states.shape[0]
    heads = cfg.decoder_attention_heads
    d = cfg.hidden_size // heads

    enc_kvs = decoder.apply({"params": params}, encoder_hidden_states,
                            method=decoder.cross_kvs)
    zeros = jnp.zeros((B, max_len, heads, d),
                      enc_kvs[0][0].dtype)
    caches0 = tuple((zeros, zeros) for _ in range(cfg.decoder_layers))
    ids0 = jnp.full((B, max_len), cfg.pad_token_id, jnp.int32)
    tok0 = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def body(carry, i):
        tok, caches, ids, done = carry
        logits, caches = decoder.apply(
            {"params": params}, tok, caches, enc_kvs, i,
            method=decoder.decode_step)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        ids = ids.at[:, i].set(nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (nxt[:, None], caches, ids, done), None

    (_, _, ids, _), _ = jax.lax.scan(body, (tok0, caches0, ids0, done0),
                                     jnp.arange(max_len))
    return ids


def export_trocr_decoder_state_dict(params) -> dict:
    """Flax TrOCRDecoder params -> HF TrOCRForCausalLM-style state_dict
    (``model.decoder.``-prefixed numpy), the inverse of
    :func:`import_trocr_decoder_state_dict` — so trained OCR checkpoints can
    ship the verifier decoder in a layout the eval CLI already loads."""
    import numpy as np

    from diffute_tpu.compat.hf_import import _deconvert_tensor, _iter_paths

    out: dict = {}
    for path, value in _iter_paths(params):
        leaf = path[-1]
        if leaf in ("embed_tokens", "embed_positions"):
            out[f"model.decoder.{leaf}.weight"] = np.asarray(value)
            continue
        torch_leaf, arr = _deconvert_tensor(leaf, value)
        segs = [s.replace("layers_", "layers.") if s.startswith("layers_")
                else s for s in path[:-1]]
        out["model.decoder." + ".".join(segs) + "." + torch_leaf] = arr
    return out


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
