"""TrOCR decoder: numeric parity vs HF torch TrOCRForCausalLM + greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffute_tpu.models.trocr_decoder import (
    TrOCRDecoder,
    TrOCRDecoderConfig,
    greedy_decode,
    greedy_decode_cached,
    import_trocr_decoder_state_dict,
)


def _small_cfg(**kw):
    return TrOCRDecoderConfig(vocab_size=50, hidden_size=32, decoder_layers=2,
                              decoder_attention_heads=2, decoder_ffn_dim=64,
                              max_position_embeddings=64, **kw)


def test_parity_vs_torch():
    torch = pytest.importorskip("torch")
    from transformers import TrOCRConfig, TrOCRForCausalLM

    hf_cfg = TrOCRConfig(
        vocab_size=50, hidden_size=32, decoder_layers=2,
        decoder_attention_heads=2, decoder_ffn_dim=64,
        max_position_embeddings=64, cross_attention_hidden_size=None,
        scale_embedding=True, layernorm_embedding=True,
        use_learned_position_embeddings=True, activation_function="gelu",
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        is_decoder=True, add_cross_attention=True,
    )
    tm = TrOCRForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_trocr_decoder_state_dict(sd)

    model = TrOCRDecoder(_small_cfg(scale_embedding=True))
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 50, (2, 7)).astype(np.int64)
    enc = rng.randn(2, 9, 32).astype(np.float32)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 encoder_hidden_states=torch.from_numpy(enc)).logits.numpy()
    with jax.default_matmul_precision("highest"):
        out = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                          jnp.asarray(enc))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


def test_greedy_decode_shapes_and_determinism():
    cfg = _small_cfg()
    model = TrOCRDecoder(cfg)
    enc = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 32))
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((2, 4), jnp.int32), enc)["params"]
    ids = greedy_decode(model, params, enc, max_len=8)
    assert ids.shape == (2, 8)
    ids2 = greedy_decode(model, params, enc, max_len=8)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_cached_decode_matches_uncached():
    cfg = _small_cfg()
    model = TrOCRDecoder(cfg)
    enc = jax.random.normal(jax.random.PRNGKey(7), (3, 9, 32))
    params = model.init(jax.random.PRNGKey(8),
                        jnp.zeros((3, 4), jnp.int32), enc)["params"]
    ref = greedy_decode(model, params, enc, max_len=10)
    fast = greedy_decode_cached(model, params, enc, max_len=10)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fast))


def test_greedy_decode_stops_at_eos():
    # A decoder whose embed rows make EOS maximally likely after one step:
    # just check pad-fill after any emitted EOS.
    cfg = _small_cfg()
    model = TrOCRDecoder(cfg)
    enc = jax.random.normal(jax.random.PRNGKey(3), (1, 9, 32))
    params = model.init(jax.random.PRNGKey(4),
                        jnp.zeros((1, 4), jnp.int32), enc)["params"]
    ids = np.asarray(greedy_decode(model, params, enc, max_len=12))[0]
    eos_pos = np.where(ids == cfg.eos_token_id)[0]
    if len(eos_pos):
        assert (ids[eos_pos[0] + 1 :] == cfg.pad_token_id).all()
